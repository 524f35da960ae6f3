from .compose import Compose
from .preprocess import Preprocess, AssignLabel
from .formating import Reformat
from .test_aug import DoubleFlip
from .noop import Empty
from .loading import LoadPointCloudFromFile, LoadPointCloudAnnotations

__all__ = [
    "Compose",
    "Preprocess",
    "AssignLabel",
    "Reformat",
    "DoubleFlip",
    "Empty",
    "LoadPointCloudFromFile",
    "LoadPointCloudAnnotations",
]
