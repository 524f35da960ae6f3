from .pillarnet import PillarNet
from .pillar_rcnn import PillarRCNN
from .legacy import TwoStageDetector, VoxelNet

__all__ = ["PillarNet", "PillarRCNN", "TwoStageDetector", "VoxelNet"]
