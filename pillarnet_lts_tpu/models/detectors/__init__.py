from .pillarnet import PillarNet
from .pillar_rcnn import PillarRCNN

__all__ = ["PillarNet", "PillarRCNN"]
