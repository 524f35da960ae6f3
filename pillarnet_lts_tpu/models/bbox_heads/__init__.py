from .center_head import CenterHead, SepHead

__all__ = ["CenterHead", "SepHead"]
