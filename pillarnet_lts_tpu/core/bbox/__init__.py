from . import box_np_ops

__all__ = ["box_np_ops"]
