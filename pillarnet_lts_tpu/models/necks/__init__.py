from .rpn import RPNV1, RPNV2, RPNG, RPNGV2

__all__ = ["RPNV1", "RPNV2", "RPNG", "RPNGV2"]
