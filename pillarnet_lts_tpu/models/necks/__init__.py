from .rpn import RPN, RPNV1, RPNV2, RPNG, RPNGV2

__all__ = ["RPN", "RPNV1", "RPNV2", "RPNG", "RPNGV2"]
