from .norm import MaskedBatchNorm, get_norm_kwargs

__all__ = ["MaskedBatchNorm", "get_norm_kwargs"]
