from .norm import MaskedBatchNorm, MaskedGroupNorm, build_norm, get_norm_kwargs

__all__ = ["MaskedBatchNorm", "MaskedGroupNorm", "build_norm", "get_norm_kwargs"]
