from .voxelize_kernel import pillar_scatter_max_pallas

__all__ = ["pillar_scatter_max_pallas"]
