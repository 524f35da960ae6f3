from .bev_feature import BEVStrideFeature, roi_grid_points

__all__ = ["BEVStrideFeature", "roi_grid_points"]
