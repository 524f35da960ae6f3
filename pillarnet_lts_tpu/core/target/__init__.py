from .center_target import gaussian_radius, gaussian_2d, draw_gaussian

__all__ = ["gaussian_radius", "gaussian_2d", "draw_gaussian"]
