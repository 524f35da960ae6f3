from .registry import Registry, build_from_cfg
from .config import Config, ConfigDict

__all__ = ["Registry", "build_from_cfg", "Config", "ConfigDict"]
