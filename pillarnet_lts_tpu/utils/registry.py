"""String-keyed class registries.

Mirrors the public surface of the reference registry
(`det3d/utils/registry.py:6-77`): components are registered by class name and
instantiated from config dicts whose ``type`` key selects the class. This keeps
the reference's python config files usable unchanged.
"""

import inspect


class Registry:
    def __init__(self, name):
        self._name = name
        self._module_dict = {}

    @property
    def name(self):
        return self._name

    @property
    def module_dict(self):
        return self._module_dict

    def __repr__(self):
        return f"{self.__class__.__name__}(name={self._name}, items={list(self._module_dict)})"

    def get(self, key):
        return self._module_dict.get(key, None)

    def register_module(self, cls=None, *, name=None):
        if cls is None:
            return lambda c: self.register_module(c, name=name)
        if not inspect.isclass(cls) and not inspect.isfunction(cls):
            raise TypeError(f"module must be a class or function, got {type(cls)}")
        module_name = name or cls.__name__
        if module_name in self._module_dict:
            raise KeyError(f"{module_name} already registered in {self._name}")
        self._module_dict[module_name] = cls
        return cls


def build_from_cfg(cfg, registry, default_args=None):
    """Instantiate ``registry[cfg.type](**cfg_without_type, **default_args)``.

    Same contract as the reference `det3d/utils/registry.py:49` ``build_from_cfg``.
    """
    if not isinstance(cfg, dict):
        raise TypeError(f"cfg must be a dict, got {type(cfg)}")
    if "type" not in cfg:
        raise KeyError(f"cfg must contain the key 'type', got {cfg}")

    args = dict(cfg)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not in the {registry.name} registry")
    elif inspect.isclass(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or class, got {type(obj_type)}")

    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    return obj_cls(**args)
