"""Python-file config system.

Behavioral equivalent of the reference `det3d/torchie/utils/config.py:50-170`:
a config is a plain python file executed as a module; every non-dunder
module-level name becomes a config entry; values support attribute access
(addict-style). ``Config.fromfile`` keeps the original text so checkpoints can
embed it (reference `tools/train.py:155-159`).
"""

import os
import sys
import tempfile
import importlib.util


class ConfigDict(dict):
    """dict with recursive attribute access.

    Unlike addict, missing attribute access raises AttributeError (configs in
    the zoo always define what models read; optional keys go through ``.get``).
    """

    def __init__(self, *args, **kwargs):
        super().__init__()
        for arg in args:
            if arg is None:
                continue
            for k, v in dict(arg).items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    @classmethod
    def _wrap(cls, value):
        if isinstance(value, ConfigDict):
            return value
        if isinstance(value, dict):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._wrap(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, self._wrap(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(f"'ConfigDict' object has no attribute '{key}'")

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError:
            raise AttributeError(key)

    def copy(self):
        return ConfigDict(self)

    def to_dict(self):
        def _unwrap(v):
            if isinstance(v, ConfigDict):
                return {k: _unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(_unwrap(x) for x in v)
            return v

        return _unwrap(self)


class Config:
    """Config backed by a python file (same schema as the reference zoo)."""

    @staticmethod
    def fromfile(filename):
        filename = os.path.abspath(os.path.expanduser(filename))
        if not os.path.isfile(filename):
            raise FileNotFoundError(filename)
        if not filename.endswith(".py"):
            raise IOError("Only python-file configs are supported")

        with tempfile.TemporaryDirectory() as tmp_dir:
            # execute as a throwaway module so configs may use imports freely
            tmp_path = os.path.join(tmp_dir, "_graft_tmp_config.py")
            with open(filename) as f:
                text = f.read()
            with open(tmp_path, "w") as f:
                f.write(text)
            spec = importlib.util.spec_from_file_location("_graft_tmp_config", tmp_path)
            mod = importlib.util.module_from_spec(spec)
            # Let configs refer to their own path (reference configs compute
            # work_dir from __file__).
            mod.__file__ = filename
            spec.loader.exec_module(mod)
            cfg_dict = {
                name: value
                for name, value in mod.__dict__.items()
                if not name.startswith("__") and not callable(value)
                and not isinstance(value, type(sys))
            }
        return Config(cfg_dict, cfg_text=text, filename=filename)

    @staticmethod
    def fromstring(text, name="<string>"):
        ns = {}
        exec(compile(text, name, "exec"), ns)
        cfg_dict = {
            k: v
            for k, v in ns.items()
            if not k.startswith("__") and not callable(v) and not isinstance(v, type(sys))
        }
        return Config(cfg_dict, cfg_text=text, filename=name)

    def __init__(self, cfg_dict=None, cfg_text=None, filename=None):
        if cfg_dict is None:
            cfg_dict = {}
        if not isinstance(cfg_dict, dict):
            raise TypeError(f"cfg_dict must be a dict, got {type(cfg_dict)}")
        super().__setattr__("_cfg_dict", ConfigDict(cfg_dict))
        super().__setattr__("_filename", filename)
        super().__setattr__("_text", cfg_text)

    @property
    def filename(self):
        return self._filename

    @property
    def text(self):
        return self._text

    def __getattr__(self, name):
        return getattr(self._cfg_dict, name)

    def __getitem__(self, name):
        return self._cfg_dict[name]

    def __setattr__(self, name, value):
        self._cfg_dict[name] = value

    def __setitem__(self, name, value):
        self._cfg_dict[name] = value

    def __contains__(self, name):
        return name in self._cfg_dict

    def __iter__(self):
        return iter(self._cfg_dict)

    def get(self, name, default=None):
        return self._cfg_dict.get(name, default)

    def keys(self):
        return self._cfg_dict.keys()

    def items(self):
        return self._cfg_dict.items()

    def __repr__(self):
        return f"Config (path: {self._filename}): {self._cfg_dict}"
