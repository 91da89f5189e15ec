"""Minimal ``mmcv.Config`` shim: Config.fromfile executes a Python config file
and exposes its module-level dicts as attributes (the only mmcv surface the
reference uses — tiny_train.py:413-422, test.py:460-473)."""

import types


class Config:
    def __init__(self, ns: dict):
        self._ns = dict(ns)

    @classmethod
    def fromfile(cls, path: str) -> "Config":
        module = types.ModuleType("_cfg")
        with open(path, encoding="utf-8") as f:
            code = f.read()
        exec(compile(code, path, "exec"), module.__dict__)
        ns = {k: v for k, v in vars(module).items() if not k.startswith("__")}
        return cls(ns)

    def __getattr__(self, name):
        try:
            return self._ns[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def get(self, name, default=None):
        return self._ns.get(name, default)
