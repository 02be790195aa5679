"""Name → model-constructor registry.

One registry replaces the reference's three dispatch systems (backbone
string switches in ``unet.py``, class-name registries in SECOND, YAML type
fields in PointRCNN).
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate model name: {name}")
        _REGISTRY[name] = fn
        return fn

    return deco


def build_model(name: str, **kwargs):
    # Import model modules lazily so the registry is populated on first use.
    import lyft3d_tpu.models.unet  # noqa: F401
    import lyft3d_tpu.models.deeplab  # noqa: F401

    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def list_models():
    import lyft3d_tpu.models.unet  # noqa: F401
    import lyft3d_tpu.models.deeplab  # noqa: F401

    return sorted(_REGISTRY)
