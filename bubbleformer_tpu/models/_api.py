"""Model registry.

Mirrors the reference's decorator-based string registry
(``bubbleformer/models/_api.py:5-40``): ``register_model`` stores a
constructor under a lowercase name, ``get_model`` instantiates by name.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List

MODELS: Dict[str, Callable[..., Any]] = {}


def register_model(name: str) -> Callable:
    """Class decorator registering a model constructor under ``name``."""

    def wrapper(cls):
        key = name.lower()
        if key in MODELS:
            raise ValueError(f"Model {key} already registered")
        MODELS[key] = cls
        return cls

    return wrapper


def list_models() -> List[str]:
    return sorted(MODELS.keys())


def get_model(name: str, **config):
    """Instantiate a registered model by (case-insensitive) name."""
    key = name.lower()
    if key not in MODELS:
        raise KeyError(f"Unknown model {name!r}; available: {list_models()}")
    return MODELS[key](**config)
