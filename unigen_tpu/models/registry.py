"""Keyword-based model registry (reference: models/model_registry.py:10-65).

Maps substrings of checkpoint/model names to (module, config-factory) pairs so
entry points can instantiate models from config strings.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple


class ModelRegistry:
    def __init__(self):
        self._entries: Dict[str, Callable[[], Tuple[Any, Any]]] = {}

    def register(self, keyword: str, factory: Callable[[], Tuple[Any, Any]]):
        self._entries[keyword] = factory

    def get(self, name: str):
        """Substring match, longest keyword first (reference :20-31)."""
        name = name.lower()
        for kw in sorted(self._entries, key=len, reverse=True):
            if kw in name:
                return self._entries[kw]()
        raise KeyError(f"No registered model matches '{name}'")

    def __contains__(self, name: str) -> bool:
        try:
            self.get(name)
            return True
        except KeyError:
            return False


MODEL_REGISTRY = ModelRegistry()


def _magvit():
    from . import magvit
    return magvit, magvit.MagvitConfig()


def _siglip():
    from . import siglip
    return siglip, siglip.SiglipConfig.so400m()


def _unigen():
    from . import unigen
    return unigen, unigen.UniGenConfig.for_qwen25_15b()


MODEL_REGISTRY.register("magvitv2", _magvit)
MODEL_REGISTRY.register("vq_16", _magvit)
MODEL_REGISTRY.register("siglip", _siglip)
MODEL_REGISTRY.register("unigen", _unigen)


def model_from_name(name: str):
    return MODEL_REGISTRY.get(name)
