"""Model zoo. Submodules import lazily (keeps `import unigen_tpu` light).

Mirrors the reference's `from models import UniGen, get_mask_chedule` ergonomics
(reference: training/train_dpo.py:40) with functional equivalents.
"""
import importlib

_SUBMODULES = ("qwen2", "magvit", "siglip", "siglip2", "unigen", "builder", "registry")


def __getattr__(name):
    if name in _SUBMODULES:
        return importlib.import_module(f".{name}", __name__)
    if name == "UniGenConfig":
        return importlib.import_module(".unigen", __name__).UniGenConfig
    if name == "Qwen2Config":
        return importlib.import_module(".qwen2", __name__).Qwen2Config
    if name == "MagvitConfig":
        return importlib.import_module(".magvit", __name__).MagvitConfig
    if name == "SiglipConfig":
        return importlib.import_module(".siglip", __name__).SiglipConfig
    if name == "MODEL_REGISTRY":
        return importlib.import_module(".registry", __name__).MODEL_REGISTRY
    raise AttributeError(name)
