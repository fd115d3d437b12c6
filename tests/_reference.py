"""Helper to import modules from the read-only PyTorch reference for golden tests.

The reference at /root/reference is used ONLY as a test oracle (never imported by
the framework itself). Tests using it skip cleanly when it is absent.
"""
import importlib.util
import os
import sys

import pytest

REFERENCE_ROOT = os.environ.get("UNIGEN_REFERENCE_ROOT", "/root/reference")


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def install_diffusers_stub():
    """Minimal in-memory `diffusers` so the reference's models package imports.

    The reference's ModelMixin (models/modeling_utils.py:22-45) imports diffusers
    for hub/save plumbing the parity tests never exercise; the only pieces with
    runtime behavior at __init__ time are ConfigMixin/register_to_config, which
    are reimplemented faithfully (register-before-init, FrozenDict-style config
    with attribute + .get access)."""
    import functools
    import inspect
    import logging as _logging
    import types

    if "diffusers" in sys.modules:
        return

    class _Config(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

    class ConfigMixin:
        config_name = "config.json"

        def register_to_config(self, **kwargs):
            if not hasattr(self, "_internal_dict"):
                self._internal_dict = _Config()
            self._internal_dict.update(kwargs)

        @property
        def config(self):
            if not hasattr(self, "_internal_dict"):
                self._internal_dict = _Config()
            return self._internal_dict

    def register_to_config(init):
        @functools.wraps(init)
        def inner(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            extra = cfg.pop("kwargs", {})
            cfg.update(extra)
            ConfigMixin.register_to_config(self, **cfg)
            init(self, *args, **kwargs)
        return inner

    def _noop(*a, **k):
        return None

    def _identity_decorator(fn):
        return fn

    root = types.ModuleType("diffusers")
    root.__version__ = "0.0.stub"

    utils = types.ModuleType("diffusers.utils")
    utils.FLAX_WEIGHTS_NAME = "flax_model.msgpack"
    utils.SAFE_WEIGHTS_INDEX_NAME = "model.safetensors.index.json"
    utils.WEIGHTS_INDEX_NAME = "pytorch_model.bin.index.json"
    utils._add_variant = lambda name, variant=None: name
    utils._get_checkpoint_shard_files = _noop
    utils._get_model_file = _noop
    utils.deprecate = _noop
    utils.is_accelerate_available = lambda: False
    utils.is_torch_version = lambda *a, **k: True

    class _Logging:
        @staticmethod
        def get_logger(name):
            return _logging.getLogger(name)

    utils.logging = _Logging()

    hub_utils = types.ModuleType("diffusers.utils.hub_utils")

    class PushToHubMixin:
        pass

    hub_utils.PushToHubMixin = PushToHubMixin
    hub_utils.load_or_create_model_card = _noop
    hub_utils.populate_model_card = _noop

    mlu = types.ModuleType("diffusers.models.model_loading_utils")
    for fn in ("_determine_device_map", "_fetch_index_file",
               "_load_state_dict_into_model", "load_model_dict_into_meta",
               "load_state_dict"):
        setattr(mlu, fn, _noop)
    models_mod = types.ModuleType("diffusers.models")
    models_mod.model_loading_utils = mlu

    cfg_mod = types.ModuleType("diffusers.configuration_utils")
    cfg_mod.ConfigMixin = ConfigMixin
    cfg_mod.register_to_config = register_to_config

    root.utils = utils
    root.models = models_mod
    root.configuration_utils = cfg_mod
    sys.modules["diffusers"] = root
    sys.modules["diffusers.utils"] = utils
    sys.modules["diffusers.utils.hub_utils"] = hub_utils
    sys.modules["diffusers.models"] = models_mod
    sys.modules["diffusers.models.model_loading_utils"] = mlu
    sys.modules["diffusers.configuration_utils"] = cfg_mod


def install_torchvision_stub():
    """transformers' siglip2 *fast* image processor (imported unconditionally by
    the reference's siglip2_encoder.py:37) needs torchvision, which isn't in this
    environment. The parity tests never run image preprocessing, so a MagicMock
    module tree satisfies the import."""
    if "torchvision" in sys.modules:
        return
    import importlib.machinery
    from unittest.mock import MagicMock
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.transforms.v2",
                 "torchvision.transforms.v2.functional"):
        mock = MagicMock(name=name)
        mock.__spec__ = importlib.machinery.ModuleSpec(name, None)
        mock.__version__ = "0.0.stub"
        sys.modules[name] = mock


def install_omegaconf_stub():
    """models/misc.py:17 imports omegaconf (absent here); only the names are
    needed at import time — parse_structured is never called by the parity tests."""
    if "omegaconf" in sys.modules:
        return
    import types

    class OmegaConf:
        @staticmethod
        def structured(x):
            return x

        @staticmethod
        def create(x=None):
            return dict(x or {})

        @staticmethod
        def to_container(x, **kw):
            return dict(x)

    mod = types.ModuleType("omegaconf")
    mod.OmegaConf = OmegaConf
    mod.DictConfig = dict
    sys.modules["omegaconf"] = mod


def install_reference_stubs():
    """All import-time stubs the reference package needs in this environment."""
    install_diffusers_stub()
    install_torchvision_stub()
    install_omegaconf_stub()


def load_reference_module(relpath: str, name: str):
    """Load e.g. models/sampling.py from the reference as a standalone module."""
    if not has_reference():
        pytest.skip("PyTorch reference not available")
    path = os.path.join(REFERENCE_ROOT, relpath)
    if not os.path.exists(path):
        pytest.skip(f"reference file missing: {relpath}")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
