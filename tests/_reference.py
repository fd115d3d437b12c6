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
