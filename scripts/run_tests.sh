#!/usr/bin/env bash
# CI entry: full test suite on the 8-virtual-device CPU backend.
# (conftest.py forces JAX_PLATFORMS=cpu and the device-count flag itself.)
set -euo pipefail
cd "$(dirname "$0")/.."
make -C csrc >/dev/null 2>&1 || echo "note: native loader not built (tests skip it)"
exec python -m pytest tests/ -q "$@"
