#!/usr/bin/env bash
# Pretraining launcher (reference: scripts/run_pretraining.sh).
# Single- or multi-host TPU: set JAX_COORDINATOR / JAX_NUM_PROCESSES /
# JAX_PROCESS_INDEX for multi-host slices; jax.distributed picks them up.
#
# Usage: scripts/run_pretraining.sh configs/unigen_1_5b/unigen_pt1.yaml [overrides...]
set -euo pipefail
source "$(dirname "$0")/bash_utils.sh"

CONFIG="${1:?usage: run_pretraining.sh <config.yaml> [key=value ...]}"
shift || true
RUN_NAME="$(config_to_run_name "$CONFIG")"
print_main "launching $RUN_NAME"

run_command python "$(dirname "$0")/train.py" config="$CONFIG" "$@"
