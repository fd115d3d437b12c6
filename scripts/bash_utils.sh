#!/usr/bin/env bash
# Shared launch helpers (reference: scripts/bash_utils.sh:1-94).

# rank-0-only print (multi-host launches)
print_main() {
  if [[ "${JAX_PROCESS_INDEX:-0}" == "0" ]]; then
    echo "$@"
  fi
}

# run a command, exiting on failure with a visible banner
run_command() {
  print_main "+ $*"
  "$@"
  local status=$?
  if [[ $status -ne 0 ]]; then
    echo "COMMAND FAILED ($status): $*" >&2
    exit $status
  fi
}

# run a command but keep going on failure (logged)
run_command_with_errors() {
  print_main "+ $*"
  "$@" || echo "COMMAND FAILED (ignored): $*" >&2
}

# configs/unigen_1_5b/unigen_pt1.yaml -> unigen_pt1
config_to_run_name() {
  local path="$1"
  basename "${path%.yaml}"
}
