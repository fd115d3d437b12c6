#!/usr/bin/env bash
# Evaluation orchestration (reference: scripts/run_evaluation.sh:1-288).
#
# Subcommands mirror the reference's suites:
#   geneval  — guidance 6, 50 steps, 4 samples/prompt, text_len 128
#   dpgbench — guidance 6, 50 steps, 4 samples, text_len 256, 2x2 grids
#   cot-gen  — CoT-V: n_samples=20 generated, self-rated, top-4 kept
#
# External scorers (mask2former GenEval detector, mPLUG DPG VQA, lmms-eval tasks)
# run on the produced image folders exactly as with the reference outputs.
#
# Usage: scripts/run_evaluation.sh <suite> <config.yaml> <metadata/prompt file> <outdir> [overrides...]
set -euo pipefail
source "$(dirname "$0")/bash_utils.sh"

SUITE="${1:?suite: geneval|dpgbench|cot-gen}"
CONFIG="${2:?config.yaml}"
DATA="${3:?metadata/prompts file}"
OUT="${4:?output dir}"
shift 4 || true

case "$SUITE" in
  geneval)
    run_command python "$(dirname "$0")/inference_geneval.py" config="$CONFIG" \
      inference.metadata_file="$DATA" inference.output_dir="$OUT" \
      inference.n_samples=4 inference.generation_timesteps=50 \
      inference.eval_text_len=128 training.guidance_scale=6 "$@"
    ;;
  dpgbench)
    run_command python "$(dirname "$0")/inference_dpg.py" config="$CONFIG" \
      inference.prompts_file="$DATA" inference.output_dir="$OUT" \
      inference.n_samples=4 inference.generation_timesteps=50 \
      inference.eval_text_len=256 training.guidance_scale=6 "$@"
    ;;
  cot-gen)
    run_command python "$(dirname "$0")/inference_cot.py" config="$CONFIG" \
      inference.metadata_file="$DATA" inference.output_dir="$OUT" \
      inference.n_samples=20 inference.topk=4 \
      inference.generation_timesteps=50 inference.eval_text_len=128 \
      training.guidance_scale=6 "$@"
    ;;
  *)
    echo "unknown suite: $SUITE" >&2
    exit 2
    ;;
esac
