#!/usr/bin/env bash
# Fetch + wire the external evaluation judges (reference: scripts/setup_eval.sh:7-51).
#
# Judges:
#   geneval     — object-detection scorer (mask2former via mmdetection)
#   dpg_bench   — DPG prompt-decomposition scorer (mPLUG VQA), from ELLA
#   lmms-eval   — the 10-task understanding suite (pope, mmmu_val, gqa, ...)
#
# Every stage degrades to a clear SKIP when the network / pip / CUDA judge
# dependencies are unavailable (TPU pods often have no egress); re-run after
# placing the trees under third_party/ manually to finish the wiring.
set -u
cd "$(dirname "$0")/.."
mkdir -p third_party

skip() { echo "[setup_eval] SKIP: $*" >&2; }
have_net() { git ls-remote https://github.com/djghosh13/geneval.git >/dev/null 2>&1; }

NET=0
have_net && NET=1
[[ $NET == 0 ]] && skip "no network egress detected; will only wire trees already under third_party/"

# --- geneval (reference setup_eval.sh:28-29) -------------------------------
if [[ ! -d third_party/geneval ]]; then
  if [[ $NET == 1 ]]; then
    git clone https://github.com/djghosh13/geneval.git third_party/geneval \
      || skip "geneval clone failed"
  else
    skip "geneval not present (third_party/geneval)"
  fi
fi

# --- dpg_bench from ELLA (reference setup_eval.sh:14-18) -------------------
if [[ ! -d third_party/dpg_bench ]]; then
  if [[ $NET == 1 ]]; then
    git clone https://github.com/TencentQQGYLab/ELLA.git third_party/ELLA \
      && mv third_party/ELLA/dpg_bench third_party/dpg_bench \
      && rm -rf third_party/ELLA \
      || skip "ELLA/dpg_bench clone failed"
  else
    skip "dpg_bench not present (third_party/dpg_bench)"
  fi
fi
# dpg metadata prep (reference setup_eval.sh:20-21)
if [[ -d third_party/dpg_bench && ! -f third_party/dpg_bench/dpg_metadata.jsonl ]]; then
  python scripts/prepare_dpg_metadata.py \
    third_party/dpg_bench/prompts \
    third_party/dpg_bench/dpg_metadata.jsonl \
    || skip "dpg metadata preparation failed"
  python scripts/prepare_dpg_metadata.py \
    third_party/dpg_bench/dpg_bench.csv \
    third_party/dpg_bench/dpg_metadata_from_csv.jsonl \
    third_party/dpg_bench/dpg_bench_questions.jsonl \
    || skip "dpg question extraction failed"
fi

# --- lmms-eval v0.3.0 (reference setup_eval.sh:24-30) ----------------------
if [[ ! -d third_party/lmms-eval ]]; then
  if [[ $NET == 1 ]]; then
    wget -q -P third_party/ https://github.com/EvolvingLMMs-Lab/lmms-eval/archive/refs/tags/v0.3.0.tar.gz \
      && tar -xf third_party/v0.3.0.tar.gz -C third_party/ \
      && rm third_party/v0.3.0.tar.gz \
      && mv third_party/lmms-eval-0.3.0 third_party/lmms-eval \
      || skip "lmms-eval download failed"
  else
    skip "lmms-eval not present (third_party/lmms-eval)"
  fi
fi
# register our TPU model plugin (the reference swaps the whole models dir,
# setup_eval.sh:29-30; we add one file + a registry line)
if [[ -d third_party/lmms-eval ]]; then
  cp scripts/lmms_unigen_tpu.py third_party/lmms-eval/lmms_eval/models/unigen_tpu.py
  python - <<'EOF' || skip "lmms-eval registry patch failed"
import re
p = "third_party/lmms-eval/lmms_eval/models/__init__.py"
s = open(p).read()
if "unigen_tpu" not in s:
    s = re.sub(r"(AVAILABLE_MODELS\s*=\s*\{)",
               r'\1\n    "unigen_tpu": "UniGenTpu",', s, count=1)
    open(p, "w").write(s)
print("lmms-eval: unigen_tpu model registered")
EOF
  pip install -e third_party/lmms-eval 2>/dev/null \
    || skip "pip install lmms-eval failed (offline?) — run manually when possible"
fi

# --- GenEval detector deps (mmcv/mmdetection are CUDA builds; reference
#     setup_eval.sh:33-46). On TPU hosts the detector judge runs elsewhere. ---
if python -c "import mmdet" 2>/dev/null; then
  echo "[setup_eval] mmdetection available — GenEval detector scoring enabled"
else
  skip "mmdetection not installed: GenEval scoring (evaluate_images.py) needs a GPU host or CPU torch mmdet; generation still runs here"
fi

echo "[setup_eval] done. Present judges:"
for d in geneval dpg_bench lmms-eval; do
  [[ -d third_party/$d ]] && echo "  - third_party/$d"
done
exit 0
