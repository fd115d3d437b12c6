#!/usr/bin/env python
"""Convert DPG-bench prompt files into the jsonl the DPG runner consumes
(reference: third_party/prepare_dpg_metadata.py:1-23 reads the DPG csv/txt
prompt directory and emits {'item_id', 'text'} rows).

Usage: python scripts/prepare_dpg_metadata.py <prompts_dir_or_csv> <out.jsonl> \
           [questions_out.jsonl]

The optional third argument extracts the per-prompt VQA question lists from the
DPG csv (the CoT-V DPG path's question file, reference run_evaluation.sh:260 /
inference_unigen_cot.py:297-304).
"""
import csv
import json
import os
import sys
from collections import defaultdict


def main(src: str, out: str, questions_out: str = None):
    rows = []
    questions = defaultdict(list)
    texts = {}
    if os.path.isdir(src):
        # ELLA/dpg_bench layout: one .txt per prompt, stem = item_id
        for fn in sorted(os.listdir(src)):
            if fn.endswith(".txt"):
                with open(os.path.join(src, fn)) as f:
                    rows.append({"item_id": fn[:-4], "text": f.read().strip()})
    else:
        seen = set()
        with open(src, newline="") as f:
            for rec in csv.DictReader(f):
                item = rec.get("item_id") or rec.get("id")
                text = rec.get("text") or rec.get("prompt")
                if not item or not text:
                    continue
                if item not in seen:
                    seen.add(item)
                    rows.append({"item_id": item, "text": text.strip()})
                    texts[item] = text.strip()
                q = (rec.get("question_for_vqa") or rec.get("question")
                     or rec.get("tuple"))
                if q:
                    questions[item].append(q.strip())
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} prompts to {out}")
    if questions_out and questions:
        with open(questions_out, "w") as f:
            for item, qs in questions.items():
                f.write(json.dumps({"item_id": item, "prompt": texts.get(item),
                                    "text": texts.get(item),
                                    "questions": qs}) + "\n")
        print(f"wrote questions for {len(questions)} prompts to {questions_out}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
