#!/usr/bin/env python
"""Convert DPG-bench prompt files into the jsonl the DPG runner consumes
(reference: third_party/prepare_dpg_metadata.py:1-23 reads the DPG csv/txt
prompt directory and emits {'item_id', 'text'} rows).

Usage: python scripts/prepare_dpg_metadata.py <prompts_dir_or_csv> <out.jsonl>
"""
import csv
import json
import os
import sys


def main(src: str, out: str):
    rows = []
    if os.path.isdir(src):
        # ELLA/dpg_bench layout: one .txt per prompt, stem = item_id
        for fn in sorted(os.listdir(src)):
            if fn.endswith(".txt"):
                with open(os.path.join(src, fn)) as f:
                    rows.append({"item_id": fn[:-4], "text": f.read().strip()})
    else:
        with open(src, newline="") as f:
            for rec in csv.DictReader(f):
                item = rec.get("item_id") or rec.get("id")
                text = rec.get("text") or rec.get("prompt")
                if item and text:
                    rows.append({"item_id": item, "text": text.strip()})
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} prompts to {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
