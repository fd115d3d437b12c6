"""KV-cache storage-layout A/B on the chip (VERDICT r4 #1).

Runs the VQA decode bench across layouts x batches IN ONE PROCESS so the
relay's per-process cold-start (~400-700s, BENCH.md) is paid once. Each
(layout, batch) pair prints bench_vqa's own JSON line; a trailing summary
line aggregates them for BENCH.md.

Usage: python scripts/bench_kvlayout.py [quick]
  quick -> batches (32,) only.
"""
import json
import sys

sys.path.insert(0, ".")
import bench  # noqa: E402

batches = (32,) if "quick" in sys.argv else (32, 64, 256)
layouts = ("bskd", "bhsd")

results = {}
for b in batches:
    for lay in layouts:
        print(f"[kvlayout] === batch={b} layout={lay} ===", file=sys.stderr, flush=True)
        import io
        import contextlib
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                bench.bench_vqa(batch_size=b, quant="int8+kv", kv_layout=lay)
        except Exception as e:  # keep the grid going; record the failure
            print(f"[kvlayout] batch={b} layout={lay} FAILED: {e}",
                  file=sys.stderr, flush=True)
            results[f"{lay}_b{b}"] = None
            continue
        line = buf.getvalue().strip().splitlines()[-1]
        print(line, flush=True)
        results[f"{lay}_b{b}"] = json.loads(line)["value"]

print(json.dumps({"summary": "kv_layout A/B (int8+kv tok/s)", **results}), flush=True)
