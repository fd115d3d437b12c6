"""Headline benchmark: 256px images/sec/chip at the GenEval protocol.

Runs the flagship UniGen (Qwen2.5-1.5B backbone, bf16) MaskGIT sampler at the
reference evaluation protocol — guidance 6, 50 timesteps, 128-token text budget,
256px via the MAGViTv2 decoder (reference scripts/run_evaluation.sh:122-131) — on
the real TPU chip and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N/16}

vs_baseline is against the BASELINE.json north star of 16 img/s/chip.
Random weights (identical FLOPs/memory traffic to trained ones).
"""
from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np


class _Watchdog:
    """Hard wall-clock limit: the ambient TPU relay can wedge on device->host
    transfers; on timeout we emit a JSON line flagged as not-synced rather than
    hanging the driver."""

    def __init__(self, seconds: int):
        self.seconds = seconds

    def __enter__(self):
        signal.signal(signal.SIGALRM, self._raise)
        signal.alarm(self.seconds)
        return self

    def _raise(self, *a):
        raise TimeoutError("bench watchdog fired")

    def __exit__(self, *a):
        signal.alarm(0)


def _enable_compile_cache():
    """Persistent compilation cache: repeat bench runs skip the 20-60s compiles."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/unigen_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def main(batch_size: int = 6, timesteps: int = 50, warmup: int = 1, iters: int = 3,
         quant: Optional[str] = "int8"):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from unigen_tpu.generation import t2i_generate
    from unigen_tpu.models import magvit, unigen
    from unigen_tpu.ops import masks as M

    cfg = unigen.UniGenConfig.for_qwen25_15b()
    vq_cfg = magvit.MagvitConfig()

    t0 = time.perf_counter()
    # jit the initializers: one compiled program instead of thousands of host
    # dispatches (matters on a 1-core host driving the chip)
    params = jax.jit(lambda k: unigen.init(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)
    if quant == "int8":
        # W8A8 backbone + int8 image head is the shipped default: +40% over
        # bf16 at identical sampler semantics, gated by the per-step token
        # agreement / confidence-ordering tests (tests/test_quantization.py).
        from unigen_tpu.ops.quantization import quantize_unigen_params
        params = jax.jit(lambda p: quantize_unigen_params(p, cfg))(params)
        jax.block_until_ready(params)
        print("[bench] backbone+head quantized to int8 (W8A8)", file=sys.stderr)
    print(f"[bench] llm params init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    vq_params = jax.jit(lambda k: magvit.init(k, vq_cfg))(jax.random.key(1))
    jax.block_until_ready(vq_params)
    print(f"[bench] vq params init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    vq_params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), vq_params)
    vq_cfg = magvit.MagvitConfig(dtype=jnp.bfloat16)

    # GenEval-protocol prompt: 128-token text budget + template + soi/img/eoi
    n = cfg.num_vq_tokens
    text_len = 128 + 7
    pad, soi, eoi = 151643, 151665, 151666
    rng = np.random.default_rng(0)

    def prompt_batch(b):
        ids = np.concatenate([
            np.full((b, 20), pad),                      # realistic left padding
            rng.integers(10, 1000, size=(b, text_len - 20)),
            np.full((b, 1), soi),
            np.full((b, n), cfg.mask_token_id),
            np.full((b, 1), eoi),
        ], axis=1)
        return jnp.asarray(ids)

    ids = prompt_batch(batch_size)
    uncond = prompt_batch(batch_size)

    def sample_codes(params, ids, uncond, key):
        both = jnp.concatenate([ids, uncond], axis=0)
        attn = M.create_attention_mask_predict_next(both, pad, soi, eoi,
                                                    rm_pad_in_image=True)
        codes = t2i_generate(params, cfg, key, ids, attn, uncond_input_ids=uncond,
                             guidance_scale=6.0, timesteps=timesteps, temperature=1.0,
                             pad_id=pad)
        return jnp.clip(codes, 0, cfg.codebook_size - 1)

    def decode(vq_params, codes):
        return magvit.decode_code(vq_params, vq_cfg, codes)

    sampler = jax.jit(sample_codes)
    if os.environ.get("BENCH_COST"):
        # XLA's own accounting for the compiled sampler (cache-hit when warm):
        # per-image flops/bytes across batch sizes localize scaling anomalies
        try:
            with _Watchdog(1800):
                compiled = sampler.lower(params, ids, uncond,
                                         jax.random.key(2)).compile()
                ca = compiled.cost_analysis()
            print(f"[bench] cost: flops {ca.get('flops', 0) / 1e12:.2f}T "
                  f"bytes {ca.get('bytes accessed', 0) / 1e9:.2f}GB "
                  f"transc {ca.get('transcendentals', 0) / 1e9:.2f}G "
                  f"(batch {batch_size})", file=sys.stderr)
            try:
                ma = compiled.memory_analysis()
                print(f"[bench] memory: argsz {ma.argument_size_in_bytes / 1e9:.2f}GB "
                      f"out {ma.output_size_in_bytes / 1e9:.2f}GB "
                      f"temp {ma.temp_size_in_bytes / 1e9:.3f}GB "
                      f"alias {ma.alias_size_in_bytes / 1e9:.2f}GB "
                      f"(batch {batch_size})", file=sys.stderr)
            except Exception as e:  # relay backends may not expose it
                print(f"[bench] memory analysis unavailable: {e}", file=sys.stderr)
            if os.environ.get("BENCH_COST_ONLY"):
                # static-analysis mode: client-side compile only, never touches
                # the chip (the relay charges ~400s server-side load per fresh
                # process; scaling studies don't need execution)
                return
        except TimeoutError:
            if os.environ.get("BENCH_COST_ONLY"):
                # honor the mode's never-touch-the-chip contract even when the
                # client-side lower/compile itself times out
                print("[bench] cost analysis timed out (cost-only mode: "
                      "exiting without chip phases)", file=sys.stderr)
                return
            # keep the one-JSON-line contract: the timed phases below will
            # report not-synced if the relay is truly wedged
            print("[bench] cost analysis timed out; continuing", file=sys.stderr)
    decoder = jax.jit(decode)

    def sync_codes(x):
        """Force completion via a host fetch: block_until_ready is a no-op over
        the axon relay backend, so a data dependency is the only reliable fence."""
        return np.asarray(x[:, ::16])

    def sync_px(x):
        return np.asarray(x[:, ::64, ::64, 0])

    def phase(name, budget, fn):
        t0 = time.perf_counter()
        with _Watchdog(budget):
            out = fn()
        dt = time.perf_counter() - t0
        print(f"[bench] {name}: {dt:.1f}s", file=sys.stderr)
        return out, dt

    synced = True
    times = []
    try:
        # compile budgets: cold-cache compiles of the 50-step scan over the
        # relay can take >10 min; the persistent cache makes repeat runs fast
        codes, _ = phase("sampler compile+warmup", 1800,
                         lambda: sync_codes(sampler(params, ids, uncond,
                                                    jax.random.key(2))))
        _, _ = phase("decoder compile+warmup", 900,
                     lambda: sync_px(decoder(vq_params,
                                             jnp.asarray(codes, jnp.int32))))
        for i in range(iters):
            with _Watchdog(300):
                t0 = time.perf_counter()
                c = sampler(params, ids, uncond, jax.random.key(3 + i))
                px = decoder(vq_params, c)
                sync_px(px)
                times.append(time.perf_counter() - t0)
            print(f"[bench] iter {i}: {times[-1]:.2f}s", file=sys.stderr)
    except TimeoutError:
        synced = False
        print("[bench] phase wedged or over budget; reporting what completed",
              file=sys.stderr)

    n_chips = jax.device_count()
    if times:
        best = min(times)
        img_per_sec_per_chip = batch_size / best / n_chips
    else:
        img_per_sec_per_chip = 0.0
    metric = "256px images/sec/chip (GenEval protocol: guidance 6, 50 steps)"
    if quant:
        metric += f" [{quant}]"
    print(json.dumps({
        "metric": metric,
        "value": round(img_per_sec_per_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec_per_chip / 16.0, 4),
        # The 16 img/s north star is specified for a v5e-8 POD (BASELINE.md:36);
        # the reference runs this protocol as 8 independent GPU processes
        # (run_evaluation.sh:78), so the per-chip share of the target is 16/8=2.
        # vs_baseline above conservatively divides the PER-CHIP rate by the
        # whole-pod target; this field is the apples-to-apples per-chip ratio.
        "vs_baseline_per_chip_share": round(img_per_sec_per_chip / 2.0, 4),
        "synced": synced,
        # resolved config in the result line itself, so recorded numbers are
        # self-describing (defaults changed in round 2: int8/batch-6)
        "config": {"quant": quant or "bf16", "batch": batch_size,
                   "timesteps": timesteps},
    }))


def bench_vqa(batch_size: int = 8, prompt_len: int = 600, max_new_tokens: int = 128,
              quant: Optional[str] = None):
    """VQA decode throughput: prefix-LM cached decode over a SigLIP-sized prompt
    (729 image patches + question ≈ 600-900 tokens). Reports tokens/sec/chip."""
    import jax
    import jax.numpy as jnp

    from unigen_tpu.generation import mmu_generate
    from unigen_tpu.models import unigen
    from unigen_tpu.ops import masks as M

    _enable_compile_cache()
    cfg = unigen.UniGenConfig.for_qwen25_15b()
    params = jax.jit(lambda k: unigen.init(k, cfg))(jax.random.key(0))
    if quant in ("int8", "int8+kv"):
        # backbone W8A8 + int8 text head: the head's [D, 160k] read is ~25%
        # of the decode loop's HBM traffic (BENCH.md decode roofline)
        from unigen_tpu.ops.quantization import quantize_unigen_params
        params = jax.jit(lambda p: quantize_unigen_params(p, cfg, lm_head=True))(params)
        print("[bench] vqa backbone+lm_head quantized to int8", file=sys.stderr)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, 1000, size=(batch_size, prompt_len)))
    ids = ids.at[:, 2].set(151665).at[:, 400].set(151666)  # soi .. eoi prefix block
    prompt_lens = jnp.full((batch_size,), prompt_len)

    quant_kv = quant in ("int8kv", "int8+kv")

    def run(params, ids, key):
        attn = M.create_attention_mask_for_mmu(ids, eoi_id=151666)
        return mmu_generate(params, cfg, key, input_ids=ids, attention_mask=attn,
                            prompt_len=prompt_lens, max_new_tokens=max_new_tokens,
                            temperature=0.0, quantized_cache=quant_kv)

    fn = jax.jit(run)

    def sync(x):
        return np.asarray(x[:, ::16])

    with _Watchdog(480):
        t0 = time.perf_counter()
        sync(fn(params, ids, jax.random.key(1)))
        print(f"[bench] vqa compile+warmup: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    times = []
    for i in range(3):
        with _Watchdog(300):
            t0 = time.perf_counter()
            sync(fn(params, ids, jax.random.key(2 + i)))
            times.append(time.perf_counter() - t0)
        print(f"[bench] vqa iter {i}: {times[-1]:.2f}s", file=sys.stderr)
    tps = batch_size * max_new_tokens / min(times)
    metric = "VQA decode tokens/sec/chip (cached prefix-LM)"
    if quant:
        metric += f" [{quant}]"
    print(json.dumps({"metric": metric,
                      "value": round(tps, 2), "unit": "tokens/sec/chip",
                      "vs_baseline": None, "synced": True,
                      "config": {"quant": quant or "bf16", "batch": batch_size,
                                 "prompt_len": prompt_len,
                                 "max_new_tokens": max_new_tokens}}))


def bench_tokenizer(batch_size: int = 16):
    """MAGViTv2 encode+decode throughput at 256px. Reports codes/sec/chip."""
    import jax
    import jax.numpy as jnp

    from unigen_tpu.models import magvit

    _enable_compile_cache()

    vq_cfg = magvit.MagvitConfig(dtype=jnp.bfloat16)
    vq_params = jax.jit(lambda k: magvit.init(k, vq_cfg))(jax.random.key(0))
    px = jax.random.uniform(jax.random.key(1), (batch_size, 256, 256, 3),
                            jnp.bfloat16, -1, 1)

    # each rep consumes a scalar from the previous rep's output so the relay
    # cannot overlap or elide any of the chained executions
    enc = jax.jit(lambda p, x, t: magvit.get_code(p, vq_cfg, x + t.astype(x.dtype)))
    dec = jax.jit(lambda p, c, t: magvit.decode_code(p, vq_cfg,
                                                     c + t.astype(c.dtype)))

    zero = jnp.zeros((), jnp.int32)
    with _Watchdog(480):
        t0 = time.perf_counter()
        codes = enc(vq_params, px, zero)
        _ = np.asarray(codes[:, ::16])
        pix = dec(vq_params, codes, zero)
        _ = np.asarray(pix[:, ::64, ::64, 0])
        print(f"[bench] tokenizer compile+warmup: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    results = {}
    reps = 5   # amortize the ~30ms relay dispatch/sync overhead per timing
    for name, fn, sync in (("encode", lambda t: enc(vq_params, px, t),
                            lambda o: np.asarray(o[:, ::16])),
                           ("decode", lambda t: dec(vq_params, codes, t),
                            lambda o: np.asarray(o[:, ::64, ::64, 0]))):
        times = []
        for _ in range(3):
            with _Watchdog(300):
                t0 = time.perf_counter()
                out = fn(zero)
                for _ in range(reps - 1):
                    # chained dependency (one int32 scalar signature)
                    out = fn((out.reshape(-1)[0] * 0).astype(jnp.int32))
                sync(out)
                times.append((time.perf_counter() - t0) / reps)
        results[name] = batch_size * 256 / min(times)
        print(f"[bench] tokenizer {name}: {min(times):.3f}s", file=sys.stderr)
    print(json.dumps({"metric": "MAGViTv2 encode/decode codes/sec/chip @256px",
                      "value": round(min(results.values()), 1),
                      "unit": "codes/sec/chip", "vs_baseline": None,
                      "encode_codes_per_sec": round(results["encode"], 1),
                      "decode_codes_per_sec": round(results["decode"], 1),
                      "synced": True}))


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "vqa":
        nums = [a for a in args[1:] if a.isdigit()]
        q = next((a for a in args if a in ("int8", "int8kv", "int8+kv")), None)
        bench_vqa(batch_size=int(nums[0]) if nums else 8, quant=q)
    elif args and args[0] == "tokenizer":
        bench_tokenizer(batch_size=int(args[1]) if len(args) > 1 else 16)
    else:
        # int8 W8A8 is the default (fastest exactness-gated config, BENCH.md);
        # `python bench.py bf16` benches the full-precision path. Batch 6 is
        # the measured throughput peak (batch sweep in BENCH.md: 4: 3.14,
        # 5: 3.13, 6: 3.18, 7: 3.08, 8: 2.94 img/s).
        quant = None if "bf16" in args else "int8"
        nums = [a for a in args if a.isdigit()]
        # bf16's documented/peak batch is 4 (BENCH.md)
        default_batch = 6 if quant else 4
        main(batch_size=int(nums[0]) if nums else default_batch, quant=quant)
