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
    hanging the driver. BENCH_WATCHDOG_SCALE multiplies every budget (the
    relay's server-side cold-start varies run to run by >2x, BENCH.md)."""

    SCALE = float(os.environ.get("BENCH_WATCHDOG_SCALE", "1"))

    def __init__(self, seconds: int):
        self.seconds = int(seconds * self.SCALE)

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
         quant: Optional[str] = "int8", also_bf16_batch: Optional[int] = None):
    """One headline run; with ``also_bf16_batch`` a second bf16 measurement is
    taken in the same process and co-reported in the SAME JSON line, so the
    honest (int8, bf16) pair survives into every BENCH_r*.json (VERDICT r3 #6:
    the int8 default is gated on random-weight proxies until real weights land,
    so each recorded headline must carry its full-precision counterpart)."""
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
    params_bf16 = params if also_bf16_batch else None
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

    # BENCH_FUSED=1: sampler+MAGViT-decode as ONE jitted program — one relay
    # dispatch per iteration instead of two (the per-ms iteration accounting
    # in BENCH.md attributes ~59 ms/iter to inter-program scheduling gaps)
    fused = jax.jit(lambda p, i, u, k: decode(vq_params, sample_codes(p, i, u, k))) \
        if os.environ.get("BENCH_FUSED") else None

    def timed_run(run_params, run_ids, run_uncond, run_batch, label=""):
        run_times, run_synced = [], True
        if fused is not None:
            try:
                _, _ = phase(f"fused compile+warmup{label}", 1800,
                             lambda: sync_px(fused(run_params, run_ids,
                                                   run_uncond, jax.random.key(2))))
                with _Watchdog(300 * iters):
                    t0 = time.perf_counter()
                    pxs = [fused(run_params, run_ids, run_uncond,
                                 jax.random.key(3 + i)) for i in range(iters)]
                    for i, px in enumerate(pxs):
                        sync_px(px)
                        run_times.append(time.perf_counter() - t0)
                        print(f"[bench] iter {i}{label}: +"
                              f"{run_times[-1] - (run_times[-2] if i else 0.0):.2f}s",
                              file=sys.stderr)
            except TimeoutError:
                run_synced = False
            if not run_times:
                return 0.0, run_synced
            return (run_batch * len(run_times) / run_times[-1]
                    / jax.device_count()), run_synced
        try:
            # compile budgets: cold-cache compiles of the 50-step scan over the
            # relay can take >10 min; the persistent cache makes repeat runs fast
            # keep the warmup codes ON DEVICE at their real [B, 256] shape: the
            # decoder must warm at the shape the timed loop uses (a host-sliced
            # warmup compiled a [B, 16] decoder and pushed the real compile
            # into timed iter 0 — caught by the pipelined protocol)
            holder = {}

            def _warm_sampler():
                holder["codes"] = sampler(run_params, run_ids, run_uncond,
                                          jax.random.key(2))
                return sync_codes(holder["codes"])

            _, _ = phase(f"sampler compile+warmup{label}", 1800, _warm_sampler)
            _, _ = phase(f"decoder compile+warmup{label}", 900,
                         lambda: sync_px(decoder(vq_params, holder["codes"])))
            # Pipelined steady-state throughput: enqueue every iteration's
            # sampler+decoder up front (async dispatch), then fence them in
            # order. The device runs the programs back-to-back — MAGViT decode
            # of batch i overlaps host work for batch i+1 and no per-iter
            # host→device round trip sits on the critical path (the 0.075
            # s/iter fixed cost measured in BENCH.md r3 was exactly that
            # round trip). This is the serving discipline: a GenEval run
            # evaluates thousands of prompts batch-after-batch with no data
            # dependency between batches (reference inference_unigen.py
            # evaluates synchronously, stranding the gap).
            with _Watchdog(300 * iters):
                t0 = time.perf_counter()
                pxs = []
                for i in range(iters):
                    c = sampler(run_params, run_ids, run_uncond,
                                jax.random.key(3 + i))
                    pxs.append(decoder(vq_params, c))
                for i, px in enumerate(pxs):
                    sync_px(px)
                    run_times.append(time.perf_counter() - t0)
                    print(f"[bench] iter {i}{label}: +"
                          f"{run_times[-1] - (run_times[-2] if i else 0.0):.2f}s",
                          file=sys.stderr)
        except TimeoutError:
            run_synced = False
            print(f"[bench] phase{label} wedged or over budget; reporting what "
                  "completed", file=sys.stderr)
        if not run_times:
            return 0.0, run_synced
        # steady-state rate: total pipelined images over total wall
        rate = run_batch * len(run_times) / run_times[-1] / jax.device_count()
        return rate, run_synced

    img_per_sec_per_chip, synced = timed_run(params, ids, uncond, batch_size)

    bf16_rate = None
    if params_bf16 is not None and quant == "int8":
        # bf16 co-measurement at ITS documented peak batch in the same process:
        # one extra timed config so the recorded headline always carries the
        # full-precision pair (the int8 default rests on random-weight gates)
        ids_b = prompt_batch(also_bf16_batch)
        uncond_b = prompt_batch(also_bf16_batch)
        bf16_rate, bf16_synced = timed_run(params_bf16, ids_b, uncond_b,
                                           also_bf16_batch, label=" [bf16]")
        synced = synced and bf16_synced
    n_chips = jax.device_count()
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
        # the honest pair: full-precision headline measured in the same run
        # (None when the bf16 co-run is disabled or this IS the bf16 run)
        **({"bf16_images_per_sec_per_chip": round(bf16_rate, 4),
            "bf16_config": {"quant": "bf16", "batch": also_bf16_batch,
                            "timesteps": timesteps}}
           if bf16_rate is not None else {}),
    }))


def bench_vqa(batch_size: int = 8, prompt_len: int = 600, max_new_tokens: int = 128,
              quant: Optional[str] = None, kv_layout: str = "bskd"):
    """VQA decode throughput: prefix-LM cached decode over a SigLIP-sized prompt
    (729 image patches + question ≈ 600-900 tokens). Reports tokens/sec/chip.

    ``kv_layout`` (CLI: ``kvseq`` -> skbd, ``kvhead`` -> bhsd) changes the
    KV-cache storage order — the layout lever named by the round-4 decode
    trace (bhsd matches the order the attention fusion consumes, so the
    per-layer cache slice stops being a 0.63 ms/step transpose relayout)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from unigen_tpu.generation import mmu_generate
    from unigen_tpu.models import unigen
    from unigen_tpu.ops import masks as M

    _enable_compile_cache()
    cfg = unigen.UniGenConfig.for_qwen25_15b()
    if kv_layout != "bskd":
        cfg = dataclasses.replace(cfg, llm=dataclasses.replace(
            cfg.llm, kv_layout=kv_layout))
        print(f"[bench] vqa KV cache layout: {kv_layout}", file=sys.stderr)
    params = jax.jit(lambda k: unigen.init(k, cfg))(jax.random.key(0))
    if quant in ("int8", "int8+kv"):
        # backbone W8A8 + int8 text head: the head's [D, 160k] read is ~25%
        # of the decode loop's HBM traffic (BENCH.md decode roofline)
        from unigen_tpu.ops.quantization import quantize_unigen_params
        params = jax.jit(lambda p: quantize_unigen_params(p, cfg, lm_head=True))(params)
        print("[bench] vqa backbone+lm_head quantized to int8", file=sys.stderr)
    elif quant in ("int4", "int4+kv"):
        # W4A8 decode: halves the dominant dense-weight read of the HBM-bound
        # decode loop (VERDICT r3 #5). Opt-in — lossier than int8.
        from unigen_tpu.ops.int4 import quantize_unigen_params_int4
        params = jax.jit(lambda p: quantize_unigen_params_int4(p, cfg))(params)
        print("[bench] vqa backbone+lm_head quantized to int4 (W4A8)",
              file=sys.stderr)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, 1000, size=(batch_size, prompt_len)))
    ids = ids.at[:, 2].set(151665).at[:, 400].set(151666)  # soi .. eoi prefix block
    prompt_lens = jnp.full((batch_size,), prompt_len)

    quant_kv = quant in ("int8kv", "int8+kv", "int4+kv")

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
                                 "max_new_tokens": max_new_tokens,
                                 "kv_layout": kv_layout}}))


def bench_lmms(batch_sizes=(8, 16, 32), n_requests: int = 64,
               max_new_tokens: int = 64, quant: str = "int8", slots: int = 16,
               tiny: bool = False, serving: bool = True, chunk=(8, 16, 32, 64)):
    """lmms-eval adapter END-TO-END throughput: PIL images -> siglip_preprocess
    -> SigLIP tower -> MM projector -> prompt splice -> continuous-batching
    prefix-LM decode -> detokenize (the full generate_until protocol the
    reference runs batch-1, third_party/lmms/models/unigen.py:259-430).

    Flagship shapes at the round-3 protocol (384px images, 64 new tokens per
    request); int8 = W8A8 backbone + heads + SigLIP tower + int8 KV cache.
    Sweeps the vision-prefill micro-batch (adapter ``batch_size``); decode
    always rides the shared continuous-batching engine, and since round 4 the
    tower embeds stay device-resident so vision prefill of waiting requests
    overlaps in-flight decode chunks.
    """
    import jax

    from unigen_tpu import launch
    from unigen_tpu.evaluation.lmms_adapter import UniGenLmmsAdapter
    from unigen_tpu.utils.configuration import initialize_config

    _enable_compile_cache()
    overrides = ["model.quantization=int8"] if quant == "int8" else []
    if tiny:  # CPU smoke: same control flow on toy shapes
        jax.config.update("jax_platforms", "cpu")
        yaml = "configs/tiny/smoke_sft.yaml"
        n_requests, batch_sizes, max_new_tokens, slots = 6, (2,), 8, 4
    else:
        yaml = "configs/unigen_1_5b/unigen_sft.yaml"
    pipe = launch.build_pipeline(initialize_config(yaml, overrides))

    from PIL import Image
    rng = np.random.default_rng(0)
    size = pipe.vision_cfg.image_size
    questions = ["What is in this image?", "Is there a cat?",
                 "Describe the scene in detail.", "What color is the object?"]

    def make_requests(n, seed_off=0):
        reqs = []
        for i in range(n):
            img = Image.fromarray(
                rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8))
            reqs.append((questions[(i + seed_off) % len(questions)],
                         {"max_new_tokens": max_new_tokens}, [img]))
        return reqs

    results = []
    for bs in batch_sizes:
        adapter = UniGenLmmsAdapter(
            pipe, serving=serving, batch_size=bs, max_new_tokens=max_new_tokens,
            serving_slots=slots, serving_chunk=chunk,
            serving_quantized_cache=(quant == "int8" and not tiny))
        with _Watchdog(2400):
            t0 = time.perf_counter()
            # warm with a FULL slot wave: admission programs compile per
            # (bucket, group-size) signature, so a tiny warmup leaves the
            # real wave's admit compile inside the measurement (~4s on the
            # relay — the r5 debug timeline caught exactly this)
            # max(slots, bs): covers the wave-sized admission group AND the
            # measurement's vision-tower pixel batch (serving mode does not
            # pad partial pixel chunks, so a small warmup compiles a
            # different tower batch than the run uses)
            warm_n = min(max(slots, bs) if serving else 4, n_requests)
            adapter.generate_until(make_requests(warm_n, seed_off=1))
            print(f"[bench] lmms bs={bs} compile+warmup: "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        with _Watchdog(1800):
            reqs = make_requests(n_requests)
            t0 = time.perf_counter()
            outs = adapter.generate_until(reqs)
            dt = time.perf_counter() - t0
        assert len(outs) == n_requests and all(o is not None for o in outs)
        toks = (sum(s.tokens_generated for s in adapter.last_stats)
                if serving else n_requests * max_new_tokens)
        tps = toks / dt
        results.append((bs, tps, n_requests / dt))
        print(f"[bench] lmms bs={bs}: {dt:.2f}s, {toks} tokens, "
              f"{tps:.0f} tok/s, {n_requests / dt:.1f} req/s", file=sys.stderr)
        if serving and adapter.last_latency:
            lat = adapter.last_latency
            print(f"[bench] lmms bs={bs} latency: "
                  f"ttft p50={lat['ttft_p50_s']*1e3:.0f}ms "
                  f"p99={lat['ttft_p99_s']*1e3:.0f}ms, "
                  f"itl p50={lat['itl_p50_s']*1e3:.1f}ms "
                  f"p99={lat['itl_p99_s']*1e3:.1f}ms", file=sys.stderr)
            for s in adapter.last_stats:
                print(f"[bench] lmms bs={bs} loop: chunks={s.decode_chunks} "
                      f"drain={s.t_drain:.2f}s admit={s.t_admit:.2f}s "
                      f"dispatch={s.t_dispatch:.2f}s harvest={s.t_harvest:.2f}s "
                      f"occupancy={s.occupancy:.2f}", file=sys.stderr)
    best = max(results, key=lambda r: r[1])
    mode = "serving" if serving else "static"
    print(json.dumps({
        "metric": f"lmms end-to-end tokens/sec/chip (vision+prefill+decode, "
                  f"{mode}) [{quant}]",
        "value": round(best[1], 1), "unit": "tokens/sec/chip",
        "vs_baseline": None, "synced": True,
        "config": {"quant": quant, "mode": mode, "n_requests": n_requests,
                   "slots": slots, "max_new_tokens": max_new_tokens,
                   "image_size": size, "best_batch": best[0]},
        "sweep": [{"batch": b, "tok_s": round(t, 1), "req_s": round(r, 2)}
                  for b, t, r in results]}))


def bench_serve(slots: int = 32, n_requests: int = 96, prompt_len: int = 600,
                chunk: int = 16, quant: Optional[str] = "int8+kv",
                seed: int = 0, tiny: bool = False, speculate_k: int = 0):
    """Continuous-batching serving throughput on a mixed-length trace.

    Workload: ``n_requests`` prompts of ``prompt_len`` tokens with decode
    budgets drawn uniform[32, 224] (mean ~128) — the request-length variance a
    real VQA/caption service sees. Two measured runs over the SAME trace and
    the SAME engine programs:

    - continuous: all requests queued up front; slots refill as they free
      (unigen_tpu/serving/engine.py).
    - static: the same requests in waves of ``slots``, waiting for each wave
      to drain — every wave runs at its longest request (the
      evaluation/lmms_adapter.py discipline, and the reference's; its adapter
      is batch-1, third_party/lmms/models/unigen.py:259-430).

    Reports useful tokens/sec/chip for both plus the continuous/static speedup.
    """
    import jax

    from unigen_tpu.models import unigen
    from unigen_tpu.serving import ServingEngine

    _enable_compile_cache()
    if tiny:  # CPU smoke: exercises the same control flow on a toy model
        # (sitecustomize re-forces the relay platform, so set it explicitly —
        # the smoke must never touch the chip)
        jax.config.update("jax_platforms", "cpu")
        cfg = unigen.UniGenConfig.tiny()
        prompt_len, n_requests, slots = 24, 12, 4
    else:
        cfg = unigen.UniGenConfig.for_qwen25_15b()
    params = jax.jit(lambda k: unigen.init(k, cfg))(jax.random.key(0))
    decode_params = None
    if quant in ("int8", "int8+kv", "int8+int4") and not tiny:
        from unigen_tpu.ops.quantization import quantize_unigen_params
        qparams = jax.jit(lambda p: quantize_unigen_params(p, cfg, lm_head=True))(params)
        print("[bench] serve backbone+lm_head quantized to int8", file=sys.stderr)
        if quant == "int8+int4":
            # mixed precision: int8 admission + W4A8 decode chunks
            from unigen_tpu.ops.int4 import quantize_unigen_params_int4
            decode_params = jax.jit(
                lambda p: quantize_unigen_params_int4(p, cfg))(params)
            print("[bench] serve decode chunks on int4 W4A8", file=sys.stderr)
        params = qparams
    quant_kv = quant in ("int8+kv", "int8+int4") and not tiny
    if tiny:
        quant = None

    rng = np.random.default_rng(seed)
    prompts = [rng.integers(10, min(1000, cfg.text_vocab_len - 1),
                            size=(prompt_len,)).tolist()
               for _ in range(n_requests)]
    budgets = rng.integers(8 if tiny else 32, 33 if tiny else 225,
                           size=n_requests).tolist()
    bucket = ((prompt_len + 127) // 128) * 128
    max_len = bucket + 256

    def make_engine():
        return ServingEngine(params, cfg, slots=slots, max_len=max_len,
                             buckets=(bucket,), chunk=chunk,
                             quantized_cache=quant_kv, seed=seed,
                             speculate_k=speculate_k,
                             decode_params=decode_params,
                             precompile=[("ids", bucket)])

    # warmup/compile: one tiny pass through both programs (admit + decode)
    with _Watchdog(1800):
        t0 = time.perf_counter()
        with make_engine() as weng:
            weng.submit(prompts[0], max_new_tokens=2).result(timeout=1700)
        print(f"[bench] serve compile+warmup: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    acceptance = {}

    def run(static: bool) -> float:
        eng = make_engine()
        t0 = time.perf_counter()
        if static:
            for w0 in range(0, n_requests, slots):
                futs = [eng.submit(p, max_new_tokens=b) for p, b in
                        zip(prompts[w0:w0 + slots], budgets[w0:w0 + slots])]
                for f in futs:
                    f.result(timeout=900)
        else:
            futs = [eng.submit(p, max_new_tokens=b)
                    for p, b in zip(prompts, budgets)]
            for f in futs:
                f.result(timeout=900)
        dt = time.perf_counter() - t0
        occ = eng.stats.occupancy
        # accepted tokens per occupied decode step (1.0 without speculation)
        acceptance["static" if static else "continuous"] = (
            eng.stats.tokens_generated / max(eng.stats.busy_steps, 1))
        eng.close()
        mode = "static" if static else "continuous"
        print(f"[bench] serve {mode}: {dt:.2f}s, occupancy {occ:.2f}",
              file=sys.stderr)
        return dt

    def run_latency(static: bool, arrival_s: float):
        """Same trace, STAGGERED arrivals: client-observed TTFT under the two
        disciplines. Continuous admits each arrival into the running batch;
        static makes arrivals wait for the in-flight wave to drain (the
        reference's only option). TTFT measured from ARRIVAL, so host queue
        wait counts against static."""
        import queue as _q
        import threading as _t

        eng = make_engine()
        arrivals: "_q.Queue" = _q.Queue()

        def submitter():
            for p, b in zip(prompts, budgets):
                arrivals.put((p, b, time.perf_counter()))
                time.sleep(arrival_s)
            arrivals.put(None)

        th = _t.Thread(target=submitter, daemon=True)
        ttfts, done = [], []
        th.start()
        if static:
            open_waves = True
            while open_waves:
                wave = []
                item = arrivals.get()
                if item is None:
                    break
                wave.append(item)
                # wave forms from whatever has arrived, up to `slots`
                try:
                    while len(wave) < slots:
                        nxt = arrivals.get(block=False)
                        if nxt is None:
                            open_waves = False
                            break
                        wave.append(nxt)
                except _q.Empty:
                    pass
                futs = [(eng.submit(p, max_new_tokens=b), t0)
                        for p, b, t0 in wave]
                for f, t0 in futs:
                    f.result(timeout=900)
                    ttfts.append(f.first_token_t - t0)
                    done.append(f)
        else:
            futs = []
            while True:
                item = arrivals.get()
                if item is None:
                    break
                p, b, t0 = item
                futs.append((eng.submit(p, max_new_tokens=b), t0))
            for f, t0 in futs:
                f.result(timeout=900)
                ttfts.append(f.first_token_t - t0)
                done.append(f)
        th.join()
        itls = [f.itl for f in done if f.itl is not None]
        eng.close()
        ttfts.sort()
        itls.sort()

        def pct(xs, q):
            return round(xs[min(len(xs) - 1, int(len(xs) * q))], 4)

        out = {"ttft_p50_s": pct(ttfts, 0.5), "ttft_p99_s": pct(ttfts, 0.99),
               "itl_p50_s": pct(itls, 0.5) if itls else None,
               "itl_p99_s": pct(itls, 0.99) if itls else None}
        mode = "static" if static else "continuous"
        print(f"[bench] serve latency {mode} (arrival {arrival_s}s): "
              f"ttft p50={out['ttft_p50_s']}s p99={out['ttft_p99_s']}s",
              file=sys.stderr)
        return out

    total_tokens = sum(budgets)
    with _Watchdog(1500):
        t_static = run(static=True)
    with _Watchdog(1500):
        t_cont = run(static=False)
    # latency under load: arrivals at ~70% of the continuous engine's measured
    # serving capacity (interval = service_interval / 0.7), so queueing is
    # real but stable in both disciplines
    arrival_s = max(0.01, t_cont / n_requests / 0.7)
    with _Watchdog(1500):
        lat_static = run_latency(static=True, arrival_s=arrival_s)
    with _Watchdog(1500):
        lat_cont = run_latency(static=False, arrival_s=arrival_s)
    tps_cont = total_tokens / t_cont
    tps_static = total_tokens / t_static
    print(json.dumps({
        "metric": f"serving tokens/sec/chip (continuous batching) [{quant or 'bf16'}]",
        "value": round(tps_cont, 1), "unit": "tokens/sec/chip",
        "vs_baseline": None, "synced": True,
        "config": {"slots": slots, "n_requests": n_requests,
                   "prompt_len": prompt_len, "chunk": chunk,
                   "quant": quant or "bf16", "speculate_k": speculate_k,
                   "budgets": "U[8,32]" if tiny else "U[32,224]"},
        "static_tokens_per_s": round(tps_static, 1),
        "accepted_per_step": round(acceptance.get("continuous", 1.0), 3),
        "speedup_vs_static": round(tps_cont / tps_static, 3),
        "latency_arrival_s": round(arrival_s, 4),
        "latency_continuous": lat_cont, "latency_static": lat_static}))


def bench_profile(stage: str = "sampler", trace_root: str = "/tmp/unigen_traces",
                  tiny: bool = False):
    """jax.profiler trace + per-op device-time table + MFU for one stage.

    Stages: sampler (t2i batch 6 int8), vqa (batch-32 cached decode int8+kv),
    tokenizer (MAGViT encode+decode batch 16), train (PT2 step at the
    reference per-device batch). Converts VERDICT r3 Weak #4's asserted
    roofline gaps into trace evidence: writes the trace under
    ``trace_root/<stage>``, prints the top op table (utils/trace_analysis.py),
    and reports MFU = XLA cost-analysis FLOPs / wall / peak (197T bf16 and
    269T int8 bases — the honest MFU is between them for mixed programs).
    """
    import jax
    import jax.numpy as jnp

    from unigen_tpu.utils import profiling, trace_analysis

    if tiny:  # CPU smoke: toy shapes, identical control flow + trace parsing
        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    tdir = os.path.join(trace_root, stage)
    rng = np.random.default_rng(0)

    def _measure(fn, sync, reps=3):
        sync(fn())  # compile+warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        wall = (time.perf_counter() - t0) / reps
        with profiling.trace(tdir):
            sync(fn())
        return wall

    if stage == "sampler":
        from unigen_tpu.generation import t2i_generate
        from unigen_tpu.models import unigen
        from unigen_tpu.ops import masks as M
        from unigen_tpu.ops.quantization import quantize_unigen_params
        cfg = (unigen.UniGenConfig.tiny() if tiny
               else unigen.UniGenConfig.for_qwen25_15b())
        params = jax.jit(lambda k: unigen.init(k, cfg))(jax.random.key(0))
        params = jax.jit(lambda p: quantize_unigen_params(p, cfg))(params)
        b, n, text_len = (2, cfg.num_vq_tokens, 12) if tiny else (
            6, cfg.num_vq_tokens, 135)
        pad, soi, eoi = (0, 1, 2) if tiny else (151643, 151665, 151666)
        ids = jnp.asarray(np.concatenate(
            [np.full((b, 4), pad), rng.integers(10, min(1000, cfg.text_vocab_len - 1),
                                                size=(b, text_len - 4)),
             np.full((b, 1), soi), np.full((b, n), cfg.mask_token_id),
             np.full((b, 1), eoi)], axis=1))
        uncond = ids

        @jax.jit
        def step(params, ids, key):
            both = jnp.concatenate([ids, ids], axis=0)
            attn = M.create_attention_mask_predict_next(both, pad, soi, eoi,
                                                        rm_pad_in_image=True)
            return t2i_generate(params, cfg, key, ids, attn,
                                uncond_input_ids=ids, guidance_scale=6.0,
                                timesteps=3 if tiny else 50,
                                temperature=1.0, pad_id=pad)

        with _Watchdog(2400):
            wall = _measure(lambda: step(params, ids, jax.random.key(1)),
                            lambda x: np.asarray(x[:, ::16]))
        # analytic FLOPs (cost_analysis counts the 50-step while body once):
        # prefix-KV prefill (2B x text prefix) + T steps of 2B x 258-token
        # chunk forwards against the 393-token cache + the CFG-combined image
        # head on B rows (BENCH.md hand count: ~8.2 TFLOP/step at batch 6)
        T = 3 if tiny else 50
        chunk, seq = n + 2, text_len + n + 2
        llm = cfg.llm
        flops = (2 * b * (seq - chunk) * _backbone_flops_per_token(llm, (seq - chunk) / 2)
                 + T * (2 * b * chunk * _backbone_flops_per_token(llm, seq)
                        + b * chunk * 2 * llm.hidden_size * cfg.codebook_size))
        unit_note = f"{b} images / {wall:.3f}s = {b / wall:.2f} img/s"
    elif stage == "vqa":
        from unigen_tpu.generation import mmu_generate
        from unigen_tpu.models import unigen
        from unigen_tpu.ops import masks as M
        from unigen_tpu.ops.quantization import quantize_unigen_params
        cfg = (unigen.UniGenConfig.tiny() if tiny
               else unigen.UniGenConfig.for_qwen25_15b())
        params = jax.jit(lambda k: unigen.init(k, cfg))(jax.random.key(0))
        params = jax.jit(lambda p: quantize_unigen_params(p, cfg, lm_head=True))(params)
        b, plen, mnew = (2, 16, 4) if tiny else (32, 600, 128)
        soi_id, eoi_id = (1, 2) if tiny else (151665, 151666)
        ids = jnp.asarray(rng.integers(3, min(1000, cfg.text_vocab_len - 1),
                                       size=(b, plen)))
        ids = ids.at[:, 2].set(soi_id).at[:, plen * 2 // 3].set(eoi_id)

        @jax.jit
        def step(params, ids, key):
            attn = M.create_attention_mask_for_mmu(ids, eoi_id=eoi_id)
            return mmu_generate(params, cfg, key, input_ids=ids,
                                attention_mask=attn,
                                prompt_len=jnp.full((b,), plen),
                                max_new_tokens=mnew, temperature=0.0,
                                quantized_cache=True)

        with _Watchdog(2400):
            wall = _measure(lambda: step(params, ids, jax.random.key(1)),
                            lambda x: np.asarray(x[:, ::16]))
        # analytic FLOPs: causal prefill over plen + mnew cached decode steps
        # with the full-vocab lm_head on each new token (the 128-step decode
        # while loop and 28-layer scan are invisible to cost_analysis)
        llm = cfg.llm
        flops = (b * plen * _backbone_flops_per_token(llm, plen / 2)
                 + b * mnew * (_backbone_flops_per_token(llm, plen + mnew / 2)
                               + 2 * llm.hidden_size * cfg.vocab_size))
        unit_note = (f"{b * mnew} tokens / {wall:.3f}s = {b * mnew / wall:.0f} "
                     f"tok/s (incl. prefill)")
    elif stage == "tokenizer":
        from unigen_tpu.models import magvit
        vq_cfg = (magvit.MagvitConfig.tiny(resolution=8, z_channels=5) if tiny
                  else magvit.MagvitConfig(dtype=jnp.bfloat16))
        vq = jax.jit(lambda k: magvit.init(k, vq_cfg))(jax.random.key(1))
        if not tiny:
            vq = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), vq)
        b, res = (2, 8) if tiny else (16, 256)
        px = jnp.asarray(rng.uniform(-1, 1, size=(b, res, res, 3)),
                         vq_cfg.dtype)

        @jax.jit
        def step(vq, px):
            codes = magvit.get_code(vq, vq_cfg, px)
            return magvit.decode_code(vq, vq_cfg, codes)

        with _Watchdog(1800):
            wall = _measure(lambda: step(vq, px),
                            lambda x: np.asarray(x[:, ::64, ::64, 0]))
        flops = _flops_of(step, vq, px)
        unit_note = f"{b} enc+dec / {wall:.3f}s = {b / wall:.1f} img/s"
    elif stage == "engine":
        # the ServingEngine's OWN decode-chunk program (per-row cache index +
        # SlotState device stop) at serving shapes — vs the 'vqa' stage's
        # static uniform-index decode, this isolates what continuous batching
        # pays per step (r5 measured: 5.29 vs 4.20 ms/step at 32 slots; the
        # whole premium is the per-row KV write — BENCH.md engine trace)
        from unigen_tpu.models import unigen, qwen2
        from unigen_tpu.ops.quantization import quantize_unigen_params
        from unigen_tpu.serving.engine import (_decode_chunk, init_slot_state,
                                               SlotState)
        cfg = (unigen.UniGenConfig.tiny() if tiny
               else unigen.UniGenConfig.for_qwen25_15b())
        params = jax.jit(lambda k: unigen.init(k, cfg))(jax.random.key(0))
        if not tiny:
            params = jax.jit(
                lambda p: quantize_unigen_params(p, cfg, lm_head=True))(params)
        b, seq, steps_n = (2, 24, 4) if tiny else (32, 864, 16)
        cache = qwen2.init_kv_cache(cfg.llm, b, seq, quantize=not tiny,
                                    per_row_index=True)
        # rows mid-decode at staggered positions, all active
        idx = rng.integers(seq // 2, seq - steps_n - 1, size=(b,))
        mean_idx = float(idx.mean())
        cache = cache._replace(index=jnp.asarray(idx, jnp.int32))
        state = SlotState(
            last_tok=jnp.asarray(rng.integers(3, 100, size=(b,)), jnp.int32),
            active=jnp.ones((b,), bool),
            emitted=jnp.zeros((b,), jnp.int32),
            budget=jnp.full((b,), 10_000, jnp.int32),
            eot=jnp.full((b,), -1, jnp.int32),
            temp=jnp.zeros((b,), jnp.float32),
            seed=jnp.arange(b, dtype=jnp.int32))

        def fn(cache, state):
            return _decode_chunk(params, cache, state, cfg=cfg, steps=steps_n,
                                 top_k=None)

        # donation consumes cache/state; re-feed the returned handles
        holder = {"c": cache, "s": state}

        def step():
            c, s, toks = fn(holder["c"], holder["s"])
            holder["c"], holder["s"] = c, s
            return toks

        with _Watchdog(2400):
            wall = _measure(step, lambda x: np.asarray(x))
        wall /= steps_n  # per decode step
        llm = cfg.llm
        flops = b * (_backbone_flops_per_token(llm, mean_idx)
                     + 2 * llm.hidden_size * cfg.vocab_size)
        unit_note = (f"{b} slots x {steps_n} steps; {wall * 1e3:.2f} ms/step = "
                     f"{b / wall:.0f} tok/s")
    elif stage in ("train", "train-sft", "train-dpo"):
        # reuse the full bench_train harness (its own JSON line reports
        # samples/s); BENCH_TRACE_DIR makes it trace one mid-run step
        mode = {"train": "pt2", "train-sft": "sft", "train-dpo": "dpo"}[stage]
        os.environ["BENCH_TRACE_DIR"] = tdir
        bench_train(mode, steps=4, tiny=tiny)
        rows = trace_analysis.op_table(tdir)
        trace_analysis.print_table(rows, top_n=15)
        return
    else:
        raise SystemExit(f"unknown profile stage {stage}")

    rows = trace_analysis.op_table(tdir)
    trace_analysis.print_table(rows, top_n=15)
    busy = sum(r["total_ms"] for r in rows)
    mfu_bf16 = flops / wall / 197e12 if flops else None
    mfu_int8 = flops / wall / 269e12 if flops else None
    print(json.dumps({
        "metric": f"profile:{stage}", "value": round(wall, 4), "unit": "s/step",
        "vs_baseline": None, "synced": True,
        "note": unit_note, "device_busy_ms": round(busy, 1),
        "flops_per_step": flops,
        "flops_method": "xla_cost_analysis" if stage == "tokenizer" else "analytic",
        **({"mfu_bf16_base": round(mfu_bf16, 4),
            "mfu_int8_base": round(mfu_int8, 4)} if flops else {}),
        # full HLO op strings run to kilobytes; keep the JSON line readable
        "top_ops": [{**r, "name": r["name"][:120]} for r in rows[:8]],
        "trace_dir": tdir}))


def _flops_of(jitted, *args):
    """XLA cost-analysis FLOPs of a compiled function (None if unavailable).

    CAUTION: XLA's cost model counts a while/scan BODY ONCE, not x trip
    count — the layer-scanned backbone undercounts 28x and the 50-step
    sampler / 128-step decode loops undercount further. Only trustworthy for
    loop-free programs (the MAGViT conv stacks); everywhere the backbone runs,
    MFU must use the closed forms below (`_backbone_flops_per_token`)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        return float(ca.get("flops", 0.0)) or None
    except Exception as e:
        print(f"[bench] cost analysis unavailable: {e}", file=sys.stderr)
        return None


def _transformer_flops_per_token(h: int, q_dim: int, kv_dim: int, inter: int,
                                 layers: int, kv_len: float,
                                 mlp_mats: int = 3) -> float:
    """Analytic forward FLOPs/token for one transformer stack (2*MACs).

    dense = qkv projections + output projection + MLP matmuls;
    attn  = QK^T + AV against ``kv_len`` cached/visible positions.
    For causal self-attention over a length-L block pass kv_len = L/2
    (the triangular average); for cached decode pass the cache length."""
    dense = 2 * h * (q_dim + 2 * kv_dim) + 2 * q_dim * h + mlp_mats * 2 * h * inter
    attn = 4 * kv_len * q_dim
    return float(layers) * (dense + attn)


def _backbone_flops_per_token(llm, kv_len: float) -> float:
    """Qwen2 backbone forward FLOPs/token (matches BENCH.md's hand count:
    ~2.62 GFLOP/token for the 1.5B at short kv_len)."""
    return _transformer_flops_per_token(
        llm.hidden_size, llm.num_attention_heads * llm.head_dim,
        llm.num_key_value_heads * llm.head_dim, llm.intermediate_size,
        llm.num_hidden_layers, kv_len, mlp_mats=3)


# XLA cost-analysis FLOPs of the flagship MAGViTv2 at 256px (loop-free conv
# stacks, so the cost model is exact here — BENCH.md tokenizer roofline)
_MAGVIT_ENC_FLOPS_PER_IMG = 351.6e9
_MAGVIT_DEC_FLOPS_PER_IMG = 298.5e9


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


def bench_train(mode: str = "pt2", steps: int = 20, tiny: bool = False,
                batch_scale: float = 1.0, online_ref: bool = False,
                flash: bool = False):
    """Training-step throughput: samples/sec/device for the flagship 1.5B at
    the reference's own per-device batches (configs/unigen_1_5b/*.yaml; same
    numbers as the reference configs of the same names). Random weights +
    synthetic batches — identical FLOPs/memory traffic to real data. Modes:

      pt2: unified 3-task pretraining step — 8 t2i + 2 lm + 6 mmu, seq 387
           (reference training/train.py protocol)
      sft: SigLIP-SO400M-tower step — 3 t2i + 1 lm + 4 mmu at L=1344
           (3 head + 729 patches + 612 conversation tokens; tower frozen,
           llm+mm_projector trainable; reference training/train_w_clip_vit.py)
      dpo: 10 preference pairs — policy + frozen reference each forward a
           concatenated [2b, 387] batch (reference training/train_dpo.py)

    ``tiny`` runs the identical harness at toy widths on CPU (shape smoke).
    ``batch_scale`` scales every sub-batch (DPO at 1.5B exceeds one 16GB chip
    at the full reference batch; see BENCH.md training section).
    """
    import jax
    import jax.numpy as jnp

    if tiny:
        # the ambient sitecustomize re-forces the TPU relay platform after env
        # parsing, so JAX_PLATFORMS=cpu alone does not stick; the tiny smoke
        # must never burn relay compiles
        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    from unigen_tpu.models import magvit, siglip, unigen
    from unigen_tpu.training.dpo import DPOConfig, make_dpo_step
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.sft import SFTStepConfig, make_sft_train_step
    from unigen_tpu.training.train_step import (TrainStepConfig, init_train_state,
                                                make_train_step)

    rng = np.random.default_rng(0)
    if tiny:
        cfg = unigen.UniGenConfig.tiny(w_und_encoder=True, mm_input_dim=32)
        vq_cfg = magvit.MagvitConfig.tiny(z_channels=5, resolution=8)
        vs_cfg = siglip.SiglipConfig.tiny()
        pad, soi, eoi = 0, 1, 2
        text_hi, res, text_budget = 100, 8, 8
    else:
        cfg = unigen.UniGenConfig.for_qwen25_15b(
            w_und_encoder=True, mm_input_dim=1152)
        vq_cfg = magvit.MagvitConfig(dtype=jnp.bfloat16)
        vs_cfg = siglip.SiglipConfig.so400m(dtype=jnp.bfloat16)
        pad, soi, eoi = 151643, 151665, 151666
        text_hi, res, text_budget = 1000, 256, 129
    n = cfg.num_vq_tokens
    L = text_budget + n + 2          # [text | soi | img n | eoi] = 387 flagship

    def scaled(b):
        return max(1, round(b * batch_scale))

    def t2i_arrays(b):
        """Template/labels with the image block zeroed (spliced on device)."""
        ids = np.concatenate([
            np.full((b, 4), pad),
            rng.integers(10, text_hi, size=(b, text_budget - 4)),
            np.full((b, 1), soi), np.zeros((b, n), np.int64),
            np.full((b, 1), eoi)], axis=1)
        labels = np.full((b, L), -100, np.int64)
        labels[:, text_budget + 1:text_budget + 1 + n] = 0
        return jnp.asarray(ids), jnp.asarray(labels)

    def lm_arrays(b):
        ids = rng.integers(10, text_hi, size=(b, L))
        ids[:, :4] = pad
        labels = np.where(ids == pad, -100, ids)
        return jnp.asarray(ids), jnp.asarray(labels)

    def mmu_vq_arrays(b):
        """Pretraining mmu layout: image block at [3:3+n], eoi, then text."""
        ids = rng.integers(10, text_hi, size=(b, L))
        ids[:, 3:3 + n] = 0
        ids[:, 3 + n] = eoi
        labels = np.where(np.arange(L)[None] < 4 + n, -100, ids)
        return jnp.asarray(ids), jnp.asarray(labels)

    t0 = time.perf_counter()
    params = jax.jit(lambda k: unigen.init(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)
    vq_params = jax.jit(lambda k: magvit.init(k, vq_cfg))(jax.random.key(1))
    vq_params = jax.tree_util.tree_map(lambda x: x.astype(vq_cfg.dtype), vq_params)
    print(f"[bench] train init ({mode}): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    schedule = lambda step: 1.0  # constant LR: step cost is schedule-independent
    key = jax.random.key(0)

    if mode == "pt2":
        bt, bl, bm = scaled(8), scaled(2), scaled(6)
        tx = make_optimizer(params, 5e-5, schedule)
        tcfg = TrainStepConfig(batch_size_t2i=bt, batch_size_lm=bl,
                               batch_size_mmu=bm, pad_id=pad, soi_id=soi,
                               eoi_id=eoi, remat=True,
                               use_flash_attention=flash)
        step = jax.jit(make_train_step(cfg, vq_cfg, tx, tcfg), donate_argnums=(0,))
        ti, tl = t2i_arrays(bt)
        li, ll = lm_arrays(bl)
        mi, ml = mmu_vq_arrays(bm)
        batch = {"t2i_template": ti, "t2i_labels": tl,
                 "t2i_pixels": jnp.asarray(
                     rng.normal(size=(bt, res, res, 3)).astype(np.float32)),
                 "lm_ids": li, "lm_labels": ll,
                 "mmu_template": mi, "mmu_labels": ml,
                 "mmu_pixels": jnp.asarray(
                     rng.normal(size=(bm, res, res, 3)).astype(np.float32))}
        run = lambda state, k: step(state, vq_params, batch, k)
        samples = bt + bl + bm
        # analytic step FLOPs (the layer scan + loop bodies are invisible to
        # XLA cost analysis): trainable backbone fwd+bwd = 3x forward, full
        # 160k-vocab chunked CE over the labeled positions, frozen MAGViT
        # encode of the t2i/mmu pixels = 1x forward
        ce_pos = bt * n + bl * (L - 4) + bm * (L - 4 - n)
        step_flops = (3 * ((bt + bl + bm) * L
                           * _backbone_flops_per_token(cfg.llm, L / 2)
                           + 2 * cfg.llm.hidden_size * cfg.vocab_size * ce_pos)
                      + (bt + bm) * _MAGVIT_ENC_FLOPS_PER_IMG)
    elif mode == "sft":
        bt, bl, bm = scaled(3), scaled(1), scaled(4)
        vs_params = jax.jit(lambda k: siglip.init(k, vs_cfg))(jax.random.key(2))
        vs_params = jax.tree_util.tree_map(
            lambda x: x.astype(vs_cfg.dtype), vs_params)
        tx = make_optimizer(params, 1e-5, schedule,
                            tunable_parts=["llm", "mm_projector"],
                            lr_mapper={"mm_projector": 10.0})
        p_tokens = vs_cfg.num_patches
        # reference SFT max_seq_length 1344 = 3 head + 729 patches + part2
        part2_len = (1344 if not tiny else 3 + p_tokens + 28) - 3 - p_tokens
        lm_sft = 3 + p_tokens + part2_len
        # common_length: all three flows in ONE backbone call (left-padded
        # t2i/lm rows) — the only shape whose optimizer-state + single
        # grad-tree footprint fits flagship SFT on a 16GB chip (BENCH.md)
        tcfg = SFTStepConfig(batch_size_t2i=bt, batch_size_lm=bl,
                             batch_size_mmu=bm, pad_id=pad, soi_id=soi,
                             eoi_id=eoi, remat=True, common_length=lm_sft,
                             use_flash_attention=flash)
        step = jax.jit(make_sft_train_step(cfg, vq_cfg, vs_cfg, tx, tcfg),
                       donate_argnums=(0,))
        part2 = rng.integers(10, text_hi, size=(bm, part2_len))
        part2[:, 0] = eoi
        mmu_labels = np.concatenate(
            [np.full((bm, 3 + p_tokens + 1), -100),
             rng.integers(10, text_hi, size=(bm, part2_len - 1))], axis=1)
        ti, tl = t2i_arrays(bt)
        li, ll = lm_arrays(bl)
        batch = {"t2i_template": ti, "t2i_labels": tl,
                 "t2i_pixels": jnp.asarray(
                     rng.normal(size=(bt, res, res, 3)).astype(np.float32)),
                 "lm_ids": li, "lm_labels": ll,
                 "mmu_part1": jnp.asarray(
                     rng.integers(10, text_hi, size=(bm, 3))),
                 "mmu_part2": jnp.asarray(part2),
                 "mmu_labels": jnp.asarray(mmu_labels),
                 "mmu_pixels": jnp.asarray(rng.normal(
                     size=(bm, vs_cfg.image_size, vs_cfg.image_size, 3)
                 ).astype(np.float32)),
                 "mmu_prompt_len": jnp.full((bm,), lm_sft)}
        run = lambda state, k: step(state, vq_params, vs_params, batch, k)
        samples = bt + bl + bm
        # packed common-length rows: 387-token t2i/lm segments share 1344-token
        # rows (BENCH.md training #3); backbone 3x, frozen SigLIP tower and
        # MAGViT encode 1x, full-vocab CE over labeled positions
        seg_per_row = max(1, lm_sft // L)
        packed_rows = -(-(bt + bl) // seg_per_row)
        ce_pos = bt * n + bl * (L - 4) + bm * (part2_len - 1)
        tower_tok = bm * p_tokens
        tower_flops = tower_tok * (_transformer_flops_per_token(
            vs_cfg.hidden_size, vs_cfg.hidden_size, vs_cfg.hidden_size,
            vs_cfg.intermediate_size, vs_cfg.num_layers_used, p_tokens,
            mlp_mats=2)
            + 2 * 3 * vs_cfg.patch_size ** 2 * vs_cfg.hidden_size)
        step_flops = (3 * ((packed_rows + bm) * lm_sft
                           * _backbone_flops_per_token(cfg.llm, lm_sft / 2)
                           + 2 * cfg.llm.hidden_size * cfg.vocab_size * ce_pos)
                      + tower_flops + bt * _MAGVIT_ENC_FLOPS_PER_IMG)
    elif mode == "dpo":
        from unigen_tpu.training.dpo import make_ref_logps_fn

        b = scaled(10)
        tx = make_optimizer(params, 1e-6, schedule, max_grad_norm=1.0)
        # precomputed_ref (default): the reference policy == the step-0 policy,
        # so its logps are computed ahead of the loop and the second 1.5B model
        # is never HBM-resident during training — the config that fits one
        # 16GB chip (training/dpo.py::make_ref_logps_fn). `online` measures
        # the reference's resident-second-model protocol instead.
        dcfg = DPOConfig(beta=0.1, pad_id=pad, soi_id=soi, eoi_id=eoi,
                         max_grad_norm=1.0, remat=True,
                         precomputed_ref=not online_ref)
        step = jax.jit(make_dpo_step(cfg, vq_cfg, tx, dcfg), donate_argnums=(0,))
        ti, tl = t2i_arrays(b)
        batch = {"template": ti, "labels": tl,
                 "chosen_pixels": jnp.asarray(
                     rng.normal(size=(b, res, res, 3)).astype(np.float32)),
                 "rejected_pixels": jnp.asarray(
                     rng.normal(size=(b, res, res, 3)).astype(np.float32))}
        if online_ref:
            ref_params = jax.tree_util.tree_map(jnp.copy, params)
            run = lambda state, k: step(state, ref_params, vq_params, batch, k)
        else:
            ref_fn = jax.jit(make_ref_logps_fn(cfg, vq_cfg, dcfg))
            all_keys = jax.random.split(key, steps + 1)
            t0 = time.perf_counter()
            refs = [jax.tree_util.tree_map(np.asarray,
                                           ref_fn(params, vq_params, batch, k))
                    for k in all_keys]
            print(f"[bench] dpo ref precompute ({steps + 1} batches): "
                  f"{time.perf_counter() - t0:.1f}s (forward-only pass, one "
                  "per training step, paid up front)", file=sys.stderr)
            calls = {"i": 0}

            def run(state, k):
                r = refs[calls["i"] % len(refs)]
                calls["i"] += 1
                return step(state, None, vq_params, {**batch, **r}, k)
        samples = b  # preference pairs per step
        # policy forwards the concatenated [2b, L] chosen|rejected batch (3x);
        # frozen MAGViT encodes both pixel sets; chunked full-vocab logps over
        # the n labeled VQ positions per row; online mode adds the frozen
        # reference forward (1x)
        fwd = (2 * b * L * _backbone_flops_per_token(cfg.llm, L / 2)
               + 2 * cfg.llm.hidden_size * cfg.vocab_size * 2 * b * n)
        step_flops = ((3 + (1 if online_ref else 0)) * fwd
                      + 2 * b * _MAGVIT_ENC_FLOPS_PER_IMG)
    else:
        raise SystemExit(f"unknown train mode {mode!r} (pt2|sft|dpo)")

    state = init_train_state(params, tx)
    del params  # the state owns them; keep peak memory honest with donation
    keys = list(jax.random.split(key, steps + 1))

    synced, oom = True, False
    value = 0.0
    try:
        with _Watchdog(2400):
            t0 = time.perf_counter()
            state, metrics = run(state, keys[0])
            _ = float(metrics["loss"])
            print(f"[bench] train({mode}) compile+warmup: "
                  f"{time.perf_counter() - t0:.1f}s loss={float(metrics['loss']):.3f}",
                  file=sys.stderr)
        with _Watchdog(1200):
            t0 = time.perf_counter()
            for i in range(steps):
                state, metrics = run(state, keys[i + 1])
            _ = float(metrics["loss"])  # host fetch = the only reliable fence
            dt = time.perf_counter() - t0
        value = samples * steps / dt
        print(f"[bench] train({mode}): {dt / steps:.3f}s/step over {steps} steps",
              file=sys.stderr)
        tdir = os.environ.get("BENCH_TRACE_DIR")
        if tdir:  # bench_profile: trace ONE extra step after the timed run
            from unigen_tpu.utils import profiling
            with _Watchdog(600), profiling.trace(tdir):
                state, metrics = run(state, keys[0])
                _ = float(metrics["loss"])
    except TimeoutError:
        synced = False
        print("[bench] train phase wedged or over budget", file=sys.stderr)
    except Exception as e:  # surface OOM as data, not a stack trace
        msg = str(e)
        # compile-time HBM overflows arrive from the relay's compile helper as
        # an HTTP 500 whose detail ("Ran out of memory in memory space hbm")
        # only reaches the server-side stderr log — treat those as OOM too
        if ("RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()
                or "tpu_compile_helper" in msg):
            oom = True
            print(f"[bench] train({mode}) OOM at batch_scale={batch_scale}: "
                  f"{msg.splitlines()[0][:200]}", file=sys.stderr)
        else:
            raise
    unit = "pairs/sec/device" if mode == "dpo" else "samples/sec/device"
    sec_per_step = samples / value if value else None
    mfu = (step_flops / sec_per_step / 197e12
           if sec_per_step and not tiny else None)
    print(json.dumps({
        "metric": f"training step throughput [{mode}]"
                  + (" [tiny]" if tiny else ""),
        "value": round(value, 2), "unit": unit, "vs_baseline": None,
        "synced": synced, "oom": oom,
        **({"flops_per_step": step_flops, "flops_method": "analytic",
            "mfu_bf16": round(mfu, 4)} if mfu else {}),
        "config": {"mode": mode, "samples_per_step": samples, "steps": steps,
                   "batch_scale": batch_scale, "seq": int(L), "flash": flash,
                   "remat": True, "dtype": "bf16" if not tiny else "fp32",
                   **({"ref_mode": "online" if online_ref else "precomputed"}
                      if mode == "dpo" else {}),
                   **({"common_length": int(lm_sft)} if mode == "sft" else {})}}))


def bench_images(batch: int = 6, n_requests: int = 24, tiny: bool = False,
                 quant: str = "int8", arrival_s: float = 0.0):
    """ImageServingEngine (/v1/images microbatcher) throughput + latency.

    Two arrival modes per run: a burst of ``n_requests`` (steady-state img/s —
    comparable to the static headline bench at the same protocol) and, with
    ``arrival_s`` > 0, staggered submissions measuring client-observed
    time-to-first-image percentiles. Reference counterpart being beaten:
    one-prompt-at-a-time generation, evaluation/inference_geneval.py:190-285.
    """
    import jax

    from unigen_tpu import launch
    from unigen_tpu.serving.images import ImageServingEngine
    from unigen_tpu.utils.configuration import initialize_config

    _enable_compile_cache()
    overrides = ["model.quantization=int8"] if quant == "int8" else []
    timesteps = 50
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        yaml = "configs/tiny/smoke_pt2.yaml"
        batch, n_requests, timesteps = 2, 5, 4
        overrides = []
    else:
        yaml = "configs/unigen_1_5b/unigen_pt2.yaml"
    pipe = launch.build_pipeline(initialize_config(yaml, overrides))

    prompts = ["a photo of a red cube on a blue sphere",
               "two dogs playing in the snow",
               "an oil painting of a lighthouse at dusk",
               "a bowl of fruit on a wooden table"]

    eng = ImageServingEngine(pipe, batch=batch, timesteps=timesteps,
                             max_wait_s=0.25)
    try:
        with _Watchdog(2400):  # compile+warmup batch
            t0 = time.perf_counter()
            eng.submit(prompts[0]).result(timeout=2400)
            print(f"[bench] images compile+warmup: "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

        with _Watchdog(2400):  # burst: full microbatches back to back
            t0 = time.perf_counter()
            futs = [eng.submit(prompts[i % len(prompts)])
                    for i in range(n_requests)]
            for f in futs:
                f.result(timeout=2400)
            dt = time.perf_counter() - t0
        img_s = n_requests / dt
        print(f"[bench] images burst: {n_requests} imgs in {dt:.2f}s = "
              f"{img_s:.2f} img/s ({eng.batches_run} batches)", file=sys.stderr)

        lat = {}
        if arrival_s > 0:
            with _Watchdog(2400):
                futs = []
                for i in range(n_requests):
                    futs.append(eng.submit(prompts[i % len(prompts)]))
                    time.sleep(arrival_s)
                for f in futs:
                    f.result(timeout=2400)
            ttfi = sorted(f.done_t - f.submit_t for f in futs)
            lat = {"ttfi_p50_s": round(ttfi[len(ttfi) // 2], 3),
                   "ttfi_p99_s": round(ttfi[min(len(ttfi) - 1,
                                                int(len(ttfi) * 0.99))], 3)}
            print(f"[bench] images staggered (every {arrival_s}s): "
                  f"ttfi p50={lat['ttfi_p50_s']}s p99={lat['ttfi_p99_s']}s",
                  file=sys.stderr)
    finally:
        eng.close()

    print(json.dumps({
        "metric": "image serving engine img/sec/chip (microbatched t2i)"
                  + (" [tiny]" if tiny else ""),
        "value": round(img_s, 4), "unit": "images/sec/chip",
        "vs_baseline": None, "synced": True,
        "config": {"batch": batch, "n_requests": n_requests, "quant": quant,
                   "timesteps": timesteps, **lat}}))


def _make_live_shards(root: str, n_shards: int = 3, per_shard: int = 96,
                      res: int = 256) -> str:
    """Synthetic webdataset tar shards with REAL JPEG bytes (decode cost on the
    loader path is the point). Returns the brace pattern."""
    import io
    import tarfile

    from PIL import Image

    os.makedirs(root, exist_ok=True)
    pattern = os.path.join(root, "live-{000..%03d}.tar" % (n_shards - 1))
    done_mark = os.path.join(root, f".done_{n_shards}_{per_shard}_{res}")
    if os.path.exists(done_mark):
        return pattern
    rng = np.random.default_rng(7)
    for s in range(n_shards):
        path = os.path.join(root, f"live-{s:03d}.tar")
        with tarfile.open(path, "w") as tf:
            for i in range(per_shard):
                # smooth gradient + noise: JPEG entropy comparable to photos
                yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
                base = np.stack([yy, xx, (yy + xx) / 2], axis=-1) * 255
                img = np.clip(base + rng.normal(0, 25, base.shape), 0,
                              255).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="JPEG", quality=90)
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{s:03d}{i:05d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                meta = json.dumps({
                    "prompt": f"a photo of scene {s}-{i} with a gradient sky "
                              f"and {i % 7} objects on a table",
                    "short_caption": f"scene {s}-{i}"}).encode()
                info = tarfile.TarInfo(f"{s:03d}{i:05d}.json")
                info.size = len(meta)
                tf.addfile(info, io.BytesIO(meta))
    with open(done_mark, "w") as f:
        f.write("ok")
    return pattern


def _make_live_parquet(root: str, rows: int = 512) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(root, "lm.parquet")
    if not os.path.exists(path):
        rng = np.random.default_rng(9)
        words = ["model", "data", "tensor", "train", "loss", "batch", "token",
                 "image", "text", "the", "of", "and", "a", "learning"]
        texts = [" ".join(rng.choice(words, size=220)) for _ in range(rows)]
        pq.write_table(pa.table({"content": texts}), path)
    return path


def bench_train_live(steps: int = 24, tiny: bool = False):
    """PT2 pretraining throughput fed by the LIVE input pipeline: local tar
    shards -> data/text2image.py (C++ tar reader, JPEG decode, caption mixing)
    + parquet lm flow -> combined_loader -> UniPrompting template assembly ->
    the Trainer's one-deep pipelined loop. The companion number to
    `bench.py train pt2` (device-resident synthetic batches): the delta IS the
    input pipeline's cost. Reference counterpart: the CombinedLoader step,
    training/train.py:451-562."""
    import jax
    import jax.numpy as jnp

    if tiny:
        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    from unigen_tpu import launch
    from unigen_tpu.data.combined import combined_loader
    from unigen_tpu.data.lm_data import ParquetTextDataset
    from unigen_tpu.data.text2image import Text2ImageDataset
    from unigen_tpu.models import magvit, unigen
    from unigen_tpu.launch import TRAIN_SPECIAL_TOKENS
    from unigen_tpu.prompting import UniPrompting
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.train_step import TrainStepConfig
    from unigen_tpu.training.trainer import Trainer, TrainerConfig
    from unigen_tpu.utils.logging import MetricLogger

    root = "/tmp/unigen_live_bench"
    # loader resolution must match the VQ token grid the model expects
    # (UniGenConfig.tiny pairs with the 8px MagvitConfig.tiny -> 16 codes);
    # shard JPEGs stay photo-sized so decode cost is realistic either way
    res = 8 if tiny else 256
    shards = _make_live_shards(root, n_shards=2 if tiny else 3,
                               per_shard=12 if tiny else 96,
                               res=64 if tiny else 256)
    parquet = _make_live_parquet(root)

    tok = launch.FallbackTokenizer()
    if tiny:
        # compress the id space to bytes + specials so the tiny model's small
        # vocab covers every emitted id (Qwen-neighborhood ids would be OOV ->
        # NaN embeddings)
        tok.specials = {"<|endoftext|>": 256, "<|im_start|>": 257,
                        "<|im_end|>": 258, "<|vision_start|>": 259,
                        "<|vision_end|>": 260}
        tok.next_id = 261
        tok.pad_token_id, tok.eos_token_id = 256, 258
    # text budget 129 -> total rows 129 + n + 2, the same 387-token protocol as
    # the synthetic-batch pt2 bench (L is prompting-internal; see t2i_prompt)
    n_probe = 16 if tiny else 256
    prompting = UniPrompting(tok, special_tokens=TRAIN_SPECIAL_TOKENS,
                             max_seq_len=(129 if not tiny else 8) + n_probe + 2,
                             cond_dropout_prob=0.1, task_token_first=True)
    if tiny:
        cfg = unigen.UniGenConfig.tiny(w_und_encoder=True, mm_input_dim=32,
                                       text_vocab_len=len(tok))
        vq_cfg = magvit.MagvitConfig.tiny(z_channels=5, resolution=res)
        bt, bl, bm = 2, 1, 2
    else:
        cfg = unigen.UniGenConfig.for_qwen25_15b(
            w_und_encoder=True, mm_input_dim=1152)
        vq_cfg = magvit.MagvitConfig(dtype=jnp.bfloat16)
        bt, bl, bm = 8, 2, 6
    n = cfg.num_vq_tokens
    assert n == n_probe, f"num_vq_tokens {n} != assumed {n_probe}"

    flows = {
        "t2i_flow": Text2ImageDataset([shards], per_device_batch_size=bt,
                                      resolution=res, seed=1),
        "lm_flow": ParquetTextDataset([parquet], per_device_batch_size=bl,
                                      max_length_chars=512),
        "mmu_flow": Text2ImageDataset([shards], per_device_batch_size=bm,
                                      resolution=res, seed=2,
                                      add_caption_prompt=True),
    }

    t0 = time.perf_counter()
    params = jax.jit(lambda k: unigen.init(k, cfg))(jax.random.key(0))
    vq_params = jax.jit(lambda k: magvit.init(k, vq_cfg))(jax.random.key(1))
    vq_params = jax.tree_util.tree_map(lambda x: x.astype(vq_cfg.dtype),
                                       vq_params)
    jax.block_until_ready(params)
    print(f"[bench] train-live init: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    sp = prompting.sptids_dict
    tcfg = TrainStepConfig(
        batch_size_t2i=bt, batch_size_lm=bl, batch_size_mmu=bm,
        pad_id=prompting.pad_id, soi_id=sp["<|soi|>"], eoi_id=sp["<|eoi|>"],
        remat=not tiny)
    tx = make_optimizer(params, 5e-5, lambda s: 1.0)
    out_dir = os.path.join(root, "out")
    half = max(4, steps // 2)
    trainer = Trainer(cfg, vq_cfg, tcfg, TrainerConfig(
        output_dir=out_dir, max_train_steps=steps, log_every=half,
        save_every=0, resume_from_checkpoint=None),
        prompting, tx, params, vq_params,
        metric_logger=MetricLogger(out_dir))
    del params

    with _Watchdog(3000):
        t0 = time.perf_counter()
        trainer.train(combined_loader(flows))
        wall = time.perf_counter() - t0

    # steady-state window: the trainer's own last log_every window average
    # (excludes the first window's compile)
    value = None
    try:
        with open(os.path.join(out_dir, "metrics.jsonl")) as f:
            logs = [json.loads(l) for l in f if "samples_per_sec_per_device" in l]
        if logs:
            value = logs[-1]["samples_per_sec_per_device"]
            data_t, batch_t = logs[-1]["data_time"], logs[-1]["batch_time"]
            print(f"[bench] train-live steady window: data_time={data_t*1e3:.0f}ms "
                  f"batch_time={batch_t*1e3:.0f}ms", file=sys.stderr)
    except OSError:
        pass
    if value is None:
        value = (bt + bl + bm) * steps / wall
    print(json.dumps({
        "metric": "training step throughput [pt2, live input pipeline]"
                  + (" [tiny]" if tiny else ""),
        "value": round(float(value), 2), "unit": "samples/sec/device",
        "vs_baseline": None, "synced": True,
        "config": {"mode": "pt2-live", "samples_per_step": bt + bl + bm,
                   "steps": steps, "resolution": res,
                   "loader": "tar+jpeg+parquet", "dtype":
                   "bf16" if not tiny else "fp32"}}))


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "vqa":
        nums = [a for a in args[1:] if a.isdigit()]
        q = next((a for a in args if a in
                  ("int8", "int8kv", "int8+kv", "int4", "int4+kv")), None)
        lay = "skbd" if "kvseq" in args else ("bhsd" if "kvhead" in args
                                              else "bskd")
        bench_vqa(batch_size=int(nums[0]) if nums else 8, quant=q,
                  kv_layout=lay)
    elif args and args[0] == "tokenizer":
        bench_tokenizer(batch_size=int(args[1]) if len(args) > 1 else 16)
    elif args and args[0] == "lmms":
        nums = [int(a) for a in args[1:] if a.isdigit()]
        ch = next((int(a[5:]) for a in args
                   if a.startswith("chunk") and a[5:].isdigit()), None)
        sl = next((int(a[5:]) for a in args
                   if a.startswith("slots") and a[5:].isdigit()), 16)
        bench_lmms(batch_sizes=tuple(nums) or (8, 16, 32),
                   quant="bf16" if "bf16" in args else "int8",
                   tiny="tiny" in args, serving="static" not in args,
                   chunk=ch if ch else (8, 16, 32, 64), slots=sl)
    elif args and args[0] == "serve":
        nums = [a for a in args[1:] if a.isdigit()]
        q = next((a for a in args
                  if a in ("int8", "int8kv", "int8+kv", "int8+int4", "bf16")),
                 "int8+kv")
        spec = next((int(a[4:]) for a in args if a.startswith("spec")
                     and a[4:].isdigit()), 4 if "spec" in args else 0)
        bench_serve(slots=int(nums[0]) if nums else 32,
                    n_requests=int(nums[1]) if len(nums) > 1 else 96,
                    quant=None if q == "bf16" else ("int8+kv" if q == "int8kv" else q),
                    tiny="tiny" in args, speculate_k=spec)
    elif args and args[0] == "images":
        nums = [a for a in args[1:] if a.isdigit()]
        arr = next((float(a[3:]) for a in args if a.startswith("arr")), 0.5)
        bench_images(batch=int(nums[0]) if nums else 6,
                     tiny="tiny" in args,
                     quant="bf16" if "bf16" in args else "int8",
                     arrival_s=arr)
    elif args and args[0] == "profile":
        stage = next((a for a in args[1:] if a != "tiny"), "sampler")
        bench_profile(stage, tiny="tiny" in args)
    elif args and args[0] == "train":
        mode = next((a for a in args[1:] if a in ("pt2", "sft", "dpo")), "pt2")
        nums = [a for a in args[1:] if a.isdigit()]
        scale = next((float(a[1:]) for a in args if a.startswith("x")), 1.0)
        if "live" in args:
            bench_train_live(steps=int(nums[0]) if nums else 24,
                             tiny="tiny" in args)
        else:
            bench_train(mode, steps=int(nums[0]) if nums else 20,
                        tiny="tiny" in args, batch_scale=scale,
                        online_ref="online" in args, flash="flash" in args)
    else:
        # int8 W8A8 is the default (fastest exactness-gated config, BENCH.md);
        # `python bench.py bf16` benches the full-precision path. Batch 6 is
        # the measured throughput peak (batch sweep in BENCH.md: 4: 3.14,
        # 5: 3.13, 6: 3.18, 7: 3.08, 8: 2.94 img/s).
        quant = None if "bf16" in args else "int8"
        nums = [a for a in args if a.isdigit()]
        # bf16's documented/peak batch is 4 (BENCH.md)
        default_batch = 6 if quant else 4
        # default (driver) invocation co-measures bf16 at its peak batch so
        # BENCH_r*.json always records the honest (int8, bf16) pair;
        # `python bench.py int8only` skips the co-run for quick A/B timing
        also = 4 if (quant == "int8" and "int8only" not in args) else None
        main(batch_size=int(nums[0]) if nums else default_batch, quant=quant,
             also_bf16_batch=also)
