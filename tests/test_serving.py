"""Continuous-batching serving engine tests.

The engine must reproduce the batch decoder's outputs request-for-request while
slots are admitted/freed at staggered times — the property that makes
continuous batching a drop-in for static batching (the reference has no serving
runtime at all; SURVEY.md §2.7 note on the lmms batch-1 loop).
"""
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unigen_tpu.generation import generate_text, mmu_generate
from unigen_tpu.models import qwen2, unigen as U
from unigen_tpu.serving import ServingEngine
from unigen_tpu.serving.server import ServingHTTPServer


@pytest.fixture(scope="module")
def model():
    cfg = U.UniGenConfig.tiny()
    params = U.init(jax.random.key(0), cfg)
    return cfg, params


def _prompts(cfg, lens, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(3, cfg.text_vocab_len - 1, size=(n,)).tolist() for n in lens]


def _reference_greedy(cfg, params, ids, max_new, eot=None):
    """Single-request ground truth via the batch decoder."""
    arr = jnp.asarray(ids, jnp.int32)[None]
    out = generate_text(params, cfg, jax.random.key(1), arr,
                        jnp.asarray([len(ids)]), max_new_tokens=max_new,
                        temperature=0.0, eot_token=eot)
    toks = np.asarray(out)[0].tolist()
    if eot is not None and eot in toks:
        toks = toks[:toks.index(eot) + 1]
    return toks


# ---------------------------------------------------------------------------
# Per-row cache index (the device-side primitive)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("quantize", [False, True])
def test_per_row_cache_uniform_matches_scalar(model, quantize):
    """Per-row index with identical values must be bit-exact vs the scalar path."""
    cfg, params = model
    b, l0 = 3, 7
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(3, 100, size=(b, l0)), jnp.int32)
    emb = U.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(l0)[None], (b, l0))
    causal = jnp.broadcast_to(
        (jnp.arange(l0)[:, None] >= jnp.arange(l0)[None, :])[None, None],
        (b, 1, l0, l0))

    def run(per_row):
        cache = qwen2.init_kv_cache(cfg.llm, b, l0 + 4, quantize=quantize,
                                    per_row_index=per_row)
        h, cache = qwen2.forward(
            params["llm"], cfg.llm, inputs_embeds=emb, positions=pos,
            mask=jnp.concatenate([causal, jnp.zeros((b, 1, l0, 4), bool)], -1),
            cache=cache)
        outs = [h[:, -1]]
        tok = jnp.argmax(h[:, -1] @ params["llm"]["embed"]["weight"].T, -1)
        for t in range(3):
            e = U.embed_tokens(params, tok[:, None])
            h, cache = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=e,
                                     cache=cache)
            outs.append(h[:, 0])
            tok = jnp.argmax(h[:, 0] @ params["llm"]["embed"]["weight"].T, -1)
        return np.asarray(jnp.stack(outs)), np.asarray(cache.k), cache.index

    h_s, k_s, i_s = run(per_row=False)
    h_r, k_r, i_r = run(per_row=True)
    np.testing.assert_array_equal(h_s, h_r)
    np.testing.assert_array_equal(k_s, k_r)
    assert int(i_s) == int(np.asarray(i_r)[0])


def test_per_row_cache_staggered_positions(model):
    """Rows writing at different positions land in their own slots only."""
    cfg, params = model
    b = 4
    cache = qwen2.init_kv_cache(cfg.llm, b, 16, per_row_index=True)
    cache = cache._replace(index=jnp.asarray([0, 3, 7, 12], jnp.int32))
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(3, 100, size=(b, 1)), jnp.int32)
    emb = U.embed_tokens(params, tok)
    _, cache2 = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=emb,
                              cache=cache)
    k2 = np.asarray(cache2.k)
    np.testing.assert_array_equal(np.asarray(cache2.index), [1, 4, 8, 13])
    for row, idx in enumerate([0, 3, 7, 12]):
        assert np.abs(k2[:, row, idx]).sum() > 0          # written slot
        untouched = np.delete(k2[:, row], idx, axis=1)
        np.testing.assert_array_equal(untouched, 0)       # everything else clean


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

def test_engine_greedy_matches_batch_decoder(model):
    """Mixed prompt lengths across buckets, more requests than slots, all greedy —
    every request must reproduce the batch decoder's tokens exactly."""
    cfg, params = model
    prompts = _prompts(cfg, [5, 11, 3, 17, 9, 6, 14, 4, 12, 7])
    with ServingEngine(params, cfg, slots=3, max_len=64, buckets=(8, 16, 24),
                       chunk=4) as eng:
        futs = [eng.submit(p, max_new_tokens=10) for p in prompts]
        got = [f.result(timeout=120) for f in futs]
    for p, g in zip(prompts, got):
        assert g == _reference_greedy(cfg, params, p, 10), f"prompt len {len(p)}"
    assert eng.stats.requests_completed == len(prompts)


def test_engine_staggered_admission(model):
    """Requests submitted while others are mid-decode (the continuous part)."""
    cfg, params = model
    prompts = _prompts(cfg, [6, 10, 4, 13], seed=7)
    eng = ServingEngine(params, cfg, slots=2, max_len=64, buckets=(16,), chunk=2)
    try:
        f0 = eng.submit(prompts[0], max_new_tokens=12)
        f1 = eng.submit(prompts[1], max_new_tokens=5)
        f1.result(timeout=120)  # slot frees while f0 still decoding
        f2 = eng.submit(prompts[2], max_new_tokens=8)
        f3 = eng.submit(prompts[3], max_new_tokens=8)
        results = [f0.result(120), f1.result(120), f2.result(120), f3.result(120)]
    finally:
        eng.close()
    for p, g, n in zip(prompts, results, [12, 5, 8, 8]):
        assert g == _reference_greedy(cfg, params, p, n)


def test_engine_batched_admission_exact(model):
    """Round-4 batched admission: a same-bucket wave fills a whole group in
    one prefill dispatch; mixed buckets break groups at signature boundaries;
    non-power-of-two remainders exercise the padded (dropped) scatter rows.
    All outputs must equal the single-request reference."""
    cfg, params = model
    # lens 3..8 share bucket 16 -> groups up to the cap; lens 20.. share 32
    lens = [3, 5, 7, 4, 6, 20, 22, 8, 21]
    prompts = _prompts(cfg, lens, seed=17)
    with ServingEngine(params, cfg, slots=8, max_len=64, buckets=(16, 32),
                       chunk=4) as eng:
        futs = [eng.submit(p, max_new_tokens=6) for p in prompts]
        got = [f.result(timeout=180) for f in futs]
    for p, g in zip(prompts, got):
        assert g == _reference_greedy(cfg, params, p, 6)


@pytest.mark.parametrize("spec_k", [0, 2])
def test_engine_precompile_is_noop(model, spec_k):
    """``precompile=`` dispatches every admission-group variant (all-padding
    rows, scattered with mode="drop") and every chunk length on the fresh
    engine before serving starts — outputs must be identical to an engine
    without it, for both the ids and embeds signatures."""
    cfg, params = model
    prompts = _prompts(cfg, [3, 5, 7, 4, 20, 6, 21, 8], seed=23)

    def run(pre):
        with ServingEngine(params, cfg, slots=4, max_len=64, buckets=(16, 32),
                           chunk=(2, 4, 8), speculate_k=spec_k,
                           precompile=pre) as eng:
            futs = [eng.submit(p, max_new_tokens=6) for p in prompts]
            return [f.result(timeout=180) for f in futs]

    plain = run(())
    pre = run([("ids", 16), ("ids", 32)])
    assert pre == plain
    # second engine with identical program signatures: the process-level memo
    # skips the no-op dispatches (they cost real device time), outputs unchanged
    pre2 = run([("ids", 16), ("ids", 32)])
    assert pre2 == plain
    for p, g in zip(prompts, plain):
        assert g == _reference_greedy(cfg, params, p, 6)

    # embeds signature: precompiled engine still reproduces the reference
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(3, 100, size=(1, 12)), jnp.int32)
    emb = U.embed_tokens(params, ids)
    pos = np.arange(12)
    keep = pos < 9
    mask = ((pos[:, None] >= pos[None, :])[None, None]
            & keep[None, None, None, :] & keep[None, None, :, None])
    ref = mmu_generate(params, cfg, jax.random.key(0), input_ids=ids,
                       attention_mask=jnp.asarray(mask),
                       prompt_len=jnp.asarray([9]), max_new_tokens=7,
                       temperature=0.0)
    with ServingEngine(params, cfg, slots=2, max_len=32, buckets=(12,),
                       chunk=4, speculate_k=spec_k,
                       precompile=[("emb", 12, cfg.llm.hidden_size)]) as eng:
        got = eng.submit_embeds(np.asarray(emb), mask, 9,
                                max_new_tokens=7).result(120)
    assert got == np.asarray(ref)[0].tolist()


def test_engine_chunk_boundary_finish_and_readmission(model):
    """Pipelined-scheduler edge: budgets exactly at chunk boundaries, with a
    deep backlog forcing every slot to be freed and re-admitted while the
    NEXT chunk is already in flight (the dispatch-time snapshot must discard
    the freed slot's junk chunk and never attribute it to the re-admitted
    request)."""
    cfg, params = model
    chunk = 3
    budgets = [chunk, 2 * chunk, chunk, chunk, 2 * chunk, chunk]  # all on-boundary
    prompts = _prompts(cfg, [5, 7, 9, 4, 6, 8], seed=13)
    with ServingEngine(params, cfg, slots=2, max_len=64, buckets=(16,),
                       chunk=chunk) as eng:
        futs = [eng.submit(p, max_new_tokens=m)
                for p, m in zip(prompts, budgets)]
        got = [f.result(timeout=180) for f in futs]
    for p, g, m in zip(prompts, got, budgets):
        assert g == _reference_greedy(cfg, params, p, m)


def test_engine_eot_stops_and_frees_slot(model):
    """A request whose greedy decode hits eot stops there; the freed slot serves
    the queue. eot ground truth comes from the batch decoder."""
    cfg, params = model
    prompts = _prompts(cfg, [8, 8, 8, 8], seed=11)
    # pick the most-likely 2nd token of prompt 0 as "eot" so it actually fires
    ref = _reference_greedy(cfg, params, prompts[0], 6)
    eot = ref[1]
    with ServingEngine(params, cfg, slots=2, max_len=32, buckets=(8,),
                       chunk=3) as eng:
        futs = [eng.submit(p, max_new_tokens=6, eot_token=eot) for p in prompts]
        got = [f.result(timeout=120) for f in futs]
    for p, g in zip(prompts, got):
        assert g == _reference_greedy(cfg, params, p, 6, eot=eot)
    assert got[0] == ref[:2]  # stopped at the planted eot


def test_engine_per_request_temperature(model):
    """temp=0 rows stay deterministic while temp>0 rows share the batch."""
    cfg, params = model
    prompts = _prompts(cfg, [6, 6], seed=5)
    with ServingEngine(params, cfg, slots=2, max_len=32, buckets=(8,),
                       chunk=4, top_k=20) as eng:
        fg = eng.submit(prompts[0], max_new_tokens=8, temperature=0.0)
        fs = eng.submit(prompts[1], max_new_tokens=8, temperature=1.0)
        greedy, sampled = fg.result(120), fs.result(120)
    assert greedy == _reference_greedy(cfg, params, prompts[0], 8)
    assert all(0 <= t < cfg.vocab_size for t in sampled)


def test_engine_quantized_cache_smoke(model):
    cfg, params = model
    prompts = _prompts(cfg, [7, 12], seed=9)
    with ServingEngine(params, cfg, slots=2, max_len=32, buckets=(16,),
                       chunk=4, quantized_cache=True) as eng:
        got = [eng.submit(p, max_new_tokens=6).result(120) for p in prompts]
    for g in got:
        assert len(g) == 6 and all(0 <= t < cfg.vocab_size for t in g)


def test_engine_embeddings_path_matches_mmu_generate(model):
    """The understanding path: spliced embeddings + omni mask through the engine
    equals mmu_generate greedy."""
    cfg, params = model
    b, l = 1, 12
    plen = 9
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(3, 100, size=(b, l)), jnp.int32)
    emb = U.embed_tokens(params, ids)
    pos = np.arange(l)
    keep = pos < plen
    mask = ((pos[:, None] >= pos[None, :])[None, None]
            & keep[None, None, None, :] & keep[None, None, :, None])
    ref = mmu_generate(params, cfg, jax.random.key(0), input_ids=ids,
                       attention_mask=jnp.asarray(mask), prompt_len=jnp.asarray([plen]),
                       max_new_tokens=7, temperature=0.0)
    with ServingEngine(params, cfg, slots=2, max_len=32, buckets=(12,),
                       chunk=4) as eng:
        got = eng.submit_embeds(np.asarray(emb), mask, plen,
                                max_new_tokens=7).result(120)
        # device-resident embeds/mask (the prefill/decode-overlap path used by
        # pipeline.vqa_serving_inputs) must be token-identical to the numpy path
        got_dev = eng.submit_embeds(emb, jnp.asarray(mask), plen,
                                    max_new_tokens=7).result(120)
    assert got == np.asarray(ref)[0].tolist()
    assert got_dev == got


def test_engine_rejects_oversized(model):
    cfg, params = model
    with ServingEngine(params, cfg, slots=1, max_len=32, buckets=(8, 16)) as eng:
        with pytest.raises(ValueError, match="exceeds largest bucket"):
            eng.submit(list(range(3, 20)))
        with pytest.raises(ValueError, match="exceeds the"):
            eng.submit([3, 4, 5], max_new_tokens=100)


def test_engine_occupancy_accounting(model):
    cfg, params = model
    with ServingEngine(params, cfg, slots=4, max_len=32, buckets=(8,),
                       chunk=2) as eng:
        eng.submit(_prompts(cfg, [5])[0], max_new_tokens=6).result(120)
    s = eng.stats
    assert s.slot_steps >= s.busy_steps > 0
    assert 0 < s.occupancy <= 1.0


def test_engine_device_stop_long_chunk_no_overshoot(model):
    """Round-5 device-side stop: with a chunk far longer than any budget, each
    row must freeze ITSELF at its eot/budget (SlotState carries the stop
    condition through the scan) — outputs exact, and the whole wave costs a
    couple of host syncs instead of one per 8 tokens."""
    cfg, params = model
    prompts = _prompts(cfg, [5, 9, 7, 4], seed=31)
    budgets = [3, 6, 5, 4]
    ref0 = _reference_greedy(cfg, params, prompts[0], 6)
    eot = ref0[1]  # fires for prompt 0 at its 2nd token
    with ServingEngine(params, cfg, slots=4, max_len=64, buckets=(16,),
                       chunk=24) as eng:
        futs = [eng.submit(p, max_new_tokens=m, eot_token=eot)
                for p, m in zip(prompts, budgets)]
        got = [f.result(timeout=120) for f in futs]
    for p, g, m in zip(prompts, got, budgets):
        assert g == _reference_greedy(cfg, params, p, m, eot=eot)
    assert got[0] == ref0[:2]
    assert eng.stats.decode_chunks <= 3  # not ceil(6/chunk)*waves of tiny chunks


def test_engine_adaptive_chunks_exact(model):
    """Adaptive chunk schedule (chunk=(small..large)) must be token-identical
    to a fixed-chunk engine: mixed budgets, a backlog deeper than the slots
    (so freeing early matters), and eot stops landing mid-chunk."""
    cfg, params = model
    lens = [5, 8, 11, 4, 6, 9, 7, 5]
    budgets = [2, 17, 5, 9, 3, 12, 1, 7]
    prompts = _prompts(cfg, lens, seed=41)

    def run(chunk):
        with ServingEngine(params, cfg, slots=3, max_len=64, buckets=(16,),
                           chunk=chunk) as eng:
            futs = [eng.submit(p, max_new_tokens=m)
                    for p, m in zip(prompts, budgets)]
            return [f.result(timeout=180) for f in futs], eng.stats.decode_chunks

    fixed, chunks_fixed = run(2)
    adaptive, chunks_adaptive = run((2, 4, 8, 16))
    assert adaptive == fixed
    for p, g, m in zip(prompts, fixed, budgets):
        assert g == _reference_greedy(cfg, params, p, m)
    assert chunks_adaptive < chunks_fixed  # fewer host syncs is the point


def test_engine_adaptive_speculative_exact(model):
    """Adaptive chunks compose with speculative decoding: the per-row stop
    must fire INSIDE an accepted block (the first eot/budget position within
    the step's accepted tokens), matching the host-side break exactly."""
    cfg, params = model
    prompts = _prompts(cfg, [6, 10, 8], seed=51)
    budgets = [9, 4, 13]

    def run(chunk, spec):
        with ServingEngine(params, cfg, slots=2, max_len=96, buckets=(16,),
                           chunk=chunk, speculate_k=spec) as eng:
            futs = [eng.submit(p, max_new_tokens=m)
                    for p, m in zip(prompts, budgets)]
            return [f.result(timeout=180) for f in futs]

    assert run((2, 8), 3) == run(2, 0)


def test_engine_latency_marks(model):
    """GenerationResult records submit/first-token/done marks; ttft and itl
    are positive and ordered (the raw material for the BENCH latency table)."""
    cfg, params = model
    with ServingEngine(params, cfg, slots=2, max_len=32, buckets=(8,),
                       chunk=2) as eng:
        fut = eng.submit(_prompts(cfg, [5], seed=61)[0], max_new_tokens=6)
        fut.result(timeout=120)
    assert fut.ttft is not None and fut.ttft > 0
    assert fut.itl is not None and fut.itl >= 0
    assert fut.done_t >= fut.first_token_t >= fut.submit_t


def test_engine_cancel_deactivates_device_row(model):
    """A cancelled occupant's device row must be frozen (active cleared) so it
    stops mutating its cache row; the slot then serves the queue correctly."""
    from unigen_tpu.serving import engine as E
    cfg, params = model
    prompts = _prompts(cfg, [6, 7], seed=71)
    with ServingEngine(params, cfg, slots=1, max_len=64, buckets=(8,),
                       chunk=2) as eng:
        f0 = eng.submit(prompts[0], max_new_tokens=40)
        next(iter([f0]))  # let it start
        while f0.first_token_t is None:
            pass
        f0.cancel()
        f1 = eng.submit(prompts[1], max_new_tokens=5)
        got = f1.result(timeout=120)
        with pytest.raises(Exception):
            f0.result(timeout=120)
    assert got == _reference_greedy(cfg, params, prompts[1], 5)
    assert not bool(np.asarray(eng._state.active).any())


def test_engine_tensor_parallel_matches_unsharded(model, eight_devices):
    """Scale-out: Megatron TP-sharded params through the UNCHANGED engine
    programs — GSPMD inserts the collectives; the continuous-batching
    scheduler is oblivious. Near-total token agreement with the unsharded
    engine (sharded partial-sum order can flip borderline argmax draws)."""
    from unigen_tpu.parallel import make_mesh, partition_unigen, shard_params

    cfg, params = model
    prompts = _prompts(cfg, [5, 11, 8], seed=21)

    def serve(p):
        with ServingEngine(p, cfg, slots=2, max_len=48, buckets=(16,),
                           chunk=4) as eng:
            futs = [eng.submit(x, max_new_tokens=8) for x in prompts]
            return [f.result(timeout=240) for f in futs]

    ref = serve(params)
    mesh = make_mesh(data=4, fsdp=1, model=2)
    params_tp = shard_params(params, partition_unigen(params), mesh)
    got = serve(params_tp)
    agree = np.mean([np.mean(np.array(r) == np.array(g))
                     for r, g in zip(ref, got)])
    assert agree >= 0.95, f"TP engine agreement {agree:.2f}"


def test_draft_lookup_unit():
    """Device prompt-lookup drafting: proposes the tokens that followed the
    most recent earlier occurrence of the current bigram, respects ctx_start
    and the valid-region bound, zeros when no match exists."""
    from unigen_tpu.serving.engine import _draft_lookup
    #          0  1  2  3  4  5  6  7  8  9
    ctx = jnp.asarray([[5, 7, 1, 2, 3, 9, 5, 7, 0, 0],
                       [4, 4, 4, 4, 4, 4, 4, 4, 0, 0],
                       [1, 2, 3, 4, 5, 6, 7, 8, 0, 0]], jnp.int32)
    ctx_start = jnp.asarray([0, 0, 6], jnp.int32)
    idx = jnp.asarray([8, 8, 8], jnp.int32)
    tok = jnp.asarray([7, 4, 8], jnp.int32)   # next input token per row
    prop = np.asarray(_draft_lookup(ctx, ctx_start, idx, tok, 3))
    # row 0: bigram (ctx[7]=7? no: tprev=ctx[idx-1]=ctx[7]=7, tok=7) ->
    # matches need ctx[j]=7 & ctx[j+1]=7: none -> zeros
    assert prop[0].tolist() == [0, 0, 0]
    # row 1: tprev=4, tok=4 -> last valid j with j+1 < idx-1 is j=5;
    # proposal = ctx[7:10] = [4, 0, 0]
    assert prop[1].tolist() == [4, 0, 0]
    # row 2: tprev=ctx[7]=8, tok=8; the only (8,*) is at j=7 (excluded);
    # ctx_start=6 also hides the early region -> zeros
    assert prop[2].tolist() == [0, 0, 0]


def test_draft_lookup_proposes_continuation():
    from unigen_tpu.serving.engine import _draft_lookup
    # history: ... 1 2 3 4 ... then current tail ends with 1, next tok 2
    ctx = jnp.asarray([[9, 1, 2, 3, 4, 5, 8, 1, 0, 0, 0, 0]], jnp.int32)
    prop = np.asarray(_draft_lookup(ctx, jnp.asarray([0]),
                                    jnp.asarray([8], jnp.int32),
                                    jnp.asarray([2], jnp.int32), 3))
    assert prop[0].tolist() == [3, 4, 5]


@pytest.mark.parametrize("spec_k", [2, 4])
def test_engine_speculative_greedy_exact(model, spec_k):
    """speculate_k>0 must emit token-identical greedy streams to the plain
    engine/reference decoder, across staggered admissions and eot stops."""
    cfg, params = model
    prompts = _prompts(cfg, [6, 11, 4, 9], seed=31)
    budgets = [7, 5, 9, 6]
    with ServingEngine(params, cfg, slots=2, max_len=48, buckets=(16,),
                       chunk=3, speculate_k=spec_k) as eng:
        futs = [eng.submit(p, max_new_tokens=b)
                for p, b in zip(prompts, budgets)]
        got = [f.result(timeout=300) for f in futs]
    for p, b, g in zip(prompts, budgets, got):
        assert g == _reference_greedy(cfg, params, p, b)


def test_engine_speculative_accepts_on_looping_model(model):
    """A tiny random model loops quickly under greedy decode; once the loop is
    in the context buffer the lookup draft predicts it and the engine must
    accept >1 token per occupied step on average (the speedup mechanism),
    while remaining exact."""
    cfg, params = model
    prompt = _prompts(cfg, [5], seed=3)[0]
    with ServingEngine(params, cfg, slots=1, max_len=96, buckets=(16,),
                       chunk=4, speculate_k=4) as eng:
        got = eng.submit(prompt, max_new_tokens=64).result(timeout=600)
        rate = eng.stats.tokens_generated / max(eng.stats.busy_steps, 1)
    assert got == _reference_greedy(cfg, params, prompt, 64)
    assert rate > 1.05, f"no speculative acceptance (rate={rate:.2f})"


@pytest.mark.slow
def test_engine_speculative_fuzz_exactness(model):
    """Randomized exactness sweep over (chunk, k, prompt lengths, budgets,
    mixed temperatures): greedy rows must match the reference decoder exactly
    and sampled rows must match the plain engine seed-for-seed, for every
    drawn configuration."""
    cfg, params = model
    rng = np.random.default_rng(101)
    for trial in range(5):
        chunk = int(rng.integers(1, 5))
        k = int(rng.integers(1, 5))
        lens = rng.integers(3, 14, size=4).tolist()
        budgets = rng.integers(1, 12, size=4).tolist()
        temps = [0.0, 0.0, 0.7, 0.0]
        prompts = _prompts(cfg, lens, seed=200 + trial)

        def run(spec):
            with ServingEngine(params, cfg, slots=2, max_len=64,
                               buckets=(16,), chunk=chunk, seed=5,
                               speculate_k=spec) as eng:
                futs = [eng.submit(p, max_new_tokens=b, temperature=t)
                        for p, b, t in zip(prompts, budgets, temps)]
                return [f.result(timeout=300) for f in futs]

        plain, spec = run(0), run(k)
        assert plain == spec, f"trial {trial} (chunk={chunk}, k={k})"
        for p, b, t, g in zip(prompts, budgets, temps, spec):
            if t == 0.0:
                assert g == _reference_greedy(cfg, params, p, b)


def test_engine_speculative_sampled_matches_plain(model):
    """Sampled rows pin acceptance to 1 and draw (seed, position)-indexed
    keys: same request seed => identical sampled tokens with and without
    speculation."""
    cfg, params = model
    prompts = _prompts(cfg, [6, 8], seed=17)

    def run(spec_k):
        with ServingEngine(params, cfg, slots=2, max_len=48, buckets=(16,),
                           chunk=3, seed=11, speculate_k=spec_k) as eng:
            futs = [eng.submit(p, max_new_tokens=6, temperature=0.8)
                    for p in prompts]
            return [f.result(timeout=300) for f in futs]

    assert run(0) == run(3)


def test_engine_speculative_with_quantized_cache(model):
    """Speculation composes with the int8 KV cache: per-position quantization
    scales make the (k+1)-wide verify write bit-identical to the plain int8
    path's per-token writes, so accepted streams must match exactly."""
    cfg, params = model
    prompts = _prompts(cfg, [6, 10], seed=61)

    def run(spec_k):
        with ServingEngine(params, cfg, slots=2, max_len=64, buckets=(16,),
                           chunk=3, quantized_cache=True,
                           speculate_k=spec_k) as eng:
            futs = [eng.submit(p, max_new_tokens=8) for p in prompts]
            return [f.result(timeout=300) for f in futs]

    assert run(0) == run(4)


@pytest.mark.parametrize("quantize", [False, True])
@pytest.mark.parametrize("layout", ["skbd", "bhsd"])
def test_engine_kv_layout_matches(model, quantize, layout):
    """cfg.llm.kv_layout changes the KV-cache storage order; the engine's
    admission installs, per-row scatter writes, speculation, and decode must
    all be layout-invariant: identical token streams, every layout, greedy
    and sampled."""
    import dataclasses
    cfg, params = model
    cfg_sm = dataclasses.replace(cfg, llm=dataclasses.replace(
        cfg.llm, kv_layout=layout))
    prompts = _prompts(cfg, [5, 11, 3, 9, 6], seed=41)

    def run(c):
        with ServingEngine(params, c, slots=3, max_len=64, buckets=(16,),
                           chunk=3, seed=5, quantized_cache=quantize,
                           speculate_k=3) as eng:
            futs = [eng.submit(p, max_new_tokens=8,
                               temperature=0.0 if i % 2 else 0.8, seed=100 + i)
                    for i, p in enumerate(prompts)]
            return [f.result(timeout=300) for f in futs]

    assert run(cfg) == run(cfg_sm)


def test_engine_sampled_schedule_independent(model):
    """A sampled request with an explicit seed yields the SAME tokens no
    matter how it is scheduled: different slot counts, chunk sizes, queue
    positions, and speculation — per-(request, position) RNG keys decouple
    sampling from batching entirely."""
    cfg, params = model
    prompt = _prompts(cfg, [7], seed=23)[0]
    noise = _prompts(cfg, [5, 9], seed=24)

    def run(slots, chunk, spec_k, lead):
        with ServingEngine(params, cfg, slots=slots, max_len=48,
                           buckets=(16,), chunk=chunk, seed=99,
                           speculate_k=spec_k) as eng:
            lead_futs = [eng.submit(n, max_new_tokens=4) for n in noise[:lead]]
            fut = eng.submit(prompt, max_new_tokens=8, temperature=0.9,
                             seed=1234)
            [f.result(timeout=300) for f in lead_futs]
            return fut.result(timeout=300)

    base = run(slots=3, chunk=2, spec_k=0, lead=0)
    assert base == run(slots=1, chunk=5, spec_k=0, lead=2)   # queued behind
    assert base == run(slots=2, chunk=3, spec_k=3, lead=1)   # speculative


def test_engine_concurrent_submitters_exact(model):
    """Stress: 4 threads × 4 requests each race submissions while consuming a
    mix of stream() and result(); every output must still equal the
    single-request reference decoder exactly (admission order is arbitrary,
    results must not be)."""
    cfg, params = model
    rng = np.random.default_rng(7)
    lens = rng.integers(4, 13, size=16).tolist()
    prompts = _prompts(cfg, lens, seed=7)
    budgets = rng.integers(2, 7, size=16).tolist()
    got: dict = {}
    err: list = []
    with ServingEngine(params, cfg, slots=3, max_len=32, buckets=(16,),
                       chunk=3) as eng:
        def worker(k):
            try:
                futs = [(i, eng.submit(prompts[i], max_new_tokens=budgets[i]))
                        for i in range(k, 16, 4)]
                for i, f in futs:
                    if i % 2:
                        got[i] = list(f.stream(timeout=300))
                    else:
                        got[i] = f.result(timeout=300)
            except BaseException as e:  # surface failures to the main thread
                err.append(e)
        threads = [threading.Thread(target=worker, args=(k,)) for k in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
    assert not err, err
    assert len(got) == 16
    for i in range(16):
        assert got[i] == _reference_greedy(cfg, params, prompts[i], budgets[i])


@pytest.mark.parametrize("spec_k", [0, 3])
@pytest.mark.parametrize("layout", ["bskd", "bhsd"])
def test_engine_shared_prefix_matches_full_prompt(model, spec_k, layout):
    """A shared-prefix engine (prefix KV computed once, suffix-only admission
    prefill) must emit the same tokens as sending prefix+suffix as the full
    prompt — with and without speculation, across staggered admissions, in
    both KV-cache layouts (the prefix broadcast + splice is layout-aware)."""
    import dataclasses
    cfg, params = model
    if layout != "bskd":
        cfg = dataclasses.replace(cfg, llm=dataclasses.replace(
            cfg.llm, kv_layout=layout))
    rng = np.random.default_rng(53)
    prefix = rng.integers(3, cfg.text_vocab_len - 1, size=9).tolist()
    suffixes = _prompts(cfg, [5, 11, 7], seed=54)
    budgets = [6, 4, 7]
    with ServingEngine(params, cfg, slots=2, max_len=64, buckets=(16,),
                       chunk=3, speculate_k=spec_k,
                       prefix_ids=prefix) as eng:
        assert eng.prefix_len == 9
        futs = [eng.submit(s, max_new_tokens=b)
                for s, b in zip(suffixes, budgets)]
        got = [f.result(timeout=300) for f in futs]
    for s, b, g in zip(suffixes, budgets, got):
        assert g == _reference_greedy(cfg, params, prefix + s, b)


def test_engine_shared_prefix_rejects_embeds_and_overflow(model):
    cfg, params = model
    prefix = list(range(3, 12))
    with ServingEngine(params, cfg, slots=1, max_len=32, buckets=(16,),
                       prefix_ids=prefix) as eng:
        with pytest.raises(ValueError):  # 9 + 16 + 10 > 32
            eng.submit([5, 6], max_new_tokens=10)
        with pytest.raises(ValueError):
            eng.submit_embeds(np.zeros((1, 16, 8), np.float32),
                              np.ones((1, 1, 16, 16), bool), 4,
                              max_new_tokens=2)


def test_engine_cancellation_frees_slot(model):
    """Cancelling an in-flight request frees its slot for the queue, and
    cancelling a queued request skips admission entirely; both futures fail
    with CancelledError while unrelated requests complete exactly."""
    from concurrent.futures import CancelledError
    cfg, params = model
    prompts = _prompts(cfg, [6, 7, 8], seed=41)
    with ServingEngine(params, cfg, slots=1, max_len=96, buckets=(16,),
                       chunk=2) as eng:
        running = eng.submit(prompts[0], max_new_tokens=64)   # occupies the slot
        queued = eng.submit(prompts[1], max_new_tokens=64)
        survivor = eng.submit(prompts[2], max_new_tokens=5)
        running.cancel()
        queued.cancel()
        got = survivor.result(timeout=300)
        with pytest.raises(CancelledError):
            running.result(timeout=60)
        with pytest.raises(CancelledError):
            queued.result(timeout=60)
    assert got == _reference_greedy(cfg, params, prompts[2], 5)


def test_stream_timeout_raises_timeout_error():
    """stream(timeout=...) must raise TimeoutError (like result()), not leak
    queue.Empty past the HTTP server's 504 handler."""
    from unigen_tpu.serving.engine import GenerationResult
    fut = GenerationResult(0)
    with pytest.raises(TimeoutError):
        next(fut.stream(timeout=0.01))


def test_engine_stream_matches_result(model):
    """stream() yields exactly the tokens result() returns, incrementally."""
    cfg, params = model
    prompts = _prompts(cfg, [6, 9], seed=13)
    with ServingEngine(params, cfg, slots=2, max_len=32, buckets=(16,),
                       chunk=3) as eng:
        futs = [eng.submit(p, max_new_tokens=7) for p in prompts]
        streamed = [list(f.stream(timeout=120)) for f in futs]
        results = [f.result(timeout=120) for f in futs]
    assert streamed == results
    for p, g in zip(prompts, results):
        assert g == _reference_greedy(cfg, params, p, 7)


# ---------------------------------------------------------------------------
# HTTP server
# ---------------------------------------------------------------------------

def test_healthz_reports_dead_engine(model):
    """/healthz flips to 503 'dead' once the engine scheduler has exited, so
    load balancers stop routing to a broken replica."""
    cfg, params = model
    eng = ServingEngine(params, cfg, slots=2, max_len=32, buckets=(16,))
    with ServingHTTPServer(eng) as srv:
        url = f"http://{srv.host}:{srv.port}/healthz"
        out = json.loads(urllib.request.urlopen(url, timeout=60).read())
        assert out["status"] == "ok"
        eng.close()
        try:
            urllib.request.urlopen(url, timeout=60)
            assert False, "expected HTTP 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert json.loads(e.read())["status"] == "dead"


class _Tok:
    """Trivial reversible-enough tokenizer for HTTP-route tests."""

    def __init__(self, vocab):
        self.v = vocab

    def encode(self, text):
        return [3 + (ord(c) % (self.v - 4)) for c in text]

    def decode(self, ids):
        return ",".join(str(int(i)) for i in ids)


def test_http_openai_routes(model):
    """/v1/completions and /v1/chat/completions: OpenAI response shapes,
    usage accounting, stop-string trimming, null-tolerant max_tokens,
    content-parts messages, greedy tokens matching the reference decoder."""
    cfg, params = model
    tok = _Tok(cfg.text_vocab_len)
    with ServingEngine(params, cfg, slots=2, max_len=112,
                       buckets=(16, 96)) as eng:
        with ServingHTTPServer(eng, tokenizer=tok,
                               default_max_new_tokens=5) as srv:
            url = f"http://{srv.host}:{srv.port}"

            def post(route, body):
                req = urllib.request.Request(
                    url + route, data=json.dumps(body).encode(),
                    headers={"Content-Type": "application/json"})
                return json.loads(urllib.request.urlopen(req, timeout=120).read())

            prompt = "hello tpu"
            ids = tok.encode(prompt)
            ref = _reference_greedy(cfg, params, ids, 5)
            out = post("/v1/completions", {"prompt": prompt, "max_tokens": 5})
            assert out["object"] == "text_completion"
            assert out["choices"][0]["text"] == tok.decode(ref)
            assert out["choices"][0]["finish_reason"] == "length"
            assert out["usage"] == {"prompt_tokens": len(ids),
                                    "completion_tokens": 5, "total_tokens": len(ids) + 5}

            # stop-string trimming flips finish_reason to "stop"
            stop = "," + str(ref[2])
            out = post("/v1/completions", {"prompt": prompt, "max_tokens": 5,
                                           "stop": stop})
            assert out["choices"][0]["finish_reason"] == "stop"
            assert out["choices"][0]["text"] == tok.decode(ref).split(stop)[0]

            # OpenAI clients send explicit nulls: fall back to the default
            out = post("/v1/completions", {"prompt": prompt, "max_tokens": None})
            assert out["usage"]["completion_tokens"] == 5

            # chat: ChatML assembly, assistant message shape
            msgs = [{"role": "system", "content": "be brief"},
                    {"role": "user", "content": "hi"}]
            templ = ("<|im_start|>system\nbe brief<|im_end|>\n"
                     "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n")
            ref_c = _reference_greedy(cfg, params, tok.encode(templ), 4)
            out = post("/v1/chat/completions", {"messages": msgs, "max_tokens": 4})
            assert out["object"] == "chat.completion"
            assert out["choices"][0]["message"] == {
                "role": "assistant", "content": tok.decode(ref_c)}

            # content-parts form is equivalent to plain string content
            msgs_p = [{"role": "system", "content": "be brief"},
                      {"role": "user",
                       "content": [{"type": "text", "text": "hi"}]}]
            out_p = post("/v1/chat/completions",
                         {"messages": msgs_p, "max_tokens": 4})
            assert out_p["choices"] == out["choices"]

            # raw flag honored when the tokenizer exposes encode_raw
            tok.encode_raw = lambda t: tok.encode(t)[:3]
            out = post("/v1/generate", {"prompt": prompt, "raw": True,
                                        "max_new_tokens": 2})
            assert out["tokens"] == _reference_greedy(cfg, params, ids[:3], 2)
            del tok.encode_raw

            # unsupported / malformed -> 400
            for body, route in [({"prompt": "x", "stream": True}, "/v1/completions"),
                                ({"messages": []}, "/v1/chat/completions"),
                                ({"prompt": "", "max_tokens": 3}, "/v1/completions"),
                                ({"prompt": "x", "n": 2}, "/v1/completions")]:
                req = urllib.request.Request(
                    url + route, data=json.dumps(body).encode(),
                    headers={"Content-Type": "application/json"})
                try:
                    urllib.request.urlopen(req, timeout=60)
                    assert False, "expected HTTP 400"
                except urllib.error.HTTPError as e:
                    assert e.code == 400
    eng.close()


def test_http_server_end_to_end(model):
    cfg, params = model
    prompts = _prompts(cfg, [5, 9, 12], seed=4)
    eng = ServingEngine(params, cfg, slots=2, max_len=48, buckets=(16,), chunk=4)
    with ServingHTTPServer(eng, port=0) as srv:
        url = f"http://{srv.host}:{srv.port}"

        def post(payload):
            req = urllib.request.Request(
                url + "/v1/generate", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        # concurrent clients
        results = [None] * len(prompts)

        def client(i):
            results[i] = post({"prompt_ids": prompts[i], "max_new_tokens": 6})

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(prompts))]
        [t.start() for t in threads]
        [t.join(timeout=120) for t in threads]

        for p, r in zip(prompts, results):
            assert r["tokens"] == _reference_greedy(cfg, params, p, 6)

        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["stats"]["requests_completed"] == len(prompts)

        # malformed request -> 400
        try:
            post({"nonsense": 1})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # SSE streaming: per-token events then a final done event
        sreq = urllib.request.Request(
            url + "/v1/generate",
            data=json.dumps({"prompt_ids": prompts[0], "max_new_tokens": 6,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(sreq, timeout=120) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            events = [json.loads(line[len(b"data: "):])
                      for line in r.read().splitlines()
                      if line.startswith(b"data: ")]
        assert events[-1]["done"] is True
        streamed = [e["token"] for e in events[:-1]]
        assert streamed == events[-1]["tokens"]
        assert streamed == _reference_greedy(cfg, params, prompts[0], 6)
    eng.close()
