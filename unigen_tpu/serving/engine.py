"""Continuous-batching serving engine (TPU-native).

The reference ships no serving runtime: its lmms-eval adapter loops requests
one at a time (reference: third_party/lmms/models/unigen.py:259-430), and this
repo's batched adapter (evaluation/lmms_adapter.py) runs *static* batches — a
batch finishes only when its slowest request does. This engine decodes a fixed
set of B slots every step and admits a queued request into a slot the moment
one frees up (the vLLM-style continuous-batching discipline), built the TPU
way:

- every device program has a STATIC shape: ONE decode program ([B] slots x
  `chunk` tokens inside a jitted ``lax.scan``) and one prefill program per
  bucketed prompt length — nothing retraces at runtime;
- each slot row of the shared KV cache holds one request starting at position
  0; the cache carries a per-row write index (models/qwen2.py::KVCache) so
  every slot ages independently — the write is a vmapped
  ``dynamic_update_slice`` that XLA lowers to an in-place scatter in the layer
  scan carry;
- admission prefills the prompt into a fresh length-L temp cache, then copies
  the [layers, 1, L, KVH, Dh] block into the slot's row with one
  ``dynamic_update_slice``. Decode tokens then overwrite the row's pad slots
  (the row index starts at the *unpadded* prompt length), so the cache stays
  compact and no pad position is ever attended;
- the host scheduler syncs once per `chunk` decoded tokens: it harvests
  tokens, resolves finished requests, and admits new ones. Per-request
  temperature rides as a [B] array; ``active`` masks freed slots so they are
  frozen (their index stops advancing) until reused.

Throughput rationale: decode is HBM-bound and amortizes the weight read over
*occupied* slots (BENCH.md's serving table). Static batching leaves slots idle
for the tail of every batch; continuous batching keeps occupancy at ~100% for
any request-length mix, so the measured batch-B decode rate becomes the
steady-state service rate.
"""
from __future__ import annotations

import dataclasses
import itertools
import os
import queue
import sys
import threading
from concurrent.futures import CancelledError
from functools import partial
import time
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from ..models.unigen import UniGenConfig, embed_tokens
from ..ops import sampling as S

Array = jax.Array

# per-call admit/harvest timing to stderr (perf forensics only)
_DEBUG = os.environ.get("UNIGEN_ENGINE_DEBUG", "") == "1"

# process-level memo of already-precompiled engine program signatures
# (ServingEngine._precompile) — the no-op warmup dispatches execute real
# device work, needed once per (program-signature, process), not per engine
_PRECOMPILED_KEYS: set = set()


class SlotState(NamedTuple):
    """Device-resident per-slot decode state ([slots]-shaped leaves).

    Living on device lets the decode chunk STOP each row itself — at its eot
    token or its token budget — so chunks can run tens of steps between host
    syncs without overshooting any request (the round-4 engine synced every 8
    tokens because only the host could see eot/budget; that sync was the
    dominant serving cost, BENCH.md). Admission scatters a group's values in;
    decode carries (last_tok, active, emitted) through its scan and freezes a
    row the step its stop condition fires.
    """
    last_tok: Array   # i32 — next input token (sampled last step / at admit)
    active: Array     # bool — row is decoding; cleared ON DEVICE at eot/budget
    emitted: Array    # i32 — tokens emitted for the current occupant
    budget: Array     # i32 — the occupant's max_new_tokens
    eot: Array        # i32 — stop token id, -1 when none
    temp: Array       # f32 — sampling temperature
    seed: Array       # i32 — per-request RNG seed (see _row_keys)


def init_slot_state(slots: int) -> SlotState:
    return SlotState(last_tok=jnp.zeros((slots,), jnp.int32),
                     active=jnp.zeros((slots,), bool),
                     emitted=jnp.zeros((slots,), jnp.int32),
                     budget=jnp.zeros((slots,), jnp.int32),
                     eot=jnp.full((slots,), -1, jnp.int32),
                     temp=jnp.zeros((slots,), jnp.float32),
                     seed=jnp.zeros((slots,), jnp.int32))


# ---------------------------------------------------------------------------
# Device programs
# ---------------------------------------------------------------------------

def _row_keys(row_seed: Array, pos: Array) -> Array:
    """Per-(request, token-position) PRNG keys.

    Keying each sampled token by (request seed, its sequence position) makes
    sampled streams deterministic PER REQUEST — independent of batching,
    slot assignment, admission timing, chunk boundaries, and speculation
    (which all reshuffle a global key's split order). Same request seed =>
    same tokens, always.
    """

    def one(s, p):
        return jax.random.fold_in(jax.random.fold_in(jax.random.key(0), s), p)

    return jax.vmap(one)(row_seed, pos)


def _sample_rows(keys: Array, logits: Array, temp: Array, top_k: Optional[int]) -> Array:
    """Per-row greedy (temp==0) or temperature/top-k sampling.

    Matches generation/decode.py::_sample_step semantics per row, but the
    temperature rides as a [B] array and each row draws from its own
    position-indexed key (``_row_keys``), so one program serves mixed request
    params with schedule-independent randomness.
    """
    greedy = jnp.argmax(logits, axis=-1)
    lg = logits / jnp.maximum(temp, 1e-6)[:, None]
    if top_k is not None:
        kth = jax.lax.top_k(lg, min(top_k, lg.shape[-1]))[0][..., -1:]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    sampled = jax.vmap(S.sample_categorical)(keys, jax.nn.softmax(lg, axis=-1))
    return jnp.where(temp > 0, sampled, greedy).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "steps", "top_k"), donate_argnums=(1, 2))
def _decode_chunk(params, cache: qwen2.KVCache, state: SlotState, *,
                  cfg: UniGenConfig, steps: int, top_k: Optional[int]
                  ) -> Tuple[qwen2.KVCache, SlotState, Array]:
    """`steps` decode steps over all B slots; returns (cache, state, toks[B, steps]).

    Each step emits its INPUT token (the one sampled last step / at admission),
    not its output — so the admit-time first token flows out through the next
    chunk and the host never blocks on an admission fetch (one device→host
    sync per chunk total; over the TPU relay a per-admit fetch costs a ~30ms
    round trip, BENCH.md). A row stops ITSELF the step it emits its eot token
    or its budget-th token (mirroring the host harvest's break condition
    exactly), so arbitrarily long chunks never overshoot a request. Frozen
    rows do not advance their index and their sampled token is pinned to 0
    until an admit resets them. Sampling keys come from (seed, token
    position) — see ``_row_keys``.
    """

    def step(carry, _):
        cache_c, tok, act, emitted = carry
        emb = embed_tokens(params, tok[:, None])
        hidden, cache_n = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=emb,
                                        cache=cache_c)
        lg = qwen2.logits(params["llm"], cfg.llm, hidden[:, 0]).astype(jnp.float32)
        keys = _row_keys(state.seed, cache_c.index + 1)
        emitted_n = emitted + act.astype(jnp.int32)
        stop = act & ((tok == state.eot) | (emitted_n >= state.budget))
        act_n = act & ~stop
        nxt = jnp.where(act_n, _sample_rows(keys, lg, state.temp, top_k), 0)
        cache_n = cache_n._replace(
            index=jnp.where(act, cache_n.index, cache_c.index))
        return (cache_n, nxt, act_n, emitted_n), tok

    (cache, last_tok, active, emitted), toks = jax.lax.scan(
        step, (cache, state.last_tok, state.active, state.emitted), None,
        length=steps)
    state = state._replace(last_tok=last_tok, active=active, emitted=emitted)
    return cache, state, jnp.moveaxis(toks, 0, 1)


def _state_install(state: SlotState, slots_idx, first, temp, row_seed, budget,
                   eot) -> SlotState:
    """Scatter a group's per-slot decode state (padding rows dropped)."""
    return SlotState(
        last_tok=state.last_tok.at[slots_idx].set(first, mode="drop"),
        active=state.active.at[slots_idx].set(True, mode="drop"),
        emitted=state.emitted.at[slots_idx].set(0, mode="drop"),
        budget=state.budget.at[slots_idx].set(budget, mode="drop"),
        eot=state.eot.at[slots_idx].set(eot, mode="drop"),
        temp=state.temp.at[slots_idx].set(temp, mode="drop"),
        seed=state.seed.at[slots_idx].set(row_seed, mode="drop"))


@jax.jit
def _state_deactivate(state: SlotState, slot: Array) -> SlotState:
    """Clear a row's device-side active flag (cancelled request: the host
    frees the slot but the row would otherwise keep decoding junk — and
    advancing its cache index — until the next admission reuses it)."""
    return state._replace(active=state.active.at[slot].set(False))


def _admit_core(params, cfg: UniGenConfig, cache: qwen2.KVCache, state: SlotState,
                slots_idx, inputs_embeds, attn_mask, prompt_len, temp,
                row_seed, budget, eot, top_k):
    """Prefill K requests in ONE batched forward and install each into its
    slot row. ``slots_idx`` [K] int32; group-padding rows carry slot index
    == num_slots (out of bounds) and are dropped by the scatter installs
    (``mode="drop"``), so a power-of-two group of mostly-duplicate rows
    costs one program and touches only the real slots."""
    k_req, l = inputs_embeds.shape[:2]
    tmp = qwen2.init_kv_cache(cfg.llm, k_req, l, quantize=cache.quantized)
    positions = jnp.minimum(jnp.arange(l)[None, :], prompt_len[:, None] - 1)
    hidden, tmp = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=inputs_embeds,
                                mask=attn_mask, positions=positions, cache=tmp)
    last_hidden = jnp.take_along_axis(
        hidden, jnp.broadcast_to((prompt_len - 1)[:, None, None],
                                 (k_req, 1, hidden.shape[-1])), axis=1)[:, 0]
    lg = qwen2.logits(params["llm"], cfg.llm, last_hidden).astype(jnp.float32)
    first = _sample_rows(_row_keys(row_seed, prompt_len), lg, temp, top_k)

    def install(big, block):
        # scatter the K request rows into their slots (first l positions);
        # index expressions follow cfg.llm.kv_layout (qwen2.Qwen2Config)
        block = block.astype(big.dtype)
        lay = cfg.llm.kv_layout
        if lay == "skbd":
            return big.at[:, :l, :, slots_idx].set(block, mode="drop")
        if lay == "bhsd":
            return big.at[:, slots_idx, :, :l].set(block, mode="drop")
        return big.at[:, slots_idx, :l].set(block, mode="drop")

    leaves = dict(k=install(cache.k, tmp.k), v=install(cache.v, tmp.v))
    if cache.quantized:
        leaves.update(k_scale=install(cache.k_scale, tmp.k_scale),
                      v_scale=install(cache.v_scale, tmp.v_scale))
    index = cache.index.at[slots_idx].set(
        prompt_len.astype(cache.index.dtype), mode="drop")
    cache = qwen2.KVCache(index=index, **leaves)
    state = _state_install(state, slots_idx, first, temp, row_seed, budget, eot)
    return cache, state


@partial(jax.jit, static_argnames=("cfg", "quantize"))
def _prefill_prefix(params, ids: Array, *, cfg: UniGenConfig, quantize: bool
                    ) -> qwen2.KVCache:
    """One-time causal prefill of the shared prefix: its K/V are constant
    across every request, so they are computed once and spliced at admission."""
    tmp = qwen2.init_kv_cache(cfg.llm, 1, ids.shape[1], quantize=quantize)
    emb = embed_tokens(params, ids)
    _, tmp = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=emb, cache=tmp)
    return tmp


@partial(jax.jit, static_argnames=("cfg", "top_k"), donate_argnums=(1, 2))
def _admit_ids_prefix(params, cache, state, slots_idx, prefix, input_ids,
                      prompt_len, temp, row_seed, budget, eot, *,
                      cfg: UniGenConfig, top_k: Optional[int]):
    """Batched admission with a shared-prefix KV splice: broadcast the
    precomputed prefix block to the K group rows, prefill ONLY the suffixes
    against it (cached append at positions P..P+l-1), then scatter the
    combined blocks into the slot rows.

    Pad keys in the suffix tail are never visible to a real query: causality
    bounds query j to keys <= P+j < P+prompt_len, and decode overwrites the
    pad slots (the row index starts at P+prompt_len).
    """
    p = qwen2.cache_len(cfg.llm, prefix)
    k_req, l = input_ids.shape
    tmp = qwen2.init_kv_cache(cfg.llm, k_req, p + l, quantize=cache.quantized)
    batch_ax = 3 if cfg.llm.kv_layout == "skbd" else 1

    def put(big, blk):
        blk = jnp.broadcast_to(
            blk, blk.shape[:batch_ax] + (k_req,) + blk.shape[batch_ax + 1:])
        return jax.lax.dynamic_update_slice(
            big, blk.astype(big.dtype), (0,) * big.ndim)

    leaves = dict(k=put(tmp.k, prefix.k), v=put(tmp.v, prefix.v))
    if cache.quantized:
        leaves.update(k_scale=put(tmp.k_scale, prefix.k_scale),
                      v_scale=put(tmp.v_scale, prefix.v_scale))
    tmp = qwen2.KVCache(index=jnp.asarray(p, jnp.int32), **leaves)
    emb = embed_tokens(params, input_ids)
    hidden, tmp = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=emb,
                                cache=tmp)
    last_hidden = jnp.take_along_axis(
        hidden, jnp.broadcast_to((prompt_len - 1)[:, None, None],
                                 (k_req, 1, hidden.shape[-1])), axis=1)[:, 0]
    lg = qwen2.logits(params["llm"], cfg.llm, last_hidden).astype(jnp.float32)
    first = _sample_rows(_row_keys(row_seed, p + prompt_len), lg, temp, top_k)

    def install(big, block):
        block = block.astype(big.dtype)
        lay = cfg.llm.kv_layout
        if lay == "skbd":
            return big.at[:, :p + l, :, slots_idx].set(block, mode="drop")
        if lay == "bhsd":
            return big.at[:, slots_idx, :, :p + l].set(block, mode="drop")
        return big.at[:, slots_idx, :p + l].set(block, mode="drop")

    leaves = dict(k=install(cache.k, tmp.k), v=install(cache.v, tmp.v))
    if cache.quantized:
        leaves.update(k_scale=install(cache.k_scale, tmp.k_scale),
                      v_scale=install(cache.v_scale, tmp.v_scale))
    index = cache.index.at[slots_idx].set(
        (p + prompt_len).astype(cache.index.dtype), mode="drop")
    cache = qwen2.KVCache(index=index, **leaves)
    state = _state_install(state, slots_idx, first, temp, row_seed, budget, eot)
    return cache, state


def _draft_lookup(ctx: Array, ctx_start: Array, idx: Array, tok: Array,
                  k: int) -> Array:
    """Prompt-lookup draft, fully on device: propose the ``k`` tokens that
    followed the most recent earlier occurrence of the current bigram
    (ctx[idx-1], tok) in each row's context buffer.

    ``ctx`` [B, C] holds each slot's token history (prompt + accepted decode
    tokens); valid entries are ``ctx_start <= j < idx``; ``tok`` [B] is the
    next input token (sampled last step, not yet written). Rows without a
    match propose zeros — the verify step then accepts only the model's own
    next token, so a bad draft costs nothing but the (k+1)-wide forward.
    """
    b, c = ctx.shape
    pos = jnp.arange(c)
    tprev = jnp.take_along_axis(ctx, jnp.maximum(idx - 1, 0)[:, None], axis=1)
    nxt = jnp.concatenate([ctx[:, 1:], jnp.zeros((b, 1), ctx.dtype)], axis=1)
    match = ((ctx == tprev) & (nxt == tok[:, None])
             & (pos[None] >= ctx_start[:, None])
             & (pos[None] + 1 < idx[:, None] - 1))   # exclude the bigram itself
    j_best = jnp.max(jnp.where(match, pos[None], -1), axis=1)
    found = j_best >= 0

    def one(row, j):
        return jax.lax.dynamic_slice(row, (j,), (k,))

    prop = jax.vmap(one)(ctx, jnp.clip(j_best + 2, 0, c - k))
    return jnp.where(found[:, None], prop, 0)


@partial(jax.jit, static_argnames=("cfg", "steps", "k", "top_k"),
         donate_argnums=(1, 2, 3))
def _spec_decode_chunk(params, cache: qwen2.KVCache, state: SlotState, ctx: Array,
                       ctx_start: Array, *, cfg: UniGenConfig, steps: int, k: int,
                       top_k: Optional[int]
                       ) -> Tuple[qwen2.KVCache, SlotState, Array, Array, Array]:
    """``steps`` speculative decode steps; each step verifies a ``k``-token
    prompt-lookup draft in one (k+1)-wide cached forward and advances every
    row by its accepted count (1..k+1 tokens — the per-row cache index makes
    variable advance native). Greedy rows (temp==0) accept the longest prefix
    of the draft matching the model's own argmax; sampled rows pin acceptance
    to 1 with the exact RNG pattern of the non-speculative chunk, so both
    paths emit token-identical streams to ``_decode_chunk``.

    Rejected draft positions leave stale K/V (and ctx) entries above each
    row's index; the NEXT step's (k+1)-wide write starts at the new index and
    spans the whole stale region, and the decode mask never looks above the
    index — so stale state is overwritten before it is ever visible.

    Returns (cache, last_tok, ctx, toks [B, steps, k+1], counts [B, steps]);
    the host takes ``toks[b, s, :counts[b, s]]`` per step — one fetch per
    chunk, same sync discipline as the plain path.
    """

    def step(carry, _):
        cache_c, tok, ctx_c, act, emitted = carry
        idx = cache_c.index
        prop = _draft_lookup(ctx_c, ctx_start, idx, tok, k)
        inputs = jnp.concatenate([tok[:, None], prop], axis=1)       # [B, k+1]
        emb = embed_tokens(params, inputs)
        hidden, cache_n = qwen2.forward(params["llm"], cfg.llm,
                                        inputs_embeds=emb, cache=cache_c)
        lg = qwen2.logits(params["llm"], cfg.llm, hidden).astype(jnp.float32)
        # sampled rows advance one position per step (acc pinned to 1), so the
        # (seed, position) key matches the plain path exactly
        g0 = _sample_rows(_row_keys(state.seed, idx + 1), lg[:, 0], state.temp,
                          top_k)
        g = jnp.concatenate([g0[:, None], jnp.argmax(lg[:, 1:], axis=-1)], axis=1)
        ok = jnp.cumprod((prop == g[:, :k]).astype(jnp.int32), axis=1)
        acc = jnp.where(act & (state.temp == 0.0),
                        1 + ok.sum(axis=1), 1).astype(jnp.int32)
        emit = jnp.concatenate([tok[:, None], g[:, :k]], axis=1)     # [B, k+1]
        # device-side stop: within this step's accepted block, find the first
        # position that is the row's eot or its budget-th emission — the same
        # break the host harvest applies, so streams stay identical
        jpos = jnp.arange(k + 1)
        within = jpos[None, :] < acc[:, None]
        stop_j = within & ((emit == state.eot[:, None])
                           | (emitted[:, None] + jpos[None, :] + 1
                              >= state.budget[:, None]))
        anystop = act & stop_j.any(axis=1)
        valid = jnp.where(anystop, jnp.argmax(stop_j, axis=1) + 1,
                          jnp.where(act, acc, 0))
        emitted_n = emitted + valid
        act_n = act & ~anystop
        new_tok = jnp.where(
            act_n, jnp.take_along_axis(g, (acc - 1)[:, None], axis=1)[:, 0], 0)
        # accepted tokens extend the context buffer at positions idx..idx+k
        # (over-writes past the accepted count are stale, never matched: the
        # draft only reads below the row's index)
        def wr(row, chunk_, i):
            return jax.lax.dynamic_update_slice(row, chunk_, (i,))
        ctx_n = jax.vmap(wr)(ctx_c, emit.astype(ctx_c.dtype), idx)
        cache_n = cache_n._replace(index=jnp.where(act, idx + acc, idx))
        return (cache_n, new_tok, ctx_n, act_n, emitted_n), (emit, acc)

    (cache, last_tok, ctx, active, emitted), (toks, counts) = jax.lax.scan(
        step, (cache, state.last_tok, ctx, state.active, state.emitted), None,
        length=steps)
    state = state._replace(last_tok=last_tok, active=active, emitted=emitted)
    return (cache, state, ctx,
            jnp.moveaxis(toks, 0, 1), jnp.moveaxis(counts, 0, 1))


@partial(jax.jit, donate_argnums=(0,))
def _ctx_install(ctx: Array, slots_idx: Array, rows: Array) -> Array:
    """Scatter a group's known token ids into their slots' context rows
    (out-of-bounds padding rows dropped, like the cache installs)."""
    return ctx.at[slots_idx, :rows.shape[1]].set(rows.astype(ctx.dtype),
                                                 mode="drop")


@partial(jax.jit, static_argnames=("cfg", "top_k"), donate_argnums=(1, 2))
def _admit_ids(params, cache, state, slots_idx, input_ids, prompt_len, temp,
               row_seed, budget, eot, *, cfg: UniGenConfig, top_k: Optional[int]):
    """Batched text-prompt admission: K rows' embeds + causal/pad masks built
    in-program, one prefill forward, scatter installs into the slot rows."""
    l = input_ids.shape[1]
    pos = jnp.arange(l)
    keep = (pos[None, :] < prompt_len[:, None])
    mask = ((pos[:, None] >= pos[None, :])[None, None]
            & keep[:, None, None, :] & keep[:, None, :, None])
    emb = embed_tokens(params, input_ids)
    return _admit_core(params, cfg, cache, state, slots_idx, emb, mask,
                       prompt_len, temp, row_seed, budget, eot, top_k)


@partial(jax.jit, static_argnames=("cfg", "top_k"), donate_argnums=(1, 2))
def _admit_embeds(params, cache, state, slots_idx, inputs_embeds, attn_mask,
                  prompt_len, temp, row_seed, budget, eot, *,
                  cfg: UniGenConfig, top_k: Optional[int]):
    """Batched continuous-prompt admission (VQA: spliced vision embeddings +
    omni masks)."""
    return _admit_core(params, cfg, cache, state, slots_idx, inputs_embeds,
                       attn_mask, prompt_len, temp, row_seed, budget, eot, top_k)


# ---------------------------------------------------------------------------
# Host scheduler
# ---------------------------------------------------------------------------

class GenerationResult:
    """Future for one request; ``result()`` blocks until the tokens are ready.

    ``stream()`` yields tokens incrementally as decode chunks are harvested
    (one burst per engine chunk) — the serving front end's SSE path.
    """

    def __init__(self, rid: int):
        self.request_id = rid
        self._event = threading.Event()
        self._tokens: Optional[List[int]] = None
        self._error: Optional[BaseException] = None
        self._cancelled = False
        self._stream_q: "queue.Queue[Optional[int]]" = queue.Queue()
        # client-observed latency marks (perf_counter seconds): set at submit,
        # at the harvest that delivers the first token, and at resolution —
        # the raw material for TTFT / inter-token-latency percentiles
        self.submit_t: float = time.perf_counter()
        self.first_token_t: Optional[float] = None
        self.done_t: Optional[float] = None

    @property
    def ttft(self) -> Optional[float]:
        """Client-observed time-to-first-token (seconds), once available."""
        if self.first_token_t is None:
            return None
        return self.first_token_t - self.submit_t

    @property
    def itl(self) -> Optional[float]:
        """Mean inter-token latency over the request (seconds/token)."""
        if self.done_t is None or self._tokens is None or len(self._tokens) < 2:
            return None
        return (self.done_t - self.first_token_t) / (len(self._tokens) - 1)

    def cancel(self) -> None:
        """Request cancellation (client disconnect): the scheduler frees the
        slot at the next harvest and the future fails with CancelledError.
        A request that already finished is unaffected."""
        self._cancelled = True

    def _push(self, token: int) -> None:
        if self.first_token_t is None:
            self.first_token_t = time.perf_counter()
        self._stream_q.put(token)

    def _resolve(self, tokens: List[int]) -> None:
        self._tokens = tokens
        self.done_t = time.perf_counter()
        self._event.set()
        self._stream_q.put(None)

    def _fail(self, err: BaseException) -> None:
        self._error = err
        self._event.set()
        self._stream_q.put(None)

    def stream(self, timeout: Optional[float] = None):
        """Yield token ids as they are generated; stops at request completion.

        Only tokens within the request's budget (and up to/including eot) are
        yielded — identical content to ``result()``, delivered incrementally.
        ``timeout`` bounds the wait per token burst (not the whole request)
        and raises TimeoutError like ``result()``.
        """
        while True:
            try:
                tok = self._stream_q.get(timeout=timeout)
            except queue.Empty:
                raise TimeoutError(
                    f"request {self.request_id} produced no token for {timeout}s")
            if tok is None:
                if self._error is not None:
                    raise self._error
                return
            yield tok

    def done(self) -> bool:
        return self._event.is_set()

    def result(self, timeout: Optional[float] = None) -> List[int]:
        if not self._event.wait(timeout):
            raise TimeoutError(f"request {self.request_id} not done after {timeout}s")
        if self._error is not None:
            raise self._error
        return list(self._tokens)


@dataclasses.dataclass
class _Request:
    rid: int
    future: GenerationResult
    prompt_len: int
    max_new_tokens: int
    temperature: float
    eot_token: Optional[int]
    seed: int = 0
    input_ids: Optional[np.ndarray] = None        # [1, L_bucket] (text path)
    inputs_embeds: Optional[np.ndarray] = None    # [1, L, D] (embeddings path)
    attn_mask: Optional[np.ndarray] = None        # [1, 1, L, L]
    lookup_ids: Optional[np.ndarray] = None       # [1, L] draft context (embeds)
    tokens: List[int] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class EngineStats:
    """Occupancy accounting: slot_steps counts every (slot, decode-step) cell,
    busy_steps the occupied ones — busy/total is the continuous-batching win
    over static batching on the same trace."""
    requests_completed: int = 0
    tokens_generated: int = 0
    decode_chunks: int = 0
    slot_steps: int = 0
    busy_steps: int = 0
    # scheduler-loop wall-time breakdown (seconds): where a serving run's time
    # actually goes — dispatch enqueues device work (async), harvest blocks on
    # the chunk fetch, admit builds+dispatches prefill programs
    t_dispatch: float = 0.0
    t_harvest: float = 0.0
    t_admit: float = 0.0
    t_drain: float = 0.0

    @property
    def occupancy(self) -> float:
        return self.busy_steps / max(self.slot_steps, 1)


class ServingEngine:
    """Continuous-batching text/VQA decode server over a UniGen checkpoint.

    Usage::

        eng = ServingEngine(params, cfg, slots=8, max_len=1024)
        fut = eng.submit(prompt_ids, max_new_tokens=128, eot_token=im_end)
        tokens = fut.result()
        eng.close()

    ``submit_embeds`` takes pre-spliced embeddings + an omni attention mask for
    the understanding (image-prefix) path — the same inputs
    generation/decode.py::mmu_generate accepts.

    ``speculate_k > 0`` enables prompt-lookup speculative decoding: every step
    verifies a k-token draft proposed ON DEVICE from the slot's own token
    history (no extra host syncs), and greedy rows advance by 1..k+1 tokens
    per step. Output streams are token-identical to the plain engine for both
    greedy and sampled requests; the win is throughput on repetitive text
    (answers quoting the prompt, looping structure). Mean accepted tokens per
    occupied step = stats.tokens_generated / stats.busy_steps.

    One scheduler thread owns the device; submissions from any thread.
    """

    def __init__(self, params, cfg: UniGenConfig, *, slots: int = 8,
                 max_len: int = 1024, buckets: Sequence[int] = (64, 128, 256, 512),
                 chunk: Union[int, Sequence[int]] = 8,
                 top_k: Optional[int] = None,
                 quantized_cache: bool = False, pad_id: int = 0, seed: int = 0,
                 speculate_k: int = 0,
                 prefix_ids: Optional[Sequence[int]] = None,
                 decode_params=None, admit_cap: Optional[int] = None,
                 precompile: Sequence[Tuple] = ()):
        if max(buckets) > max_len:
            raise ValueError(f"bucket {max(buckets)} exceeds max_len {max_len}")
        self.params = params
        # mixed-precision serving: admission (prefill — large-T matmuls where
        # int4's unpack overhead LOSES) runs on ``params``; the HBM-bound
        # decode chunks run on ``decode_params`` when given (e.g. the W4A8
        # tree from ops/int4.py — measured 3.69 vs 4.44 ms/step at batch 32).
        # Both trees coexist in HBM (~1.75GB int8 + ~0.9GB int4 at 1.5B).
        self.decode_params = params if decode_params is None else decode_params
        self.cfg = cfg
        self.slots = slots
        self.max_len = max_len
        self.buckets = tuple(sorted(buckets))
        # decode-chunk length(s): a single int pins every chunk (the round-4
        # behavior — lowest TTFT under sparse arrivals); a sequence enables
        # ADAPTIVE chunks: the scheduler picks the longest allowed length that
        # no active row provably outlives (rows stop themselves on device, so
        # long chunks never overshoot), cutting host syncs by up to
        # max(chunk)/min(chunk) on budget-heavy workloads (BENCH.md serving)
        self.chunks = tuple(sorted({int(c) for c in (
            (chunk,) if isinstance(chunk, int) else tuple(chunk))}))
        if self.chunks[0] < 1:
            raise ValueError(f"chunk lengths must be >= 1, got {self.chunks}")
        self.chunk = self.chunks[0]
        self.top_k = top_k
        self.pad_id = pad_id
        self.speculate_k = speculate_k
        self.stats = EngineStats()

        # shared-prefix KV cache: prefill the common prefix (system prompt /
        # few-shot header) ONCE; every admission splices the block and
        # prefills only its suffix. Token streams are identical to sending
        # prefix+suffix as the full prompt (tested); admission prefill cost
        # drops by the prefix share.
        self._prefix = None
        self._prefix_ids = None
        if prefix_ids is not None:
            self._prefix_ids = np.asarray(prefix_ids, np.int32).reshape(1, -1)
            if self._prefix_ids.shape[1] == 0:
                raise ValueError("prefix_ids must contain at least one token")
            self._prefix = _prefill_prefix(
                params, jnp.asarray(self._prefix_ids), cfg=cfg,
                quantize=quantized_cache)
        self.prefix_len = 0 if self._prefix_ids is None else self._prefix_ids.shape[1]

        self._cache = qwen2.init_kv_cache(cfg.llm, slots, max_len,
                                          quantize=quantized_cache,
                                          per_row_index=True)
        if speculate_k > 0:
            # per-slot token history for the on-device prompt-lookup draft
            self._ctx = jnp.zeros((slots, max_len), jnp.int32)
            self._ctx_start = np.zeros((slots,), np.int32)
        # device-resident per-slot decode state (active/eot/budget/... —
        # rows stop themselves, see SlotState); _active mirrors the HOST's
        # conservative view: set at admit, cleared when a harvest resolves
        # the occupant, and only used for scheduling decisions
        self._state = init_slot_state(slots)
        self._seed = seed
        self._active = np.zeros((slots,), bool)
        self._slot_req: List[Optional[_Request]] = [None] * slots
        # steps + slot set of the dispatched-but-unharvested chunk (at most
        # one, the one-deep pipeline) — makes the scheduler's per-row
        # remaining-budget estimate a true upper bound
        self._unharvested: Optional[Tuple[int, frozenset]] = None

        # batched-admission group cap: K same-signature pending requests cost
        # one prefill dispatch; power-of-two padding bounds compile variants
        self._admit_cap = max(1, min(slots, 16 if admit_cap is None
                                     else admit_cap))
        self._rid = itertools.count()
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._pending: List[_Request] = []
        self._closing = False
        # compile the loop's program variants before it starts serving —
        # the scheduler thread owns cache/state once it runs
        self._precompile(precompile)
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="unigen-serving")
        self._thread.start()

    def _precompile(self, sigs: Sequence[Tuple]) -> None:
        """Compile every program the serving loop can hit, BEFORE it starts.

        Admission compiles one program per (signature, padded-group-size),
        and a late compile stalls the scheduler for seconds mid-serve: the
        r5 lmms bs=8 run spent 11 of its 13.6 s measured wall in exactly
        these compiles — slots freed faster than the vision tower refilled
        the pending queue, forming group sizes (1/2/4) the full-wave warmup
        never dispatched. A fresh engine can dispatch every variant as a
        NO-OP instead: the padding-row discipline (target slot index ==
        ``self.slots``; every install scatters with ``mode="drop"``) means
        an all-padding admission touches no slot row, and an all-inactive
        decode chunk advances no row index and writes only cache positions
        a later admission fully re-prefills.

        ``sigs``: iterable of ``("ids", bucket_len)`` and/or
        ``("emb", bucket_len, embed_dim)`` — the shapes ``submit`` /
        ``submit_embeds`` will produce (bucketed prompt lengths). Empty
        (the default) skips precompilation entirely.

        Memoized per process: the no-op dispatches EXECUTE (full-compute
        prefills + decode chunks, ~1-2 s of device time at flagship shapes —
        execution is what forces the relay's server-side compile+load), and
        a second engine with identical program signatures reuses the compiled
        programs anyway. Without the memo, every engine construction re-runs
        the no-ops: the r5 lmms re-measure lost ~2 s per measured run to
        exactly this (843 vs 1,464 tok/s — the bench constructs its engine
        inside the timed window).
        """
        if not sigs:
            return
        leaves = (jax.tree_util.tree_leaves(self.params)
                  + jax.tree_util.tree_leaves(self.decode_params))
        key = (self.cfg, self.slots, self.max_len, self.chunks, self.top_k,
               self.speculate_k, self._cache.quantized, self.prefix_len,
               tuple(tuple(s) for s in sigs), self._admit_cap,
               tuple((x.shape, str(x.dtype)) for x in leaves))
        if key in _PRECOMPILED_KEYS:
            return
        _PRECOMPILED_KEYS.add(key)
        sizes, k = [], 1
        while True:
            sizes.append(k)
            if k >= self._admit_cap:
                break
            k *= 2
        # embeds admissions arrive in the model's activation dtype
        # (pipeline._mmu_vit_inputs casts the splice to embed_tokens' output)
        emb_dt = embed_tokens(self.params, jnp.zeros((1, 1), jnp.int32)).dtype
        for sig in sigs:
            ln = int(sig[1])
            for kp in sizes:
                drop = jnp.full((kp,), self.slots, jnp.int32)
                plen = jnp.full((kp,), ln, jnp.int32)
                zf = jnp.zeros((kp,), jnp.float32)
                zi = jnp.zeros((kp,), jnp.int32)
                one = jnp.ones((kp,), jnp.int32)
                neg = jnp.full((kp,), -1, jnp.int32)
                if sig[0] == "ids":
                    ids = jnp.zeros((kp, ln), jnp.int32)
                    if self._prefix is not None:
                        self._cache, self._state = _admit_ids_prefix(
                            self.params, self._cache, self._state, drop,
                            self._prefix, ids, plen, zf, zi, one, neg,
                            cfg=self.cfg, top_k=self.top_k)
                    else:
                        self._cache, self._state = _admit_ids(
                            self.params, self._cache, self._state, drop, ids,
                            plen, zf, zi, one, neg, cfg=self.cfg,
                            top_k=self.top_k)
                elif sig[0] == "emb":
                    emb = jnp.zeros((kp, ln, int(sig[2])), emb_dt)
                    msk = jnp.ones((kp, 1, ln, ln), bool)
                    self._cache, self._state = _admit_embeds(
                        self.params, self._cache, self._state, drop, emb,
                        msk, plen, zf, zi, one, neg, cfg=self.cfg,
                        top_k=self.top_k)
                else:
                    raise ValueError(f"unknown precompile signature {sig!r}")
                if self.speculate_k > 0:
                    row_len = ln + (self.prefix_len if sig[0] == "ids" else 0)
                    self._ctx = _ctx_install(
                        self._ctx, drop, jnp.zeros((kp, row_len), jnp.int32))
        for steps in self.chunks:
            if self.speculate_k > 0:
                (self._cache, self._state, self._ctx, _toks,
                 _counts) = _spec_decode_chunk(
                    self.decode_params, self._cache, self._state, self._ctx,
                    jnp.asarray(self._ctx_start), cfg=self.cfg, steps=steps,
                    k=self.speculate_k, top_k=self.top_k)
            else:
                self._cache, self._state, _toks = _decode_chunk(
                    self.decode_params, self._cache, self._state,
                    cfg=self.cfg, steps=steps, top_k=self.top_k)

    # -- submission ----------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds largest bucket {self.buckets[-1]}")

    @property
    def healthy(self) -> bool:
        """True while the scheduler thread is serving (liveness probes)."""
        return self._thread.is_alive() and not self._closing

    def _request_seed(self, rid: int, seed: Optional[int]) -> int:
        """Per-request sampling seed: user-provided, or derived from the
        engine seed + request id. Sampled streams depend ONLY on this seed
        and the prompt — never on batching or scheduling (``_row_keys``)."""
        if seed is not None:
            return int(seed) & 0x7FFFFFFF
        return (self._seed * 1000003 + rid * 2654435761 + 1) & 0x7FFFFFFF

    def submit(self, input_ids: Sequence[int], *, max_new_tokens: int = 128,
               temperature: float = 0.0, eot_token: Optional[int] = None,
               seed: Optional[int] = None) -> GenerationResult:
        """Queue a text prompt; returns a future resolving to generated token ids."""
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        if len(ids) == 0:  # prompt_len 0 would mask every key -> NaN garbage
            raise ValueError("prompt must contain at least one token")
        l = self._bucket(len(ids))
        self._check_fit(self.prefix_len + l, max_new_tokens)
        padded = np.full((1, l), self.pad_id, np.int32)
        padded[0, :len(ids)] = ids
        rid = next(self._rid)
        return self._enqueue(_Request(
            rid=rid, future=None, prompt_len=len(ids),
            max_new_tokens=max_new_tokens, temperature=temperature,
            eot_token=eot_token, seed=self._request_seed(rid, seed),
            input_ids=padded))

    def submit_embeds(self, inputs_embeds: np.ndarray, attn_mask: np.ndarray,
                      prompt_len: int, *, max_new_tokens: int = 128,
                      temperature: float = 0.0, eot_token: Optional[int] = None,
                      lookup_ids: Optional[Sequence[int]] = None,
                      seed: Optional[int] = None) -> GenerationResult:
        """Queue a continuous-embedding prompt (understanding path).

        ``inputs_embeds``: [1, L, D] already padded to a bucket length;
        ``attn_mask``: [1, 1, L, L] bool omni mask (ops/masks.py builds it).
        ``lookup_ids`` (speculation only): the request's known token ids at
        their splice positions, to seed the prompt-lookup draft — without it
        an embeds request drafts from its own generated tokens only.
        """
        if self._prefix is not None:
            raise ValueError("submit_embeds does not compose with a shared "
                             "prefix (the omni mask is built for the full "
                             "splice); run an engine without prefix_ids")
        l = inputs_embeds.shape[1]
        if l not in self.buckets:
            raise ValueError(f"embeddings length {l} must be one of {self.buckets}")
        if prompt_len < 1:
            raise ValueError("prompt_len must be >= 1")
        self._check_fit(l, max_new_tokens)
        lk = None
        if lookup_ids is not None and self.speculate_k > 0:
            lk = np.zeros((1, l), np.int32)
            ids = np.asarray(lookup_ids, np.int32).reshape(-1)[:l]
            lk[0, :len(ids)] = ids
        rid = next(self._rid)
        # Device-resident embeds/mask (pipeline.vqa_serving_inputs) pass
        # through untouched — np.asarray here would block this thread on the
        # vision-tower forward and round-trip the splice through host memory,
        # defeating prefill/decode overlap. Host arrays are kept as numpy;
        # admission uploads them once.
        if not isinstance(inputs_embeds, jax.Array):
            inputs_embeds = np.asarray(inputs_embeds)
        if not isinstance(attn_mask, jax.Array):
            attn_mask = np.asarray(attn_mask, bool)
        return self._enqueue(_Request(
            rid=rid, future=None, prompt_len=prompt_len,
            max_new_tokens=max_new_tokens, temperature=temperature,
            eot_token=eot_token, seed=self._request_seed(rid, seed),
            inputs_embeds=inputs_embeds,
            attn_mask=attn_mask, lookup_ids=lk))

    def _check_fit(self, bucket_len: int, max_new: int) -> None:
        if max_new < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new}")
        # speculation writes up to k draft positions past the final accepted
        # token — the headroom keeps every BUDGETED write unclamped. After a
        # row's budget is exhausted, junk writes may clamp at max_len-1: the
        # trailing part of its final chunk, plus (since the one-deep pipeline)
        # one full extra chunk dispatched before the freeing harvest ran.
        # Those positions are provably never read: the decode mask reads
        # strictly below the row's index, and the next admission re-prefills
        # the row before the index can reach them.
        if bucket_len + max_new + self.speculate_k > self.max_len:
            raise ValueError(
                f"bucket {bucket_len} + max_new_tokens {max_new} (+ "
                f"speculate_k {self.speculate_k}) exceeds the "
                f"engine max_len {self.max_len}")

    def _enqueue(self, req: _Request) -> GenerationResult:
        if self._closing:
            raise RuntimeError("engine is closed")
        req.future = GenerationResult(req.rid)
        self._queue.put(req)
        # the scheduler may have died between the check and the put; a dead
        # thread will never drain this item, so fail it here (idempotent with
        # the death handler's own drain)
        if self._closing and not self._thread.is_alive():
            req.future._fail(RuntimeError("engine is closed"))
        return req.future

    # -- scheduler loop -------------------------------------------------------

    def _loop(self) -> None:
        # One-deep decode pipeline: chunk i+1 is DISPATCHED (async) before
        # chunk i's tokens are fetched, so the per-chunk host round trip
        # (~30ms over the TPU relay, the dominant serving cost at small
        # chunks) overlaps device execution instead of serializing with it.
        # Outputs are token-identical to the synchronous schedule: sampled
        # streams are position-indexed per request (schedule-independent RNG,
        # docs/SERVING.md), a slot freed at harvest i keeps decoding junk for
        # one extra chunk (discarded — the harvest snapshot-guard below), and
        # admission still lands before the NEXT dispatch, so a request's
        # first chunk is never delayed when a slot was already free.
        inflight = None  # (slot_req snapshot at dispatch, toks, counts) or None
        try:
            while True:
                idle = (inflight is None and not self._active.any()
                        and not self._pending)
                if idle and self._closing:
                    return
                t0 = time.perf_counter()
                self._drain_queue(block=idle)
                t1 = time.perf_counter()
                if (inflight is None and self._closing and not self._pending
                        and not self._active.any()):
                    return
                self._admit_pending()
                t2 = time.perf_counter()
                nxt = self._dispatch_chunk() if self._active.any() else None
                t3 = time.perf_counter()
                if inflight is not None:
                    self._harvest(*inflight)
                t4 = time.perf_counter()
                self.stats.t_drain += t1 - t0
                self.stats.t_admit += t2 - t1
                self.stats.t_dispatch += t3 - t2
                self.stats.t_harvest += t4 - t3
                inflight = nxt
        except BaseException as e:  # resolve all futures so callers unblock
            self._closing = True     # reject new submissions: no thread serves them
            undrained = []
            try:
                while True:
                    item = self._queue.get(block=False)
                    if item is not None:
                        undrained.append(item)
            except queue.Empty:
                pass
            for req in self._pending + undrained + [r for r in self._slot_req if r]:
                req.future._fail(e)
            raise

    def _drain_queue(self, block: bool) -> None:
        try:
            item = self._queue.get(block=block)
        except queue.Empty:
            return
        while True:
            if item is None:
                self._closing = True
            else:
                self._pending.append(item)
            try:
                item = self._queue.get(block=False)
            except queue.Empty:
                return

    def _admit_sig(self, req: _Request):
        """Admit-program signature: requests sharing one can batch into a
        single prefill dispatch (same compiled program shape)."""
        if req.input_ids is not None:
            return ("ids", req.input_ids.shape[1])
        return ("emb", req.inputs_embeds.shape[1], req.inputs_embeds.shape[2])

    def _admit_pending(self) -> None:
        free = [i for i in range(self.slots) if not self._active[i]]
        while free and self._pending:
            head = self._pending.pop(0)
            if head.future._cancelled:  # cancelled before admission: no device work
                head.future._fail(CancelledError(f"request {head.rid} cancelled"))
                continue
            # BATCHED admission (round 4): take the longest FIFO prefix of
            # pending requests sharing the head's program signature, up to the
            # free slots and the group cap — K requests cost ONE prefill
            # program dispatch instead of K (the dominant serving cost for
            # prompt-heavy workloads; BENCH.md lmms serving section)
            sig = self._admit_sig(head)
            group, slots_used = [head], [free.pop(0)]
            while (free and self._pending
                   and len(group) < self._admit_cap
                   and not self._pending[0].future._cancelled
                   and self._admit_sig(self._pending[0]) == sig):
                group.append(self._pending.pop(0))
                slots_used.append(free.pop(0))
            self._admit_group(group, slots_used)

    def _admit_group(self, group: List[_Request], slots_used: List[int]) -> None:
        # pad the group to a power-of-two size so the compiled-variant count
        # stays at log2(cap) per signature; pad rows duplicate row 0 (NaN-free
        # junk) and target slot index == self.slots, which every scatter
        # install drops (mode="drop")
        _t0 = time.perf_counter() if _DEBUG else 0.0
        k = len(group)
        kpad = 1 << (k - 1).bit_length()
        pad = kpad - k
        slots_idx = jnp.asarray(slots_used + [self.slots] * pad, jnp.int32)
        plen = jnp.asarray([r.prompt_len for r in group]
                           + [group[0].prompt_len] * pad, jnp.int32)
        temp = jnp.asarray([r.temperature for r in group] + [0.0] * pad,
                           jnp.float32)
        rseed = jnp.asarray([r.seed for r in group] + [0] * pad, jnp.int32)
        budget = jnp.asarray([r.max_new_tokens for r in group] + [0] * pad,
                             jnp.int32)
        eot = jnp.asarray([-1 if r.eot_token is None else r.eot_token
                           for r in group] + [-1] * pad, jnp.int32)
        if group[0].input_ids is not None:
            ids = np.concatenate([r.input_ids for r in group]
                                 + [group[0].input_ids] * pad, axis=0)
            if self._prefix is not None:
                self._cache, self._state = _admit_ids_prefix(
                    self.params, self._cache, self._state, slots_idx,
                    self._prefix, jnp.asarray(ids), plen, temp, rseed, budget,
                    eot, cfg=self.cfg, top_k=self.top_k)
            else:
                self._cache, self._state = _admit_ids(
                    self.params, self._cache, self._state, slots_idx,
                    jnp.asarray(ids), plen, temp, rseed, budget, eot,
                    cfg=self.cfg, top_k=self.top_k)
        else:
            # embeds may be device-resident (prefill/decode overlap) — concat
            # on device, never through host memory
            embs = [r.inputs_embeds for r in group] + [group[0].inputs_embeds] * pad
            msks = [r.attn_mask for r in group] + [group[0].attn_mask] * pad
            emb = embs[0] if kpad == 1 else jnp.concatenate(
                [jnp.asarray(e) for e in embs], axis=0)
            msk = msks[0] if kpad == 1 else jnp.concatenate(
                [jnp.asarray(m) for m in msks], axis=0)
            self._cache, self._state = _admit_embeds(
                self.params, self._cache, self._state, slots_idx,
                jnp.asarray(emb), jnp.asarray(msk), plen, temp, rseed, budget,
                eot, cfg=self.cfg, top_k=self.top_k)
        if self.speculate_k > 0:
            rows = []
            for slot, req in zip(slots_used, group):
                if req.input_ids is not None:
                    row, start = req.input_ids, 0
                    if self._prefix_ids is not None:
                        row = np.concatenate([self._prefix_ids, row], axis=1)
                elif req.lookup_ids is not None:
                    row, start = req.lookup_ids, 0
                else:  # no ids known: draft only from the generated region
                    row = np.zeros((1, req.inputs_embeds.shape[1]), np.int32)
                    start = req.prompt_len
                rows.append(row)
                self._ctx_start[slot] = start
            # one scatter for the whole group (rows share the signature's
            # bucketed length; padding rows dropped like the cache installs)
            self._ctx = _ctx_install(
                self._ctx, slots_idx,
                jnp.asarray(np.concatenate(rows + [rows[0]] * pad, axis=0),
                            jnp.int32))
        for slot, req in zip(slots_used, group):
            # no host fetch here: the request's first token (sampled in the
            # admit program) arrives through the next decode chunk's outputs
            self._slot_req[slot] = req
            self._active[slot] = True
        if _DEBUG:
            print(f"[engine] admit k={k} pad={pad} "
                  f"{(time.perf_counter() - _t0) * 1e3:.1f}ms", file=sys.stderr)

    def _pick_steps(self) -> Optional[int]:
        """Choose the next chunk length from ``self.chunks``.

        Per active slot, ``budget - len(tokens) - unharvested steps`` is an
        UPPER bound on tokens it still needs (emission is exactly one per
        active step, and eot only stops rows earlier). If every bound is <= 0
        all occupants provably finish inside the in-flight chunk — dispatching
        would burn a whole chunk on frozen rows, so skip (the loop harvests,
        frees, admits, then dispatches). Otherwise run the longest chunk no
        soon-to-finish row outlives: when requests are WAITING, that is the
        earliest active finish (frees its slot at the first possible harvest);
        when the queue is empty, the latest one (nothing to admit — minimize
        syncs).
        """
        pend_steps, pend_slots = self._unharvested or (0, frozenset())
        rem = []
        for slot in range(self.slots):
            req = self._slot_req[slot]
            if req is None or not self._active[slot]:
                continue
            rem.append(req.max_new_tokens - len(req.tokens)
                       - (pend_steps if slot in pend_slots else 0))
        if not rem:
            return None
        positive = [r for r in rem if r > 0]
        if not positive:
            return None
        target = min(positive) if self._pending else max(positive)
        return max(c for c in self.chunks if c <= max(target, self.chunks[0]))

    def _dispatch_chunk(self):
        """Async-dispatch one decode chunk; returns (slot_req snapshot,
        device toks, host-or-device counts) for a later ``_harvest``, or None
        when every occupant provably finishes in the in-flight chunk. The
        cache/state handles advance immediately (futures), so admissions and
        the next chunk queue behind this one on device with no host sync."""
        steps = self._pick_steps()
        if steps is None:
            return None
        if self.speculate_k > 0:
            (self._cache, self._state, self._ctx, toks,
             counts) = _spec_decode_chunk(
                self.decode_params, self._cache, self._state, self._ctx,
                jnp.asarray(self._ctx_start), cfg=self.cfg, steps=steps,
                k=self.speculate_k, top_k=self.top_k)
        else:
            self._cache, self._state, toks = _decode_chunk(
                self.decode_params, self._cache, self._state,
                cfg=self.cfg, steps=steps, top_k=self.top_k)
            counts = None
        self.stats.decode_chunks += 1
        self.stats.slot_steps += self.slots * steps
        self.stats.busy_steps += int(self._active.sum()) * steps
        self._unharvested = (steps, frozenset(
            s for s in range(self.slots) if self._active[s]))
        return list(self._slot_req), toks, counts

    def _harvest(self, snapshot, toks, counts) -> None:
        # one fetch per chunk either way (toks [B, steps, k+1] + counts) —
        # the only host sync on the decode path
        _t0 = time.perf_counter() if _DEBUG else 0.0
        self._unharvested = None
        if counts is not None:
            toks, counts = np.asarray(toks), np.asarray(counts)
        else:
            toks = np.asarray(toks)[:, :, None]  # [B, steps, 1]
            counts = np.ones(toks.shape[:2], np.int32)
        for slot in range(self.slots):
            req = snapshot[slot]
            # snapshot-guard: attribute tokens only to the request that
            # occupied the slot AT DISPATCH — a slot freed (finish/cancel) by
            # the previous harvest decodes one junk chunk before the stale
            # active mask catches up, and a newly admitted request's first
            # tokens arrive in the NEXT chunk (its admit program queued after
            # this one on device)
            if req is None or req is not self._slot_req[slot]:
                continue
            if req.future._cancelled:  # free the slot, fail the future
                req.future._fail(CancelledError(f"request {req.rid} cancelled"))
                self._slot_req[slot] = None
                self._active[slot] = False
                # finished rows freeze themselves on device; a CANCELLED row
                # doesn't know it — clear its device flag too
                self._state = _state_deactivate(self._state,
                                                jnp.int32(slot))
                continue
            accepted = [t for s in range(toks.shape[1])
                        for t in toks[slot, s, :counts[slot, s]]]
            for t in accepted:
                req.tokens.append(int(t))
                req.future._push(int(t))
                self.stats.tokens_generated += 1
                if (req.eot_token is not None and t == req.eot_token) or \
                        len(req.tokens) >= req.max_new_tokens:
                    break
            if self._finish_if_done(req):
                self._slot_req[slot] = None
                self._active[slot] = False
        if _DEBUG:
            print(f"[engine] harvest steps={toks.shape[1]} "
                  f"{(time.perf_counter() - _t0) * 1e3:.1f}ms", file=sys.stderr)

    def _finish_if_done(self, req: _Request) -> bool:
        done = len(req.tokens) >= req.max_new_tokens or (
            req.eot_token is not None and req.tokens and
            req.tokens[-1] == req.eot_token)
        if done:
            req.future._resolve(req.tokens[:req.max_new_tokens])
            self.stats.requests_completed += 1
        return done

    # -- lifecycle ------------------------------------------------------------

    def close(self, timeout: Optional[float] = 60.0) -> None:
        """Finish all queued/in-flight requests, then stop the scheduler."""
        self._queue.put(None)
        self._thread.join(timeout)
        if self._thread.is_alive():
            return  # still draining a long backlog: don't steal its queue
        # fail any request that raced past the closed check after the
        # scheduler exited, so its caller unblocks instead of hanging
        try:
            while True:
                item = self._queue.get(block=False)
                if item is not None:
                    item.future._fail(RuntimeError("engine is closed"))
        except queue.Empty:
            pass

    def __enter__(self) -> "ServingEngine":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()
