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
import queue
import threading
from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen2
from ..models.unigen import UniGenConfig, embed_tokens
from ..ops import sampling as S

Array = jax.Array


# ---------------------------------------------------------------------------
# Device programs
# ---------------------------------------------------------------------------

def _sample_rows(key: Array, logits: Array, temp: Array, top_k: Optional[int]) -> Array:
    """Per-row greedy (temp==0) or temperature/top-k sampling.

    Matches generation/decode.py::_sample_step semantics per row, but the
    temperature is a [B] array so one program serves mixed request params.
    """
    greedy = jnp.argmax(logits, axis=-1)
    lg = logits / jnp.maximum(temp, 1e-6)[:, None]
    if top_k is not None:
        kth = jax.lax.top_k(lg, min(top_k, lg.shape[-1]))[0][..., -1:]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    sampled = S.sample_categorical(key, jax.nn.softmax(lg, axis=-1))
    return jnp.where(temp > 0, sampled, greedy).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "steps", "top_k"), donate_argnums=(1, 2))
def _decode_chunk(params, cache: qwen2.KVCache, last_tok: Array, active: Array,
                  temp: Array, key: Array, *, cfg: UniGenConfig, steps: int,
                  top_k: Optional[int]) -> Tuple[qwen2.KVCache, Array, Array]:
    """`steps` decode steps over all B slots; returns (cache, last_tok, toks[B, steps]).

    Each step emits its INPUT token (the one sampled last step / at admission),
    not its output — so the admit-time first token flows out through the next
    chunk and the host never blocks on an admission fetch (one device→host
    sync per chunk total; over the TPU relay a per-admit fetch costs a ~30ms
    round trip, BENCH.md). Inactive rows are frozen: their index does not
    advance and their sampled token is pinned to 0 until an admit resets them.
    """

    def step(carry, _):
        cache_c, tok, k = carry
        k, k_s = jax.random.split(k)
        emb = embed_tokens(params, tok[:, None])
        hidden, cache_n = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=emb,
                                        cache=cache_c)
        lg = qwen2.logits(params["llm"], cfg.llm, hidden[:, 0]).astype(jnp.float32)
        nxt = jnp.where(active, _sample_rows(k_s, lg, temp, top_k), 0)
        cache_n = cache_n._replace(
            index=jnp.where(active, cache_n.index, cache_c.index))
        return (cache_n, nxt, k), tok

    (cache, last_tok, _), toks = jax.lax.scan(
        step, (cache, last_tok, key), None, length=steps)
    return cache, last_tok, jnp.moveaxis(toks, 0, 1)


def _admit_core(params, cfg: UniGenConfig, cache: qwen2.KVCache, last_tok, slot,
                inputs_embeds, attn_mask, prompt_len, temp, key, top_k):
    """Prefill one request and install it into slot row `slot`."""
    l = inputs_embeds.shape[1]
    tmp = qwen2.init_kv_cache(cfg.llm, 1, l, quantize=cache.quantized)
    positions = jnp.minimum(jnp.arange(l)[None, :], prompt_len[:, None] - 1)
    hidden, tmp = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=inputs_embeds,
                                mask=attn_mask, positions=positions, cache=tmp)
    last_hidden = jnp.take_along_axis(
        hidden, jnp.broadcast_to((prompt_len - 1)[:, None, None],
                                 (1, 1, hidden.shape[-1])), axis=1)[:, 0]
    lg = qwen2.logits(params["llm"], cfg.llm, last_hidden).astype(jnp.float32)
    first = _sample_rows(key, lg, temp, top_k)

    def install(big, block):
        start = (0, slot) + (0,) * (big.ndim - 2)
        return jax.lax.dynamic_update_slice(big, block.astype(big.dtype), start)

    leaves = dict(k=install(cache.k, tmp.k), v=install(cache.v, tmp.v))
    if cache.quantized:
        leaves.update(k_scale=install(cache.k_scale, tmp.k_scale),
                      v_scale=install(cache.v_scale, tmp.v_scale))
    index = jax.lax.dynamic_update_slice(
        cache.index, prompt_len.astype(cache.index.dtype), (slot,))
    cache = qwen2.KVCache(index=index, **leaves)
    last_tok = jax.lax.dynamic_update_slice(last_tok, first, (slot,))
    return cache, last_tok


@partial(jax.jit, static_argnames=("cfg", "top_k"), donate_argnums=(1, 2))
def _admit_ids(params, cache, last_tok, slot, input_ids, prompt_len, temp, key,
               *, cfg: UniGenConfig, top_k: Optional[int]):
    """Text-prompt admission: embeds + causal/pad mask built in-program."""
    l = input_ids.shape[1]
    pos = jnp.arange(l)
    keep = (pos[None, :] < prompt_len[:, None])
    mask = ((pos[:, None] >= pos[None, :])[None, None]
            & keep[:, None, None, :] & keep[:, None, :, None])
    emb = embed_tokens(params, input_ids)
    return _admit_core(params, cfg, cache, last_tok, slot, emb, mask,
                       prompt_len, temp, key, top_k)


@partial(jax.jit, static_argnames=("cfg", "top_k"), donate_argnums=(1, 2))
def _admit_embeds(params, cache, last_tok, slot, inputs_embeds, attn_mask,
                  prompt_len, temp, key, *, cfg: UniGenConfig,
                  top_k: Optional[int]):
    """Continuous-prompt admission (VQA: spliced vision embeddings + omni mask)."""
    return _admit_core(params, cfg, cache, last_tok, slot, inputs_embeds,
                       attn_mask, prompt_len, temp, key, top_k)


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
        self._stream_q: "queue.Queue[Optional[int]]" = queue.Queue()

    def _push(self, token: int) -> None:
        self._stream_q.put(token)

    def _resolve(self, tokens: List[int]) -> None:
        self._tokens = tokens
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
        """
        while True:
            tok = self._stream_q.get(timeout=timeout)
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
    input_ids: Optional[np.ndarray] = None        # [1, L_bucket] (text path)
    inputs_embeds: Optional[np.ndarray] = None    # [1, L, D] (embeddings path)
    attn_mask: Optional[np.ndarray] = None        # [1, 1, L, L]
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

    One scheduler thread owns the device; submissions from any thread.
    """

    def __init__(self, params, cfg: UniGenConfig, *, slots: int = 8,
                 max_len: int = 1024, buckets: Sequence[int] = (64, 128, 256, 512),
                 chunk: int = 8, top_k: Optional[int] = None,
                 quantized_cache: bool = False, pad_id: int = 0, seed: int = 0):
        if max(buckets) > max_len:
            raise ValueError(f"bucket {max(buckets)} exceeds max_len {max_len}")
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.max_len = max_len
        self.buckets = tuple(sorted(buckets))
        self.chunk = chunk
        self.top_k = top_k
        self.pad_id = pad_id
        self.stats = EngineStats()

        self._cache = qwen2.init_kv_cache(cfg.llm, slots, max_len,
                                          quantize=quantized_cache,
                                          per_row_index=True)
        self._last_tok = jnp.zeros((slots,), jnp.int32)
        self._key = jax.random.key(seed)
        self._temp = np.zeros((slots,), np.float32)
        self._active = np.zeros((slots,), bool)
        self._slot_req: List[Optional[_Request]] = [None] * slots

        self._rid = itertools.count()
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._pending: List[_Request] = []
        self._closing = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="unigen-serving")
        self._thread.start()

    # -- submission ----------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds largest bucket {self.buckets[-1]}")

    def submit(self, input_ids: Sequence[int], *, max_new_tokens: int = 128,
               temperature: float = 0.0, eot_token: Optional[int] = None
               ) -> GenerationResult:
        """Queue a text prompt; returns a future resolving to generated token ids."""
        ids = np.asarray(input_ids, np.int32).reshape(-1)
        l = self._bucket(len(ids))
        self._check_fit(l, max_new_tokens)
        padded = np.full((1, l), self.pad_id, np.int32)
        padded[0, :len(ids)] = ids
        return self._enqueue(_Request(
            rid=next(self._rid), future=None, prompt_len=len(ids),
            max_new_tokens=max_new_tokens, temperature=temperature,
            eot_token=eot_token, input_ids=padded))

    def submit_embeds(self, inputs_embeds: np.ndarray, attn_mask: np.ndarray,
                      prompt_len: int, *, max_new_tokens: int = 128,
                      temperature: float = 0.0, eot_token: Optional[int] = None
                      ) -> GenerationResult:
        """Queue a continuous-embedding prompt (understanding path).

        ``inputs_embeds``: [1, L, D] already padded to a bucket length;
        ``attn_mask``: [1, 1, L, L] bool omni mask (ops/masks.py builds it).
        """
        l = inputs_embeds.shape[1]
        if l not in self.buckets:
            raise ValueError(f"embeddings length {l} must be one of {self.buckets}")
        self._check_fit(l, max_new_tokens)
        return self._enqueue(_Request(
            rid=next(self._rid), future=None, prompt_len=prompt_len,
            max_new_tokens=max_new_tokens, temperature=temperature,
            eot_token=eot_token, inputs_embeds=np.asarray(inputs_embeds),
            attn_mask=np.asarray(attn_mask, bool)))

    def _check_fit(self, bucket_len: int, max_new: int) -> None:
        if max_new < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new}")
        if bucket_len + max_new > self.max_len:
            raise ValueError(
                f"bucket {bucket_len} + max_new_tokens {max_new} exceeds the "
                f"engine max_len {self.max_len}")

    def _enqueue(self, req: _Request) -> GenerationResult:
        if self._closing:
            raise RuntimeError("engine is closed")
        req.future = GenerationResult(req.rid)
        self._queue.put(req)
        return req.future

    # -- scheduler loop -------------------------------------------------------

    def _loop(self) -> None:
        try:
            while True:
                self._drain_queue(block=not self._active.any() and not self._pending)
                if self._closing and not self._pending and not self._active.any():
                    return
                self._admit_pending()
                if self._active.any():
                    self._decode_and_harvest()
        except BaseException as e:  # resolve all futures so callers unblock
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

    def _admit_pending(self) -> None:
        free = [i for i in range(self.slots) if not self._active[i]]
        while free and self._pending:
            slot, req = free.pop(0), self._pending.pop(0)
            self._key, k_adm = jax.random.split(self._key)
            plen = jnp.asarray([req.prompt_len], jnp.int32)
            temp = jnp.asarray([req.temperature], jnp.float32)
            if req.input_ids is not None:
                self._cache, self._last_tok = _admit_ids(
                    self.params, self._cache, self._last_tok, slot,
                    jnp.asarray(req.input_ids), plen, temp, k_adm,
                    cfg=self.cfg, top_k=self.top_k)
            else:
                self._cache, self._last_tok = _admit_embeds(
                    self.params, self._cache, self._last_tok, slot,
                    jnp.asarray(req.inputs_embeds), jnp.asarray(req.attn_mask),
                    plen, temp, k_adm, cfg=self.cfg, top_k=self.top_k)
            # no host fetch here: the request's first token (sampled in the
            # admit program) arrives through the next decode chunk's outputs
            self._slot_req[slot] = req
            self._active[slot] = True
            self._temp[slot] = req.temperature

    def _decode_and_harvest(self) -> None:
        self._key, k_dec = jax.random.split(self._key)
        self._cache, self._last_tok, toks = _decode_chunk(
            self.params, self._cache, self._last_tok, jnp.asarray(self._active),
            jnp.asarray(self._temp), k_dec, cfg=self.cfg, steps=self.chunk,
            top_k=self.top_k)
        toks = np.asarray(toks)  # [B, chunk] — the per-chunk host sync
        self.stats.decode_chunks += 1
        self.stats.slot_steps += self.slots * self.chunk
        self.stats.busy_steps += int(self._active.sum()) * self.chunk
        for slot in range(self.slots):
            req = self._slot_req[slot]
            if req is None:
                continue
            for t in toks[slot]:
                req.tokens.append(int(t))
                req.future._push(int(t))
                self.stats.tokens_generated += 1
                if (req.eot_token is not None and t == req.eot_token) or \
                        len(req.tokens) >= req.max_new_tokens:
                    break
            if self._finish_if_done(req):
                self._slot_req[slot] = None
                self._active[slot] = False

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

    def __enter__(self) -> "ServingEngine":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()
