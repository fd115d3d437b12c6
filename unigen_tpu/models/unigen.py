"""UniGen: unified multimodal model = Qwen2.5 backbone + image heads/projectors.

Functional re-design of the reference model wrapper (reference: models/unigen.py:20-588).
The backbone is ``models.qwen2``; this module adds:

* the **unified vocabulary**: ``vocab_size = text_vocab_len + codebook_size + 1``,
  image token i living at ``i + text_vocab_len``, mask token at ``vocab_size - 1``
  (reference: train.py:194-196, unigen.py:90-92);
* the optional **gen projector** path: a separate (codebook+1)-entry embedding +
  MLP for image tokens and a separate ``img_head`` (reference: unigen.py:74-92),
  decoupling image vocab from text vocab;
* the **mm projector** MLP mapping vision-tower features into LLM hidden space
  (reference: unigen.py:119-128);
* the three-task forward computing (loss_t2i, loss_lm, loss_mmu) over one fused
  batch (reference: unigen.py:240-342).

Samplers live in ``generation/`` and are re-exported here under the reference's
method names (t2i_generate / t2i_generate_ar / mmu_generate).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import qwen2
from .qwen2 import Qwen2Config

Array = jax.Array
PyTree = Any


@dataclasses.dataclass(frozen=True)
class UniGenConfig:
    llm: Qwen2Config
    vocab_size: int                    # unified: text_vocab_len + codebook + 1
    llm_vocab_size: int                # original text tokenizer base vocab
    text_vocab_len: int                # len(tokenizer) incl. added specials
    codebook_size: int = 8192
    num_vq_tokens: int = 256
    w_und_encoder: bool = False
    mm_input_dim: int = 1152
    gen_input_dim: int = 16
    und_proj_depth: int = 2
    gen_proj_depth: int = 0
    use_gen_dim: bool = False

    @property
    def mask_token_id(self) -> int:
        """codebook_size with a gen projector, else last unified-vocab id
        (reference: unigen.py:90-92)."""
        return self.codebook_size if self.gen_proj_depth > 0 else self.vocab_size - 1

    @property
    def use_gen_projector(self) -> bool:
        return self.gen_proj_depth > 0

    @classmethod
    def for_qwen25_15b(cls, text_vocab_len: int = 151674, **kw) -> "UniGenConfig":
        """Flagship shape: Qwen2.5-1.5B + 8192-codebook MAGViTv2 (BASELINE.md)."""
        codebook = kw.pop("codebook_size", 8192)
        vocab = text_vocab_len + codebook + 1
        llm = kw.pop("llm", None) or Qwen2Config(vocab_size=vocab)
        return cls(llm=llm, vocab_size=vocab, llm_vocab_size=151643,
                   text_vocab_len=text_vocab_len, codebook_size=codebook, **kw)

    @classmethod
    def tiny(cls, **kw) -> "UniGenConfig":
        codebook = kw.pop("codebook_size", 32)
        text_len = kw.pop("text_vocab_len", 128)
        vocab = text_len + codebook + 1
        llm = kw.pop("llm", None) or Qwen2Config.tiny(vocab_size=vocab)
        defaults = dict(num_vq_tokens=16, mm_input_dim=24, gen_input_dim=8)
        defaults.update(kw)
        return cls(llm=llm, vocab_size=vocab, llm_vocab_size=text_len - 16,
                   text_vocab_len=text_len, codebook_size=codebook, **defaults)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _mlp_init(key, dims, dtype):
    """[Linear, (GELU, Linear)*] parameter stack; dims = [in, h1, ..., out]."""
    ks = jax.random.split(key, len(dims) - 1)
    return [{"kernel": (jax.random.normal(k, (a, b), jnp.float32) * (a ** -0.5)).astype(dtype),
             "bias": jnp.zeros((b,), dtype)}
            for k, a, b in zip(ks, dims[:-1], dims[1:])]


def mlp_apply(layers, x: Array) -> Array:
    """Linear -> (GELU -> Linear)* (reference projector shape, unigen.py:77-88,124-128)."""
    for i, p in enumerate(layers):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)
        x = x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return x


def init(key: Array, cfg: UniGenConfig) -> PyTree:
    k_llm, k_gen, k_genproj, k_imghead, k_mm = jax.random.split(key, 5)
    params: Dict[str, Any] = {"llm": qwen2.init(k_llm, cfg.llm)}
    d, dt = cfg.llm.hidden_size, cfg.llm.dtype
    if cfg.use_gen_projector:
        if cfg.use_gen_dim:
            params["gen_embed"] = {"weight": (jax.random.normal(
                k_gen, (cfg.codebook_size + 1, cfg.gen_input_dim), jnp.float32) * 0.02).astype(dt)}
            dims = [cfg.gen_input_dim] + [d] * cfg.gen_proj_depth
        else:
            params["gen_embed"] = {"weight": (jax.random.normal(
                k_gen, (cfg.codebook_size + 1, d), jnp.float32) * 0.02).astype(dt)}
            dims = [d, 2 * d] + [d] * (cfg.gen_proj_depth - 1)
        params["gen_projector"] = _mlp_init(k_genproj, dims, dt)
        params["img_head"] = {"kernel": (jax.random.normal(
            k_imghead, (d, cfg.codebook_size), jnp.float32) * 0.02).astype(dt)}
    if cfg.w_und_encoder:
        depth = max(2, cfg.und_proj_depth)
        params["mm_projector"] = _mlp_init(k_mm, [cfg.mm_input_dim] + [d] * depth, dt)
    return params


# ---------------------------------------------------------------------------
# Embedding helpers
# ---------------------------------------------------------------------------

def get_gen_embed(params: PyTree, img_tokens: Array) -> Array:
    """(codebook+1)-space image tokens -> LLM hidden embeddings (reference :130-131)."""
    e = jnp.take(params["gen_embed"]["weight"], img_tokens, axis=0)
    return mlp_apply(params["gen_projector"], e)


def mm_project(params: PyTree, image_feats: Array) -> Array:
    """Vision-tower features -> LLM hidden space (reference :146)."""
    return mlp_apply(params["mm_projector"], image_feats)


def embed_tokens(params: PyTree, input_ids: Array) -> Array:
    return qwen2.embed(params["llm"], input_ids)


def prepare_inputs_for_t2i(params: PyTree, cfg: UniGenConfig, input_ids: Array) -> Array:
    """Token embeddings with the trailing image block routed through the gen
    projector when enabled (reference: unigen.py:230-238)."""
    embeds = embed_tokens(params, input_ids)
    if cfg.use_gen_projector:
        n = cfg.num_vq_tokens
        img = get_gen_embed(params, input_ids[:, -(n + 1):-1])
        embeds = jax.lax.dynamic_update_slice(
            embeds, img.astype(embeds.dtype), (0, embeds.shape[1] - n - 1, 0))
    return embeds


# ---------------------------------------------------------------------------
# Forward (training losses)
# ---------------------------------------------------------------------------

def _cross_entropy(logits: Array, labels: Array, ignore_id: int = -100) -> Array:
    """Mean CE over non-ignored positions, fp32 (== torch F.cross_entropy)."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_id
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, nll, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


def _chunked_label_logps(hidden: Array, w: Array, labels: Array, *,
                         ignore_id: int = -100, chunk: int = 64,
                         per_row: bool = False):
    """(sum of label log-probs, valid count) projecting hidden -> vocab
    chunk-by-chunk along the sequence; scalar totals, or per-row with
    ``per_row``.

    The unified 160k vocabulary makes full [B, L, V] fp32 logits the dominant
    training allocation (SURVEY.md §7 hard part 3: ~1.25GB per 5x391 batch on
    one chip); scanning sequence chunks with rematerialization keeps peak
    logits memory at [B, chunk, V] while matching the dense computation
    exactly (same bf16 matmul -> fp32 log_softmax; fp32 accumulation). The
    shared core of ``_chunked_ce`` (training CE) and DPO's
    ``get_batch_logps_from_hidden``."""
    b, l, d = hidden.shape
    pad = (-l) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=ignore_id)
    n_chunks = (l + pad) // chunk
    h = hidden.reshape(b, n_chunks, chunk, d).swapaxes(0, 1)   # [C, B, chunk, D]
    lab = labels.reshape(b, n_chunks, chunk).swapaxes(0, 1)
    axis = -1 if per_row else None
    shape = (b,) if per_row else ()

    @jax.checkpoint
    def body(carry, xs):
        total, count = carry
        h_c, lab_c = xs
        logits = (h_c @ w.astype(h_c.dtype)).astype(jnp.float32)
        valid = lab_c != ignore_id
        safe = jnp.where(valid, lab_c, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return (total + jnp.sum(jnp.where(valid, tok, 0.0), axis=axis),
                count + jnp.sum(valid, axis=axis)), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.int32)),
        (h, lab))
    return total, count


def _chunked_ce(hidden: Array, w: Array, labels: Array, ignore_id: int = -100,
                chunk: int = 64) -> Array:
    """Mean CE over non-ignored positions, chunked (== ``_cross_entropy``)."""
    total, count = _chunked_label_logps(hidden, w, labels, ignore_id=ignore_id,
                                        chunk=chunk)
    return -total / jnp.maximum(count, 1)


def forward(
    params: PyTree,
    cfg: UniGenConfig,
    *,
    input_ids: Optional[Array] = None,
    input_embeddings: Optional[Array] = None,
    attention_mask: Optional[Array] = None,   # [B,1,L,L] bool
    attn_meta=None,                           # ops.masks.AttnMeta (flash path)
    labels: Optional[Array] = None,
    batch_size_t2i: int = 0,
    batch_size_lm: int = 0,
    batch_size_mmu: int = 0,
    t2i_mode: str = "mask",
    remat: bool = False,
    memory_efficient_loss: bool = False,
    return_hidden: bool = False,
    positions: Optional[Array] = None,   # [B, L] RoPE positions (left-pad aware)
):
    """Unified forward (reference: unigen.py:240-342).

    Without labels: returns logits (img_logits when the gen projector is active and
    the whole batch is t2i). With labels: returns (logits, loss_t2i, loss_lm,
    loss_mmu) where each loss is computed on its batch slice. With
    ``return_hidden``: returns the final hidden states instead of projecting to
    logits — callers that only need a slice of the vocab projection (e.g. DPO's
    trailing VQ block) can avoid materializing the [B, L, 160k] logits tensor.
    """
    n = cfg.num_vq_tokens
    use_gen = cfg.use_gen_projector and batch_size_t2i > 0

    if input_embeddings is None:
        input_embeddings = embed_tokens(params, input_ids)
        if use_gen:
            # route ONLY the t2i rows' trailing image block through the gen
            # projector (the reference applies it to the whole batch and relies on
            # callers pre-building embeddings for mixed batches, unigen.py:255-259;
            # restricting to [:batch_size_t2i] is correct for both cases)
            img = get_gen_embed(params, input_ids[:batch_size_t2i, -(n + 1):-1])
            input_embeddings = jax.lax.dynamic_update_slice(
                input_embeddings, img.astype(input_embeddings.dtype),
                (0, input_embeddings.shape[1] - n - 1, 0))

    hidden, _ = qwen2.forward(params["llm"], cfg.llm, inputs_embeds=input_embeddings,
                              mask=attention_mask, meta=attn_meta, remat=remat,
                              positions=positions)

    if return_hidden:
        return hidden

    if memory_efficient_loss and labels is not None and not use_gen:
        # chunked CE straight from hidden states: the [B, L, 160k] fp32 logits
        # tensor never materializes (lets the flagship train on small-HBM chips)
        w = qwen2.lm_head_weight(params["llm"], cfg.llm)
        bt, bl, bm = batch_size_t2i, batch_size_lm, batch_size_mmu
        loss_t2i = jnp.zeros((), jnp.float32)
        if bt > 0:
            if t2i_mode == "mask":
                loss_t2i = _chunked_ce(hidden[:bt, -(n + 1):-1], w,
                                       labels[:bt, -(n + 1):-1])
            else:
                loss_t2i = _chunked_ce(hidden[:bt, -(n + 2):-1], w,
                                       labels[:bt, -(n + 1):])
        loss_lm = jnp.zeros((), jnp.float32)
        if bl > 0:
            loss_lm = _chunked_ce(hidden[bt:bt + bl, :-1], w, labels[bt:bt + bl, 1:])
        loss_mmu = jnp.zeros((), jnp.float32)
        if bm > 0:
            loss_mmu = _chunked_ce(hidden[-bm:, :-1], w, labels[-bm:, 1:])
        return None, loss_t2i, loss_lm, loss_mmu

    if use_gen:
        img_logits = hidden[:batch_size_t2i] @ params["img_head"]["kernel"].astype(hidden.dtype)
        if labels is None:
            return img_logits
        logits = qwen2.logits(params["llm"], cfg.llm, hidden[batch_size_t2i:])
        lm_start = 0
    else:
        img_logits = None
        logits = qwen2.logits(params["llm"], cfg.llm, hidden)
        if labels is None:
            return logits
        lm_start = batch_size_t2i

    # 1. masked-token (or AR) image loss on the trailing VQ block
    loss_t2i = jnp.zeros((), jnp.float32)
    if batch_size_t2i > 0:
        src = img_logits if img_logits is not None else logits[:batch_size_t2i]
        if t2i_mode == "mask":
            loss_t2i = _cross_entropy(src[:, -(n + 1):-1],
                                      labels[:batch_size_t2i, -(n + 1):-1])
        elif t2i_mode == "ar":
            loss_t2i = _cross_entropy(src[:, -(n + 2):-1],
                                      labels[:batch_size_t2i, -(n + 1):])
        else:
            raise ValueError(t2i_mode)

    # 2. next-token LM loss
    loss_lm = jnp.zeros((), jnp.float32)
    if batch_size_lm > 0:
        loss_lm = _cross_entropy(
            logits[lm_start:lm_start + batch_size_lm, :-1],
            labels[batch_size_t2i:batch_size_t2i + batch_size_lm, 1:])

    # 3. next-token understanding loss
    loss_mmu = jnp.zeros((), jnp.float32)
    if batch_size_mmu > 0:
        loss_mmu = _cross_entropy(logits[-batch_size_mmu:, :-1],
                                  labels[-batch_size_mmu:, 1:])

    return (img_logits if img_logits is not None else logits), loss_t2i, loss_lm, loss_mmu
