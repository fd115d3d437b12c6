"""Attention-mask construction for the unified text/image token sequences.

TPU-first redesign of the reference's materialized [B,1,L,L] additive float masks
(reference: training/prompting_utils.py:975-1074). Two representations:

1. ``AttnMeta`` — three per-token boolean vectors from which visibility is computed
   on the fly inside the attention kernel:

       visible(q, k) = ~pad[q] & ~pad[k] & (k <= q  |  bidir_q[q]  |  bidir_k[k])

   * ``bidir_q[q]``: query is inside an image segment being *generated* — it may
     attend to every non-pad token (the t2i omni mask's bidirectional image block,
     reference :990-1011).
   * ``bidir_k[k]``: key is inside a *prefix* image block every later query may see
     (the mmu prefix-LM mask, reference :1023-1036).

   This is O(B·L) memory instead of O(B·L²) and never leaves the kernel.

2. Boolean [B, 1, L, L] builders with the exact reference semantics (including the
   rm_pad_in_image quirks) for the XLA fallback path and for golden tests.

All builders return *boolean* masks (True = visible); converting to the additive
-inf form is the attention wrapper's job, not the mask builder's.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class AttnMeta(NamedTuple):
    """Per-token attention metadata; the kernel-side replacement for [L,L] masks.

    ``seg`` (optional) carries per-token segment ids for SEQUENCE-PACKED rows
    (training/sft.py::loss_packed): attention is confined to same-segment
    pairs, giving block-diagonal masks without materializing them. None means
    one segment per row (the common case; zero cost in the kernel bitfield).
    """
    pad: Array      # [B, L] bool — token is padding
    bidir_q: Array  # [B, L] bool — query attends bidirectionally (t2i image block)
    bidir_k: Array  # [B, L] bool — key visible to all queries (mmu image prefix)
    seg: Optional[Array] = None  # [B, L] int32 — packed-segment id (None = single)

    def visibility(self) -> Array:
        """Materialize [B, 1, L, L] bool. For the XLA path; kernels use the vectors."""
        q_pos = jnp.arange(self.pad.shape[-1])
        causal = q_pos[:, None] >= q_pos[None, :]
        vis = causal[None] | self.bidir_q[:, :, None] | self.bidir_k[:, None, :]
        vis = vis & ~self.pad[:, :, None] & ~self.pad[:, None, :]
        if self.seg is not None:
            vis = vis & (self.seg[:, :, None] == self.seg[:, None, :])
        return vis[:, None]


def image_segments(input_ids: Array, soi_id: int, eoi_id: int) -> Array:
    """[B, L] bool — token lies in an [soi..eoi] image segment, inclusive
    (reference: prompting_utils.py:983-990)."""
    is_soi = input_ids == soi_id
    is_eoi = input_ids == eoi_id
    cum_soi = jnp.cumsum(is_soi, axis=1)
    cum_eoi = jnp.cumsum(is_eoi, axis=1)
    return (cum_soi > cum_eoi) | is_soi | is_eoi


def lm_attn_meta(input_ids: Array, pad_id: int) -> AttnMeta:
    """Plain causal with pad exclusion as metadata."""
    pad = input_ids == pad_id
    z = jnp.zeros_like(pad)
    return AttnMeta(pad=pad, bidir_q=z, bidir_k=z)


def concat_meta(*metas: AttnMeta) -> AttnMeta:
    """Concatenate per-task metadata along the batch dim — the fused multi-task
    batch (t2i omni + lm causal + mmu prefix) runs under ONE attention kernel."""
    seg = None
    if any(m.seg is not None for m in metas):
        seg = jnp.concatenate(
            [m.seg if m.seg is not None else jnp.zeros_like(m.pad, jnp.int32)
             for m in metas], axis=0)
    return AttnMeta(pad=jnp.concatenate([m.pad for m in metas], axis=0),
                    bidir_q=jnp.concatenate([m.bidir_q for m in metas], axis=0),
                    bidir_k=jnp.concatenate([m.bidir_k for m in metas], axis=0),
                    seg=seg)


def t2i_attn_meta(input_ids: Array, pad_id: int, soi_id: int, eoi_id: int) -> AttnMeta:
    """Metadata equivalent of the t2i omni mask: causal text, bidirectional image."""
    in_img = image_segments(input_ids, soi_id, eoi_id)
    pad = input_ids == pad_id
    return AttnMeta(pad=pad, bidir_q=in_img & ~pad, bidir_k=jnp.zeros_like(pad))


def mmu_attn_meta(input_ids: Array, pad_id: int, soi_id: int, eoi_id: int) -> AttnMeta:
    """Metadata equivalent of the mmu mask: causal + fully-visible prefix.

    Matches create_attention_mask_for_mmu: every column up to and including the
    first <|eoi|> (task tokens + image block) is visible to all queries
    (reference: prompting_utils.py:1026-1027 sets ``[..., :eoi_pos+1] = 1``).
    """
    pad = input_ids == pad_id
    pos = jnp.arange(input_ids.shape[-1])[None, :]
    eoi_pos = jnp.argmax(input_ids == eoi_id, axis=-1, keepdims=True)
    prefix = pos <= eoi_pos
    return AttnMeta(pad=pad, bidir_q=jnp.zeros_like(pad), bidir_k=prefix & ~pad)


def mmu_vit_attn_meta(
    batch_size: int,
    seq_len: int,
    *,
    num_tokens: "int | Array",
    prefix_length: int,
    prompt_len: Optional[Array] = None,
) -> AttnMeta:
    """Metadata form of create_attention_mask_for_mmu_vit + the prompt-length
    keep mask that training/sft.py ANDs on top (reference mmu_vit mask,
    prompting_utils.py:1038-1074): bidir_k on the continuous-image block,
    pad beyond each row's valid prompt length.

    Loss-equivalent to the dense builder (pad rows see nothing here vs their
    own causal prefix there — those rows carry -100 labels and no real query
    attends to pad keys either way); exactness vs the dense path is asserted by
    tests/test_training.py's SFT flash parity tests on losses and gradients.
    """
    pos = jnp.arange(seq_len)
    if isinstance(num_tokens, int):
        img_len = jnp.full((batch_size,), num_tokens, jnp.int32)
    else:  # [B, 2] NaFlex spatial shapes
        img_len = num_tokens[:, 0] * num_tokens[:, 1]
    block = (pos[None] >= prefix_length) & (pos[None] < prefix_length + img_len[:, None])
    if prompt_len is None:
        pad = jnp.zeros((batch_size, seq_len), bool)
    else:
        pad = pos[None] >= prompt_len[:, None]
    return AttnMeta(pad=pad, bidir_q=jnp.zeros_like(pad), bidir_k=block & ~pad)


# ---------------------------------------------------------------------------
# Exact-semantics boolean builders (golden-tested against a python oracle)
# ---------------------------------------------------------------------------

def create_attention_mask_predict_next(
    input_ids: Array,
    pad_id: int,
    soi_id: int,
    eoi_id: int,
    rm_pad_in_image: bool = False,
) -> Array:
    """The t2i 'omni' block mask (reference: prompting_utils.py:975-1020).

    Text tokens are causal; tokens inside [soi..eoi] image segments attend to every
    token (bidirectionally); with ``rm_pad_in_image`` the left-padding columns are
    removed for post-pad text rows and for image rows at/after the soi position.

    Returns [B, 1, L, L] bool (True = visible). The reference returns the additive
    inverted form; use ``ops.attention`` to apply either representation.
    """
    n, l = input_ids.shape
    is_pad = input_ids == pad_id
    in_img = image_segments(input_ids, soi_id, eoi_id)
    is_text = ~in_img

    pos = jnp.arange(l)
    causal = pos[:, None] >= pos[None, :]                    # [L, L]
    mask_text = is_text[:, :, None] & causal[None]           # [B, L, L]
    mask_bi = jnp.ones((n, l, l), dtype=bool)

    if rm_pad_in_image:
        has_pad = is_pad.any(axis=1)
        # last padding index per row (left padding) — argmax of reversed pad flags
        last_pad = (l - 1) - jnp.argmax(is_pad[:, ::-1], axis=1)
        # text rows strictly after the padding stop attending to the padding block
        q_after_pad = pos[None, :, None] > last_pad[:, None, None]
        k_in_pad_block = pos[None, None, :] <= last_pad[:, None, None]
        rm_text = has_pad[:, None, None] & q_after_pad & k_in_pad_block
        mask_text = mask_text & ~rm_text
        # image rows (at/after soi) stop attending to padding columns
        soi_pos = jnp.argmax(input_ids == soi_id, axis=1)
        q_after_soi = pos[None, :, None] >= soi_pos[:, None, None]
        rm_img = q_after_soi & is_pad[:, None, :]
        mask_bi = mask_bi & ~rm_img

    mask = jnp.where(in_img[:, :, None], mask_bi, mask_text)
    return mask[:, None]


def create_attention_mask_for_mmu(input_ids: Array, eoi_id: int) -> Array:
    """Causal mask + full attention onto the [.. eoi] image prefix
    (reference: prompting_utils.py:1023-1036).

    The reference uses row 0's first-eoi position for the whole batch (its layouts
    are uniform); here the eoi position is resolved per-row, which is identical for
    uniform layouts and correct for ragged ones.
    """
    n, l = input_ids.shape
    pos = jnp.arange(l)
    causal = pos[:, None] >= pos[None, :]
    eoi_pos = jnp.argmax(input_ids == eoi_id, axis=1)        # first eoi per row
    prefix = pos[None, None, :] <= eoi_pos[:, None, None]
    mask = causal[None] | prefix
    return mask[:, None]


def create_attention_mask_for_mmu_vit(
    batch_size: int,
    seq_len: int,
    *,
    system_prompt_len: int = 0,
    num_images: int = 1,
    num_tokens: int | Array = 576,
    prefix_length: int = -1,
    return_causal_mask: bool = False,
) -> Array:
    """Causal + bidirectional continuous-image block for the SigLIP path
    (reference: prompting_utils.py:1038-1074). ``num_tokens`` may be an int or a
    [B, 2] spatial_shapes array (NaFlex variable-length images).

    Reference-faithful quirk: in the [B, 2] NaFlex case only the bidirectional
    block is trimmed to each row's valid patch count — pad-patch slots
    [start+img_lens, start+P) remain causally visible as *keys* to later
    tokens, exactly as in the reference's tril-based builder (its loop at
    :1061-1065 narrows the `= 1` block only). Golden-tested against the
    reference; callers wanting stricter padding must mask those slots in the
    1D attention themselves.
    """
    pos = jnp.arange(seq_len)
    causal = (pos[:, None] >= pos[None, :])[None, None]      # [1,1,L,L]
    causal = jnp.broadcast_to(causal, (batch_size, 1, seq_len, seq_len))
    if return_causal_mask:
        return causal
    start = prefix_length if prefix_length > 0 else 1 + system_prompt_len + 1
    if isinstance(num_tokens, (int,)):
        end = start + num_tokens * num_images
        block = (pos >= start) & (pos < end)                  # [L]
        return causal | block[None, None, None, :]
    img_lens = num_tokens[:, 0] * num_tokens[:, 1]            # [B]
    block = (pos[None] >= start) & (pos[None] < (start + img_lens)[:, None])  # [B, L]
    return causal | block[:, None, None, :]


def causal_mask_from_attention(attention_1d: Array) -> Array:
    """[B, L] 0/1 padding mask -> [B, 1, L, L] bool causal mask (the reference's
    plain-causal path, e.g. lm task with use_causal_mask, train.py:588-589)."""
    l = attention_1d.shape[-1]
    pos = jnp.arange(l)
    causal = pos[:, None] >= pos[None, :]
    keep = attention_1d.astype(bool)
    return (causal[None] & keep[:, None, :] & keep[:, :, None])[:, None]


def to_additive(mask_bool: Array, dtype=jnp.float32) -> Array:
    """Boolean mask -> additive form (0 where visible, large-negative elsewhere)."""
    neg = jnp.finfo(dtype).min
    return jnp.where(mask_bool, jnp.zeros((), dtype), jnp.asarray(neg, dtype))
