"""Training-time token corruption for MaskGIT-style masked-token prediction.

Functional JAX counterpart of the reference masking routine
(reference: data/masking.py:13-94). Fully vectorized — the reference's per-sample
Python loop for contiguous-rectangle masking is replaced by broadcasted-iota
comparisons, so the whole corruption runs on-device inside the jitted train step.

Note: the reference contains a dead branch — ``if config.training.get("noise_type",
"mask")`` is always truthy, so ``random_replace`` is unreachable there
(data/masking.py:73-82). Here ``noise_type`` is honored as evidently intended.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class MaskedTokens(NamedTuple):
    input_ids: Array       # [B, N] corrupted tokens
    labels: Array          # [B, N] targets (-100 on unmasked unless predict_all_tokens)
    loss_weight: Optional[Array]  # [B, N] or None
    mask_prob: Array       # [B] per-sample masking rate


def _loss_weight(t: Array, mask: Array, min_val: float = 0.3) -> Array:
    """Per-token loss weight (reference: data/masking.py:15-16)."""
    return 1.0 - (1.0 - mask) * ((1.0 - t) * (1.0 - min_val))[:, None]


def _random_mask(key: Array, batch_size: int, seq_len: int, num_masked: Array) -> Array:
    """Uniformly-random per-sample mask of ``num_masked`` positions (reference :41-42)."""
    scores = jax.random.uniform(key, (batch_size, seq_len))
    randperm = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)  # rank of each position
    return randperm < num_masked[:, None]


def _contiguous_mask(key: Array, batch_size: int, seq_len: int, num_masked: Array) -> Array:
    """Rectangle mask of ~num_masked tokens on the sqrt(N) grid (reference :44-70)."""
    resolution = int(seq_len ** 0.5)
    k_h, k_sh, k_sw = jax.random.split(key, 3)
    n = num_masked.astype(jnp.int32)
    h_lo = jnp.ceil(n / resolution).astype(jnp.int32)
    h_hi = jnp.minimum(resolution, n)
    # randint in [h_lo, h_hi] inclusive, per-sample
    u = jax.random.uniform(k_h, (batch_size,))
    height = h_lo + (u * (h_hi - h_lo + 1)).astype(jnp.int32)
    height = jnp.minimum(height, resolution)
    width = jnp.minimum(jnp.ceil(n / height).astype(jnp.int32), resolution)
    sh = (jax.random.uniform(k_sh, (batch_size,)) * (resolution - height + 1)).astype(jnp.int32)
    sw = (jax.random.uniform(k_sw, (batch_size,)) * (resolution - width + 1)).astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (batch_size, resolution, resolution), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (batch_size, resolution, resolution), 2)
    in_rect = ((rows >= sh[:, None, None]) & (rows < (sh + height)[:, None, None])
               & (cols >= sw[:, None, None]) & (cols < (sw + width)[:, None, None]))
    return in_rect.reshape(batch_size, seq_len)


def mask_or_random_replace_tokens(
    key: Array,
    image_tokens: Array,
    mask_id: int,
    mask_schedule: Callable[[Array], Array],
    *,
    min_masking_rate: float = 0.0,
    mask_contiguous_region_prob: Optional[float] = None,
    noise_type: str = "mask",
    predict_all_tokens: bool = False,
    codebook_size: int = 8192,
    eval_mask_ratios: Optional[list] = None,
    is_train: bool = True,
    ignore_id: int = -100,
) -> MaskedTokens:
    """Corrupt VQ tokens for masked-token training (reference: data/masking.py:13-94).

    Args:
      key: PRNG key (replaces the reference's global torch/python RNG state).
      image_tokens: [B, N] int token grid.
      mask_id: token id used for masked positions.
      mask_schedule: t -> mask probability (see ops.sampling.get_mask_schedule).
    """
    batch_size, seq_len = image_tokens.shape
    k_t, k_choice, k_mask, k_replace, k_eval = jax.random.split(key, 5)

    if not is_train and eval_mask_ratios:
        ratios = jnp.asarray(eval_mask_ratios)
        idx = jax.random.randint(k_eval, (batch_size,), 0, len(eval_mask_ratios))
        mask_prob = ratios[idx]
    else:
        timesteps = jax.random.uniform(k_t, (batch_size,))
        mask_prob = mask_schedule(timesteps)
        mask_prob = jnp.clip(mask_prob, min=min_masking_rate)

    num_token_masked = jnp.clip(jnp.round(seq_len * mask_prob), min=1.0)

    if mask_contiguous_region_prob is None or mask_contiguous_region_prob == 0.0:
        mask = _random_mask(k_mask, batch_size, seq_len, num_token_masked)
    else:
        use_contiguous = jax.random.uniform(k_choice, ()) < mask_contiguous_region_prob
        mask = jax.lax.cond(
            use_contiguous,
            lambda: _contiguous_mask(k_mask, batch_size, seq_len, num_token_masked),
            lambda: _random_mask(k_mask, batch_size, seq_len, num_token_masked),
        )

    if noise_type == "mask":
        input_ids = jnp.where(mask, mask_id, image_tokens)
    elif noise_type == "random_replace":
        random_tokens = jax.random.randint(k_replace, image_tokens.shape, 0, codebook_size,
                                           dtype=image_tokens.dtype)
        input_ids = jnp.where(mask, random_tokens, image_tokens)
    else:
        raise ValueError(f"noise_type {noise_type} not supported")

    if predict_all_tokens or noise_type == "random_replace":
        labels = image_tokens
        loss_weight = _loss_weight(mask_prob, mask.astype(jnp.float32))
    else:
        labels = jnp.where(mask, image_tokens, ignore_id)
        loss_weight = None

    return MaskedTokens(input_ids, labels, loss_weight, mask_prob)
