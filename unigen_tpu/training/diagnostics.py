"""Per-mask-rate-bucket entropy/cross-entropy diagnostics for masked-token training.

Reference: models/training_utils.py:297-432 — bucketed statistics over the image
block: for each masking-rate bucket, the mean prediction entropy and CE of masked
positions (the reference ships this unused; here it is jit-friendly and wired to
the metric logger on demand).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def masked_token_diagnostics(
    logits: Array,        # [B, N, V] image-block logits
    labels: Array,        # [B, N] codebook labels (-100 on unmasked)
    mask_prob: Array,     # [B] per-sample masking rate
    num_buckets: int = 10,
) -> Dict[str, Array]:
    """Returns per-bucket mean entropy / CE / token counts, each [num_buckets]."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(logp)
    entropy = -(probs * logp).sum(-1)                     # [B, N]

    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]  # [B, N]

    bucket = jnp.clip((mask_prob * num_buckets).astype(jnp.int32), 0, num_buckets - 1)
    onehot = jax.nn.one_hot(bucket, num_buckets, dtype=jnp.float32)     # [B, K]

    tok_per_sample = valid.sum(-1).astype(jnp.float32)                  # [B]
    ent_per_sample = jnp.where(valid, entropy, 0.0).sum(-1)
    nll_per_sample = jnp.where(valid, nll, 0.0).sum(-1)

    counts = onehot.T @ tok_per_sample                                   # [K]
    ent = onehot.T @ ent_per_sample / jnp.maximum(counts, 1.0)
    ce = onehot.T @ nll_per_sample / jnp.maximum(counts, 1.0)
    return {"bucket_entropy": ent, "bucket_ce": ce, "bucket_tokens": counts}
