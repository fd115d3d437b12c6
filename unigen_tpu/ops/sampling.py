"""Sampling primitives for MaskGIT-style parallel decoding and text generation.

Pure-functional JAX counterparts of the reference sampling library
(reference: models/sampling.py:20-128). All randomness is threaded through explicit
``jax.random`` keys so samplers can run inside ``lax.scan`` and stay deterministic
given a seed — the reference relies on stateful ``torch.Generator`` instead.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_LOG_EPS = 1e-20


def safe_log(t: Array, eps: float = _LOG_EPS) -> Array:
    """log with the input clamped away from zero (reference: models/sampling.py:20-21)."""
    return jnp.log(jnp.clip(t, min=eps))


def gumbel_noise(key: Array, shape, dtype=jnp.float32) -> Array:
    """Standard Gumbel noise -log(-log(U)) (reference: models/sampling.py:24-26).

    Uses U ~ uniform[0, 1) like the reference's ``.uniform_(0, 1)``.
    """
    u = jax.random.uniform(key, shape, dtype=dtype)
    return -safe_log(-safe_log(u))


def gumbel_sample(key: Array, logits: Array, temperature: float = 1.0, axis: int = -1) -> Array:
    """Gumbel-max sampling (reference: models/sampling.py:29-30)."""
    noise = gumbel_noise(key, logits.shape, logits.dtype)
    return jnp.argmax(logits / max(temperature, 1e-10) + noise, axis=axis)


def mask_by_random_topk(key: Array, mask_len: Array, probs: Array,
                        temperature: Array | float = 1.0,
                        noise: Optional[Array] = None) -> Array:
    """Choose which positions to re-mask for the next MaskGIT step.

    Adds Gumbel noise to log-confidences and masks the ``mask_len`` lowest ones
    (reference: models/sampling.py:41-46, itself MaskGIT's confidence-based re-masking).

    Args:
      key: PRNG key.
      mask_len: [B, 1] int — number of tokens to re-mask per sample.
      probs: [B, N] — confidence of the sampled token at each position.
      temperature: scalar noise temperature (already annealed by the caller).
      noise: optional pre-drawn uniform[0,1) noise [B, N] used instead of the key
        (the shared-noise hook for cross-framework token-parity tests).

    Returns:
      [B, N] bool — True where the token should be re-masked.
    """
    g = (-safe_log(-safe_log(noise.astype(probs.dtype))) if noise is not None
         else gumbel_noise(key, probs.shape, probs.dtype))
    confidence = safe_log(probs) + temperature * g
    sorted_confidence = jnp.sort(confidence, axis=-1)
    cut_off = jnp.take_along_axis(sorted_confidence, mask_len.astype(jnp.int32), axis=-1)
    return confidence < cut_off


# ---------------------------------------------------------------------------
# Mask-ratio schedules (reference: models/sampling.py:49-88)
# ---------------------------------------------------------------------------

def cosine_schedule(t: Array) -> Array:
    return jnp.cos(t * math.pi * 0.5)


def linear_schedule(t: Array) -> Array:
    return jnp.clip(1.0 - t, 1e-6, 1.0)


def pow_schedule(t: Array, exponent: float) -> Array:
    return jnp.clip(1.0 - t ** exponent, 1e-6, 1.0)


def sigmoid_schedule(t: Array, start: float = -3.0, end: float = 3.0, tau: float = 1.0,
                     clip_min: float = 1e-6) -> Array:
    v_start = jax.nn.sigmoid(jnp.asarray(start / tau))
    v_end = jax.nn.sigmoid(jnp.asarray(end / tau))
    output = jax.nn.sigmoid((t * (end - start) + start) / tau)
    output = (v_end - output) / (v_end - v_start)
    return jnp.clip(output, clip_min, 1.0)


def get_mask_schedule(method: str, **schedule_kwargs) -> Callable[[Array], Array]:
    """Dispatch by name (reference: models/sampling.py:78-88, incl. the 'powN' spelling)."""
    if method == "cosine":
        return cosine_schedule
    if method == "linear":
        return linear_schedule
    if "pow" in method:
        exponent = float(method.replace("pow", ""))
        return partial(pow_schedule, exponent=exponent)
    if method == "sigmoid":
        return partial(sigmoid_schedule, **schedule_kwargs)
    raise ValueError(f"Unknown schedule method: {method}")


# ---------------------------------------------------------------------------
# Logit filtering (reference: models/sampling.py:33-38, 90-128)
# ---------------------------------------------------------------------------

def top_k_by_threshold(logits: Array, thres: float = 0.9) -> Array:
    """Keep the top ceil((1-thres)*V) logits, -inf elsewhere (reference :33-38)."""
    v = logits.shape[-1]
    k = math.ceil((1.0 - thres) * v)
    kth = jnp.sort(logits, axis=-1)[..., v - k]
    return jnp.where(logits >= kth[..., None], logits, -jnp.inf)


def top_k_top_p_filtering(
    logits: Array,
    top_k: int = 0,
    top_p: float = 1.0,
    filter_value: float = -jnp.inf,
    min_tokens_to_keep: int = 1,
) -> Array:
    """Top-k / nucleus filtering (reference: models/sampling.py:90-128).

    Static-shape friendly: both filters are computed with sorts + thresholds instead
    of scatters, which XLA compiles to a single fused kernel.
    """
    vocab = logits.shape[-1]
    if top_k > 0:
        k = min(max(top_k, min_tokens_to_keep), vocab)
        kth_value = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth_value, filter_value, logits)

    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cumulative_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # Identical shift semantics to the reference: keep the first token above the
        # threshold, always keep at least min_tokens_to_keep.
        sorted_remove = cumulative_probs > top_p
        sorted_remove = jnp.concatenate(
            [jnp.zeros_like(sorted_remove[..., :1]), sorted_remove[..., :-1]], axis=-1)
        if min_tokens_to_keep > 1:
            sorted_remove = sorted_remove.at[..., :min_tokens_to_keep].set(False)
        # Map back to vocab order: a logit is removed iff its rank (in desc order)
        # is a removed rank. Compute per-element rank via comparison against the
        # cutoff logit value at the last kept rank.
        num_keep = jnp.sum(~sorted_remove, axis=-1, keepdims=True)  # [..., 1]
        cutoff = jnp.take_along_axis(sorted_logits, num_keep - 1, axis=-1)
        logits = jnp.where(logits < cutoff, filter_value, logits)
    return logits


def sample_categorical(key: Array, probs: Array, noise: Array = None) -> Array:
    """Sample indices from (possibly unnormalized) probabilities, like torch.multinomial.

    Uses the Gumbel-max trick over log-probs for a single fused XLA kernel.

    ``noise``: optional pre-drawn uniform[0,1) array of probs.shape consumed
    instead of the key — the shared-noise cross-framework parity hook (the same
    pattern as mask_by_random_topk's noise=). Keeps the uniform→Gumbel clamp
    semantics in one place for every sampled-decode call site.
    """
    if noise is not None:
        g = -safe_log(-safe_log(noise.astype(probs.dtype)))
    else:
        g = gumbel_noise(key, probs.shape, probs.dtype)
    return jnp.argmax(safe_log(probs) + g, axis=-1)
