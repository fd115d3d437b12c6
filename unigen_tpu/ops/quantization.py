"""Int8 weight/activation quantization for the backbone's dense layers.

The v5e MXU runs int8 matmuls at ~2x the bf16 rate; since the GenEval-protocol
sampler is already at ~85% of the bf16 roofline, W8A8 is the remaining big
throughput lever. Scheme:

* **weights**: per-output-channel symmetric int8 (`w ≈ w_int8 * scale[out]`),
  quantized once offline by ``quantize_params``;
* **activations**: dynamic per-token symmetric int8 at each layer input —
  no calibration pass needed;
* accumulation in int32 on the MXU, dequantized with the fused
  ``(act_scale[token] * weight_scale[out])`` outer product.

``quantize_qwen2_params`` covers the transformer dense layers (q/k/v/o,
gate/up/down); embeddings, norms and the attention math stay bf16/fp32.
``quantize_unigen_params(..., cfg)`` additionally adds int8 copies of the
8k-wide image head, and ``lm_head=True`` of the full text head — these DO
move the heads onto the int8 path, which can flip borderline sampled tokens;
the per-step token-agreement and confidence-ordering gates in
tests/test_quantization.py bound that effect and justify the int8 defaults.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array
PyTree = Any

_QUANT_KEY = "kernel_int8"


def quantize_dense(p: dict) -> dict:
    """{'kernel': [in, out], 'bias'?} -> int8 form with per-out-channel scales."""
    w = p["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    w_int8 = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {_QUANT_KEY: w_int8, "scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    for k in p:  # QLoRA: bf16 adapter leaves ride along untouched
        if k.startswith("lora_"):
            out[k] = p[k]
    return out


def quantize_activations(x: Array):
    """Dynamic per-token symmetric int8: (x_int8, act_scale [..., 1] fp32).

    Factored out so layers with a shared input (q/k/v; gate/up) quantize it once.
    """
    xf = x.astype(jnp.float32)
    act_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    act_scale = jnp.maximum(act_scale, 1e-8)
    x_int8 = jnp.clip(jnp.round(xf / act_scale), -127, 127).astype(jnp.int8)
    return x_int8, act_scale


def dense_int8_prequant(p: dict, x_int8: Array, act_scale: Array, out_dtype) -> Array:
    """W8A8 matmul over pre-quantized activations."""
    acc = jax.lax.dot_general(
        x_int8, p[_QUANT_KEY],
        dimension_numbers=(((x_int8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * act_scale * p["scale"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(out_dtype)


def dense_int8(p: dict, x: Array) -> Array:
    """W8A8 matmul with dynamic per-token activation scales; returns x.dtype."""
    x_int8, act_scale = quantize_activations(x)
    return dense_int8_prequant(p, x_int8, act_scale, x.dtype)


def is_quantized(p: dict) -> bool:
    return isinstance(p, dict) and _QUANT_KEY in p


def quantize_qwen2_params(params: PyTree) -> PyTree:
    """Quantize every transformer dense layer of a Qwen2 param tree (stacked
    layers included: per-layer, per-channel scales via vmap)."""
    out = dict(params)
    layers = dict(params["layers"])

    def q_stacked(p):
        return jax.vmap(quantize_dense)(p)

    attn = dict(layers["attn"])
    for name in ("q", "k", "v", "o"):
        attn[name] = q_stacked(attn[name])
    mlp = dict(layers["mlp"])
    for name in ("gate", "up", "down"):
        mlp[name] = q_stacked(mlp[name])
    layers["attn"] = attn
    layers["mlp"] = mlp
    out["layers"] = layers
    return out


def quantize_siglip_params(params: PyTree) -> PyTree:
    """Quantize the SigLIP tower's dense layers (q/k/v/o, fc1/fc2) to W8A8.

    The tower is the measured bottleneck of the lmms end-to-end path (BENCH.md:
    660 tok/s end-to-end vs 5175 decode-only; batch 32 regresses because the
    729-patch prefill outgrows decode amortization). Same scheme as the
    backbone: per-out-channel weight scales, dynamic per-token activation
    scales, int32 MXU accumulation. Patch embed (conv) and layernorms stay in
    the tower dtype — they are a rounding error of the FLOPs. Gated by
    tests/test_quantization.py::test_siglip_int8_feature_agreement."""
    out = dict(params)
    layers = dict(params["layers"])
    attn = dict(layers["attn"])
    for name in ("q", "k", "v", "o"):
        attn[name] = jax.vmap(quantize_dense)(attn[name])
    mlp = dict(layers["mlp"])
    for name in ("fc1", "fc2"):
        mlp[name] = jax.vmap(quantize_dense)(mlp[name])
    layers["attn"] = attn
    layers["mlp"] = mlp
    out["layers"] = layers
    return out


def quantize_lm_head(llm_params: PyTree, llm_cfg) -> PyTree:
    """Add an int8 copy of the (tied) lm_head to a Qwen2 param tree.

    The greedy decode loop reads the full [D, 160k] head every step (~0.5GB
    bf16, ~25% of the loop's HBM traffic at serving batch 8 — BENCH.md decode
    roofline); ``qwen2.logits`` picks up ``lm_head_q`` automatically."""
    from ..models import qwen2
    out = dict(llm_params)
    out["lm_head_q"] = quantize_dense({"kernel": qwen2.lm_head_weight(llm_params, llm_cfg)})
    return out


def quantize_unigen_params(params: PyTree, cfg=None, lm_head: bool = False) -> PyTree:
    """Quantize the backbone inside a UniGen param tree (projectors stay high
    precision — they are a rounding error of the FLOPs).

    With ``cfg`` (a UniGenConfig), also adds ``img_head_q``: a pre-quantized
    copy of the 8k-wide image head (the gen-projector head, or the codebook
    slice of the tied embedding) so the t2i sampler's head matmul rides the
    int8 MXU path too (generation/t2i.py::_image_head). ``lm_head=True``
    (requires cfg) additionally int8-quantizes the full text head for the
    VQA decode loop (see quantize_lm_head)."""
    out = dict(params)
    out["llm"] = quantize_qwen2_params(params["llm"])
    if lm_head and cfg is not None:
        out["llm"] = quantize_lm_head(out["llm"], cfg.llm)
    if cfg is not None:
        if cfg.use_gen_projector:
            head_w = params["img_head"]["kernel"]
        else:
            from ..models import qwen2
            w = qwen2.lm_head_weight(params["llm"], cfg.llm)
            head_w = jax.lax.dynamic_slice_in_dim(
                w, cfg.text_vocab_len, cfg.codebook_size, axis=1)
        out["img_head_q"] = quantize_dense({"kernel": head_w})
    return out
