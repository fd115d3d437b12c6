"""LoRA / QLoRA parameter-efficient fine-tuning for the Qwen2 backbone.

Beyond-reference (apple/ml-unigen only ships full fine-tuning, with
substring-based freezing in train_w_clip_vit.py:296-312); on TPU the point of
LoRA is memory shape, not just step cost: flagship full SFT needs the 9.3GB
AdamW state plus a full 3.1GB gradient tree (training/sft.py fits it on a
16GB chip only via common-length fusion), while LoRA's optimizer state and
gradients are ~r/d of that — rank 16 over all seven dense families is ~37MB —
so SFT fits trivially and the base weights can additionally be held int8
(QLoRA: frozen ``kernel_int8`` base + bf16 adapters on the residual path).

Design, matching the backbone's stacked-parameter + ``lax.scan`` layout
(models/qwen2.py): adapters are extra leaves *inside* each dense node —
``{"kernel": [n_layers, in, out], "lora_a": [n_layers, in, r],
"lora_b": [n_layers, r, out], "lora_scale": [n_layers]}`` — so the existing
layer scans slice them per layer with zero new plumbing, ``qwen2._dense``
adds the low-rank path ``y += ((x @ a) @ b) * scale`` wherever the leaves are
present (bf16 and int8 base kernels alike), sharding specs fall out of the
same tree rules, and the optimizer trains them via
``optimizer.trainable_mask(params, ["lora_"])``.

Standard LoRA semantics (Hu et al., arXiv:2106.09685): ``a`` Gaussian-init,
``b`` zero-init (adapted model == base model at step 0), effective update
``W + (alpha/r) * a @ b``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
PyTree = Any

# every dense family in a Qwen2 layer; subsets like ("attn/q", "attn/v")
# mirror the common attention-only recipe
DEFAULT_TARGETS: Tuple[str, ...] = (
    "attn/q", "attn/k", "attn/v", "attn/o", "mlp/gate", "mlp/up", "mlp/down")


def _node(tree: dict, path: str) -> dict:
    for part in path.split("/"):
        tree = tree[part]
    return tree


def _dense_dims(p: dict) -> Tuple[int, int, int]:
    """(n_layers, in_dim, out_dim) of a stacked dense node (bf16 or int8)."""
    w = p["kernel"] if "kernel" in p else p["kernel_int8"]
    return w.shape[0], w.shape[1], w.shape[2]


def add_lora(
    llm_params: PyTree,
    key: Array,
    rank: int,
    *,
    alpha: Optional[float] = None,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype: Any = jnp.bfloat16,
) -> PyTree:
    """Insert zero-effect LoRA leaves into the stacked layer tree.

    ``llm_params`` is a Qwen2 param tree (``init`` / ``convert_hf_state_dict``
    output, optionally already int8-quantized for QLoRA). Returns a new tree;
    the input is not mutated. ``alpha`` defaults to ``rank`` (scale 1.0).
    """
    if rank <= 0:
        raise ValueError(f"LoRA rank must be positive, got {rank}")
    scale = (alpha if alpha is not None else float(rank)) / float(rank)
    out = jax.tree.map(lambda x: x, llm_params)  # shallow-copy every dict level
    layers = out["layers"]
    keys = jax.random.split(key, len(targets))
    for tgt, k in zip(targets, keys):
        p = _node(layers, tgt)
        n_layers, d_in, d_out = _dense_dims(p)
        # per-layer independent init, matching torch LoRA's kaiming-ish a
        a = jax.random.normal(k, (n_layers, d_in, rank), jnp.float32) * (d_in ** -0.5)
        p["lora_a"] = a.astype(dtype)
        p["lora_b"] = jnp.zeros((n_layers, rank, d_out), dtype)
        p["lora_scale"] = jnp.full((n_layers,), scale, jnp.float32)
    return out


def strip_lora(llm_params: PyTree) -> PyTree:
    """Remove every LoRA leaf (back to the frozen base)."""
    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        return {k: walk(v) for k, v in tree.items() if not k.startswith("lora_")}
    return walk(llm_params)


def merge_lora(llm_params: PyTree) -> PyTree:
    """Fold ``kernel += scale * a @ b`` and strip the adapter leaves.

    The merged tree is a plain base tree: zero inference overhead, exported
    through the normal persistence/quantization paths. Int8 base kernels
    cannot be merged in place (the fold would change the quantization grid) —
    merge the bf16 tree first, then re-quantize.
    """
    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if "lora_a" in tree:
            if "kernel" not in tree:
                raise ValueError(
                    "merge_lora on an int8-only node: merge before quantizing "
                    "(or keep the adapters on the runtime path)")
            a = tree["lora_a"].astype(jnp.float32)
            b = tree["lora_b"].astype(jnp.float32)
            s = tree["lora_scale"].astype(jnp.float32)
            delta = jnp.einsum("lir,lro->lio", a, b) * s[:, None, None]
            out = {k: v for k, v in tree.items() if not k.startswith("lora_")}
            out["kernel"] = (tree["kernel"].astype(jnp.float32)
                             + delta).astype(tree["kernel"].dtype)
            return out
        return {k: walk(v) for k, v in tree.items()}
    return walk(llm_params)


def lora_tunable_parts() -> Tuple[str, ...]:
    """The ``tunable_parts`` entry that freezes everything but the adapters
    (optimizer.trainable_mask matches path substrings).

    ``lora_scale`` is deliberately excluded: it encodes the fixed alpha/r
    ratio (Hu et al. keep it constant), so only the low-rank factors train.
    """
    return ("lora_a", "lora_b")


def lora_param_count(llm_params: PyTree) -> int:
    leaves = jax.tree_util.tree_leaves_with_path(llm_params)
    return sum(int(v.size) for path, v in leaves
               if any("lora_" in str(getattr(p, "key", "")) for p in path))
