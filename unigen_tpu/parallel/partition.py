"""PartitionSpec rules for every parameter tree in the framework.

Path-pattern → PartitionSpec tables, applied with ``tree_map_with_path``. The rules
implement Megatron-style tensor parallelism for the backbone (column-parallel
qkv/gate/up, row-parallel o/down, vocab-sharded embedding/lm_head) plus optional
FSDP sharding of the remaining large dimension. The reference has no TP at all
(SURVEY.md §2.7); DP gradient averaging and ZeRO-style optimizer-state sharding
both fall out of these specs under pjit.

Remember the stacked-layer layout: every per-layer leaf carries a leading
``num_layers`` dimension (scanned, never sharded), so specs for layer leaves are
``P(None, *dims)``.
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXES

PyTree = Any

# (regex over '/'-joined path, spec WITHOUT the leading stacked-layer axis)
_QWEN2_RULES = [
    (r"embed/weight$", P(AXES.model, None)),           # vocab-sharded embedding
    (r"lm_head/kernel$", P(None, AXES.model)),
    (r"layers/.*attn/[qkv]/kernel$", P(None, AXES.model)),   # column parallel
    (r"layers/.*attn/[qkv]/bias$", P(AXES.model)),
    (r"layers/.*attn/o/kernel$", P(AXES.model, None)),        # row parallel
    (r"layers/.*mlp/(gate|up)/kernel$", P(None, AXES.model)),
    (r"layers/.*mlp/down/kernel$", P(AXES.model, None)),
    (r".*ln/scale$", P()),
    (r"final_ln/scale$", P()),
]

_UNIGEN_EXTRA_RULES = [
    (r"gen_embed/weight$", P(None, None)),
    (r"img_head/kernel$", P(None, AXES.model)),
    (r"(gen_projector|mm_projector)/\d+/kernel$", P(None, None)),
    (r"(gen_projector|mm_projector)/\d+/bias$", P()),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path_s: str, leaf, rules, stacked_prefixes=("llm/layers", "layers")) -> P:
    for pat, spec in rules:
        if re.search(pat, path_s):
            # stacked per-layer leaves get a leading None for the scan axis
            if "layers/" in path_s and leaf.ndim == len(spec) + 1:
                return P(None, *spec)
            if leaf.ndim == len(spec):
                return spec
            # rank mismatch (e.g. rules written for 2D, leaf is 1D bias): replicate
            return P()
    return P()


def partition_qwen2(params: PyTree) -> PyTree:
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_str(path), leaf, _QWEN2_RULES), params)


def partition_unigen(params: PyTree) -> PyTree:
    # UniGen-specific rules first: "gen_embed/weight" must not hit the vocab-sharded
    # "embed/weight" rule.
    rules = _UNIGEN_EXTRA_RULES + _QWEN2_RULES
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_str(path), leaf, rules), params)


def partition_magvit(params: PyTree) -> PyTree:
    """Tokenizer convs are small; replicate (batch parallelism handles scale)."""
    return jax.tree_util.tree_map(lambda _: P(), params)


def partition_siglip(params: PyTree) -> PyTree:
    rules = [
        (r"layers/attn/[qkv]/kernel$", P(None, AXES.model)),
        (r"layers/attn/[qkv]/bias$", P(AXES.model)),
        (r"layers/attn/o/kernel$", P(AXES.model, None)),
        (r"layers/mlp/fc1/kernel$", P(None, AXES.model)),
        (r"layers/mlp/fc1/bias$", P(AXES.model)),
        (r"layers/mlp/fc2/kernel$", P(AXES.model, None)),
    ]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_str(path), leaf, rules), params)


def add_fsdp(specs: PyTree, params: PyTree, min_size: int = 2 ** 14) -> PyTree:
    """ZeRO-3-style: additionally shard each large leaf's first un-sharded dim on
    the fsdp axis (the reference's DeepSpeed ZeRO-3 / FSDP configs,
    configs/accelerate_configs/zero3.json, 8_gpus_fsdp.yaml)."""
    def upgrade(spec: P, leaf):
        if leaf.size < min_size:
            return spec
        dims = list(spec) + [None] * (leaf.ndim - len(spec))
        for i, d in enumerate(dims):
            if d is None and leaf.shape[i] > 1:
                dims[i] = AXES.fsdp
                return P(*dims)
        return spec
    return jax.tree_util.tree_map(upgrade, specs, params)


def partition_batch(ndim: int) -> P:
    """Shard the leading batch dim over (data, fsdp) — fsdp groups consume distinct
    data too, like ZeRO data parallelism."""
    return P((AXES.data, AXES.fsdp), *([None] * (ndim - 1)))


def sanitize_specs(specs: PyTree, params: PyTree, mesh: Mesh) -> PyTree:
    """Replicate any dimension whose size is not divisible by its mesh axis.

    Keeps the rule tables mesh-agnostic: e.g. a 161-entry tiny vocab cannot be
    sharded 2-way, while the flagship 160k vocab can."""
    def fix(spec: P, leaf):
        dims = list(spec)
        for i, d in enumerate(dims):
            if d is None:
                continue
            axes = (d,) if isinstance(d, str) else tuple(d)
            size = 1
            for a in axes:
                size *= mesh.shape[a]
            if leaf.shape[i] % size:
                dims[i] = None
        return P(*dims)
    return jax.tree_util.tree_map(fix, specs, params)


def shard_params(params: PyTree, specs: PyTree, mesh: Mesh) -> PyTree:
    """Device-put params onto the mesh according to (sanitized) specs."""
    specs = sanitize_specs(specs, params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
