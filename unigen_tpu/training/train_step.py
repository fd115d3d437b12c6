"""The unified three-task train step, fully fused on device.

Reference flow (training/train.py:521-793): per step, the host encodes pixels with
the frozen VQ model, masks tokens, assembles prompts, builds [B,1,L,L] float masks,
concatenates the three task sub-batches, and runs forward/backward.

TPU-first restructuring: the host supplies only *templates* (prompt token ids with
placeholder image slots, from ``prompting.UniPrompting``) and raw pixels; everything
else — VQ encode, MaskGIT corruption, token splicing, omni-mask construction,
forward, three losses, weighted sum, global-norm clip, AdamW update — happens inside
one jitted function. Under a sharded mesh the gradient all-reduce falls out of the
batch sharding (no NCCL calls; SURVEY.md §2.7).

Sequence layouts (fixed positions, so splicing is a static dynamic_update_slice):
  t2i: image block at [-(n+1):-1] (reference t2i_prompt, prompting_utils.py:97-103)
  mmu: image block at [3:3+n]     (reference mmu_prompt, prompting_utils.py:224-240)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import magvit, unigen
from ..models.unigen import UniGenConfig
from ..ops import masking as MK
from ..ops import masks as M
from ..ops import sampling as S
from .ema import EMAConfig, ema_init, ema_update

Array = jax.Array
PyTree = Any


class TrainState(NamedTuple):
    params: PyTree
    opt_state: Any
    step: Array
    # EMAState when EMA is enabled (TrainerConfig.ema_decay > 0), else None.
    # Part of the state pytree, so checkpoints carry and restore it natively.
    ema: Any = None


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    batch_size_t2i: int
    batch_size_lm: int
    batch_size_mmu: int
    t2i_coeff: float = 1.0
    lm_coeff: float = 0.1
    mmu_coeff: float = 1.0
    min_masking_rate: float = 0.0
    mask_contiguous_region_prob: Optional[float] = None
    noise_type: str = "mask"
    mask_schedule: str = "cosine"
    use_causal_mask: bool = False
    t2i_gen_mode: str = "mask"
    max_grad_norm: Optional[float] = None
    pad_id: int = 0
    soi_id: int = 1
    eoi_id: int = 2
    grad_accum_steps: int = 1
    remat: bool = False
    use_flash_attention: bool = False  # AttnMeta + Pallas kernel instead of dense masks
    memory_efficient_loss: bool = True  # chunked CE: no [B,L,160k] logits tensor


def init_train_state(params: PyTree, tx: optax.GradientTransformation,
                     ema_cfg: Optional["EMAConfig"] = None) -> TrainState:
    ema = ema_init(params) if ema_cfg is not None else None
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), ema)


def _splice(ids: Array, block: Array, start: int) -> Array:
    return jax.lax.dynamic_update_slice(ids, block.astype(ids.dtype), (0, start))


def make_train_step(
    cfg: UniGenConfig,
    vq_cfg: magvit.MagvitConfig,
    tx: optax.GradientTransformation,
    tcfg: TrainStepConfig,
    ema_cfg: Optional[EMAConfig] = None,
) -> Callable:
    """Build the jitted step: (state, vq_params, batch, key) -> (state, metrics).

    With ``ema_cfg`` set, the step also advances an exponential moving average
    of the params inside the same jitted program (state.ema, donated with the
    rest of the TrainState). Live counterpart of the reference's shipped-but-
    unused EMA class (reference models/training_utils.py:59-295).

    ``batch`` fields (all optional by configured batch sizes; equal seq length L):
      t2i_template  [Bt, L] int  — prompt with zeros in the image block
      t2i_labels    [Bt, L] int  — labels with zeros in the image block
      t2i_pixels    [Bt, H, W, 3]
      lm_ids / lm_labels [Bl, L]
      mmu_template  [Bm, L] int  — zeros in the image block at [3:3+n]
      mmu_labels    [Bm, L]
      mmu_pixels    [Bm, H, W, 3]
    """
    n = cfg.num_vq_tokens
    schedule = S.get_mask_schedule(tcfg.mask_schedule)

    def build_inputs(vq_params, batch, key):
        parts, labels, masks, metas = [], [], [], []
        use_meta = tcfg.use_flash_attention and not tcfg.use_causal_mask
        mask_prob = jnp.zeros((max(tcfg.batch_size_t2i, 1),), jnp.float32)

        if tcfg.batch_size_t2i > 0:
            codes = magvit.get_code(vq_params, vq_cfg, batch["t2i_pixels"])
            if tcfg.t2i_gen_mode == "mask":
                # corruption runs in codebook space; marker = codebook_size (which IS
                # the gen-projector mask id; the unified-vocab id is mapped below)
                masked = MK.mask_or_random_replace_tokens(
                    key, codes, cfg.codebook_size, schedule,
                    min_masking_rate=tcfg.min_masking_rate,
                    mask_contiguous_region_prob=tcfg.mask_contiguous_region_prob,
                    noise_type=tcfg.noise_type, codebook_size=cfg.codebook_size)
                img_inputs_cb, img_labels_cb = masked.input_ids, masked.labels
                mask_prob = masked.mask_prob
            else:
                img_inputs_cb, img_labels_cb = codes, codes

            if cfg.use_gen_projector:
                img_inputs = img_inputs_cb                 # codebook space, mask=codebook
                img_labels = img_labels_cb
            else:
                # unified space: tokens offset by text vocab; mask marker = vocab-1
                img_inputs = jnp.where(img_inputs_cb == cfg.codebook_size,
                                       cfg.mask_token_id,
                                       img_inputs_cb + cfg.text_vocab_len)
                img_labels = jnp.where(img_labels_cb < 0, img_labels_cb,
                                       img_labels_cb + cfg.text_vocab_len)

            ids = _splice(batch["t2i_template"], img_inputs, batch["t2i_template"].shape[1] - n - 1)
            labs = _splice(batch["t2i_labels"], img_labels, batch["t2i_labels"].shape[1] - n - 1)
            if use_meta:
                metas.append(M.t2i_attn_meta(ids, tcfg.pad_id, tcfg.soi_id, tcfg.eoi_id))
            elif tcfg.use_causal_mask:
                masks.append(M.causal_mask_from_attention((ids != tcfg.pad_id).astype(jnp.int32)))
            else:
                masks.append(M.create_attention_mask_predict_next(
                    ids, tcfg.pad_id, tcfg.soi_id, tcfg.eoi_id, rm_pad_in_image=True))
            parts.append(ids)
            labels.append(labs)

        if tcfg.batch_size_lm > 0:
            ids = batch["lm_ids"]
            if use_meta:
                metas.append(M.lm_attn_meta(ids, tcfg.pad_id))
            else:
                masks.append(M.causal_mask_from_attention(
                    (ids != tcfg.pad_id).astype(jnp.int32)))
            parts.append(ids)
            labels.append(batch["lm_labels"])

        if tcfg.batch_size_mmu > 0:
            codes = magvit.get_code(vq_params, vq_cfg, batch["mmu_pixels"])
            img = codes + cfg.text_vocab_len
            ids = _splice(batch["mmu_template"], img, 3)
            if use_meta:
                metas.append(M.mmu_attn_meta(ids, tcfg.pad_id, tcfg.soi_id, tcfg.eoi_id))
            elif tcfg.use_causal_mask:
                masks.append(M.causal_mask_from_attention(
                    (ids != tcfg.pad_id).astype(jnp.int32)))
            else:
                masks.append(M.create_attention_mask_for_mmu(ids, tcfg.eoi_id))
            parts.append(ids)
            labels.append(batch["mmu_labels"])

        input_ids = jnp.concatenate(parts, axis=0)
        label_ids = jnp.concatenate(labels, axis=0)
        attn = jnp.concatenate(masks, axis=0) if masks else None
        meta = M.concat_meta(*metas) if metas else None
        return input_ids, label_ids, attn, meta, mask_prob

    def loss_fn(params, vq_params, batch, key):
        input_ids, label_ids, attn, meta, mask_prob = build_inputs(vq_params, batch, key)
        _, lt, ll, lm = unigen.forward(
            params, cfg, input_ids=input_ids, attention_mask=attn, attn_meta=meta,
            labels=label_ids,
            batch_size_t2i=tcfg.batch_size_t2i, batch_size_lm=tcfg.batch_size_lm,
            batch_size_mmu=tcfg.batch_size_mmu, t2i_mode=tcfg.t2i_gen_mode,
            remat=tcfg.remat,
            memory_efficient_loss=(tcfg.memory_efficient_loss
                                   and not cfg.use_gen_projector))
        loss = tcfg.t2i_coeff * lt + tcfg.lm_coeff * ll + tcfg.mmu_coeff * lm
        return loss, {"loss": loss, "loss_t2i": lt, "loss_lm": ll, "loss_mmu": lm,
                      "avg_masking_rate": mask_prob.mean()}

    def train_step(state: TrainState, vq_params, batch, key):
        if tcfg.grad_accum_steps > 1:
            def micro(carry, xs):
                g_acc, m_acc = carry
                mb, k = xs
                (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, vq_params, mb, k)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                m_acc = jax.tree_util.tree_map(jnp.add, m_acc, m)
                return (g_acc, m_acc), None

            a = tcfg.grad_accum_steps
            micro_batch = jax.tree_util.tree_map(
                lambda x: x.reshape(a, x.shape[0] // a, *x.shape[1:]), batch)
            keys = jax.random.split(key, a)
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            zero_m = {k: jnp.zeros(()) for k in
                      ["loss", "loss_t2i", "loss_lm", "loss_mmu", "avg_masking_rate"]}
            (grads, metrics), _ = jax.lax.scan(micro, (zero_g, zero_m), (micro_batch, keys))
            grads = jax.tree_util.tree_map(lambda g: g / a, grads)
            metrics = jax.tree_util.tree_map(lambda m: m / a, metrics)
        else:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, vq_params, batch, key)

        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (ema_update(ema_cfg, state.ema, new_params)
                   if ema_cfg is not None else state.ema)
        return TrainState(new_params, new_opt, state.step + 1, new_ema), metrics

    return train_step
