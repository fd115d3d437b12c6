"""SFT train step: the continuous-vision-tower variant of the unified step.

Reference: training/train_w_clip_vit.py — same three-task skeleton as train.py,
but the mmu flow runs pixels through the SigLIP tower (:746,:761), optionally
tiles high-res inputs as a low-res global view + n×n crops (n_grid, :756-766,
:803-819), projects with mm_projector, splices embeddings part1+img+part2
(:772-779), and uses the mmu_vit attention mask (:848-856). Per-module learning
rates and tunable-part freezing are handled by training/optimizer.py.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models import magvit, siglip, unigen
from ..models.unigen import UniGenConfig
from ..ops import masking as MK
from ..ops import masks as M
from ..ops import sampling as S
from .train_step import TrainState, TrainStepConfig, _splice

Array = jax.Array


def grid_tiles(pixels: Array, n_grid: int, tile_size: int) -> Array:
    """High-res image -> [B, 1 + n*n, tile, tile, 3]: resized global view first,
    then n x n crops (reference: train_w_clip_vit.py:756-766)."""
    b = pixels.shape[0]
    glob = jax.image.resize(pixels, (b, tile_size, tile_size, 3), "bilinear")
    tiles = [glob]
    for i in range(n_grid):
        for j in range(n_grid):
            crop = jax.lax.dynamic_slice(
                pixels, (0, i * tile_size, j * tile_size, 0),
                (b, tile_size, tile_size, 3))
            tiles.append(crop)
    return jnp.stack(tiles, axis=1)


@dataclasses.dataclass(frozen=True)
class SFTStepConfig(TrainStepConfig):
    n_grid: int = 0            # 0 = single 384px view


def make_sft_train_step(
    cfg: UniGenConfig,
    vq_cfg: magvit.MagvitConfig,
    vision_cfg,
    tx: optax.GradientTransformation,
    tcfg: SFTStepConfig,
) -> Callable:
    """batch fields (beyond the t2i/lm fields of train_step):
      mmu_part1   [Bm, L1]  prompt-head token ids
      mmu_part2   [Bm, L2]  eoi+conversation token ids
      mmu_labels  [Bm, L1 + P + L2]
      mmu_prompt_len [Bm]   valid length for the attention mask
    and, per tower type:
      SigLIP (fixed-res, ``vision_cfg: SiglipConfig``):
        mmu_pixels  [Bm, S, S, 3]  (S = vision_cfg.image_size, or larger with n_grid)
      SigLIP2-NaFlex (``vision_cfg: Siglip2Config``; loader fields from
      data/llava.py in 'naflex' mode, reference llava_data_unified.py:316-327):
        mmu_pixel_values [Bm, P, 3*p*p], mmu_pixel_attention_mask [Bm, P],
        mmu_spatial_shapes [Bm, 2], mmu_pos_embeds [Bm, P, D] — precompute the
        latter host-side with siglip2.resize_positional_embeddings (the resize
        cache is a host loop and cannot trace under jit).

    step(state, vq_params, vision_params, batch, key) -> (state, metrics)
    Vision-tower params ride inside ``state.params['vision_tower']`` when the
    tower is trainable; pass them separately as frozen otherwise.
    """
    from ..models import siglip2

    n = cfg.num_vq_tokens
    schedule = S.get_mask_schedule(tcfg.mask_schedule)
    naflex = isinstance(vision_cfg, siglip2.Siglip2Config)
    if naflex and tcfg.n_grid > 0:
        # NaFlex already sees native-resolution patch grids; silently training
        # without the configured tiling would be a different model
        raise ValueError("n_grid tiling is a fixed-res SigLIP feature; "
                         "disable n_grid (or use SiglipConfig) with NaFlex")
    tile = None if naflex else vision_cfg.image_size

    def vision_features(vision_params, batch):
        if naflex:
            return siglip2.forward_with_pos(
                vision_params, vision_cfg, batch["mmu_pixel_values"],
                batch["mmu_pixel_attention_mask"], batch["mmu_pos_embeds"])
        pixels = batch["mmu_pixels"]
        if tcfg.n_grid > 0:
            tiles = grid_tiles(pixels, tcfg.n_grid, tile)
            b, t = tiles.shape[:2]
            feats = siglip.forward(vision_params, vision_cfg,
                                   tiles.reshape(b * t, tile, tile, 3))
            return feats.reshape(b, -1, feats.shape[-1])  # concat tiles along patches
        return siglip.forward(vision_params, vision_cfg, pixels)

    def loss_fn(params, vq_params, vision_params, batch, key):
        losses = {}
        total = jnp.zeros((), jnp.float32)
        mask_prob = jnp.zeros((1,), jnp.float32)

        if tcfg.batch_size_t2i > 0:
            codes = magvit.get_code(vq_params, vq_cfg, batch["t2i_pixels"])
            masked = MK.mask_or_random_replace_tokens(
                key, codes, cfg.codebook_size, schedule,
                min_masking_rate=tcfg.min_masking_rate,
                codebook_size=cfg.codebook_size)
            img_in = jnp.where(masked.input_ids == cfg.codebook_size,
                               cfg.mask_token_id, masked.input_ids + cfg.text_vocab_len)
            img_lab = jnp.where(masked.labels < 0, masked.labels,
                                masked.labels + cfg.text_vocab_len)
            ids = _splice(batch["t2i_template"], img_in,
                          batch["t2i_template"].shape[1] - n - 1)
            labs = _splice(batch["t2i_labels"], img_lab,
                           batch["t2i_labels"].shape[1] - n - 1)
            att = M.create_attention_mask_predict_next(
                ids, tcfg.pad_id, tcfg.soi_id, tcfg.eoi_id, rm_pad_in_image=True)
            _, lt, _, _ = unigen.forward(params, cfg, input_ids=ids,
                                         attention_mask=att, labels=labs,
                                         batch_size_t2i=ids.shape[0],
                                         t2i_mode=tcfg.t2i_gen_mode, remat=tcfg.remat,
                                         memory_efficient_loss=tcfg.memory_efficient_loss)
            losses["loss_t2i"] = lt
            total = total + tcfg.t2i_coeff * lt
            mask_prob = masked.mask_prob

        if tcfg.batch_size_lm > 0:
            ids = batch["lm_ids"]
            att = M.causal_mask_from_attention((ids != tcfg.pad_id).astype(jnp.int32))
            _, _, ll, _ = unigen.forward(params, cfg, input_ids=ids,
                                         attention_mask=att, labels=batch["lm_labels"],
                                         batch_size_lm=ids.shape[0], remat=tcfg.remat,
                                         memory_efficient_loss=tcfg.memory_efficient_loss)
            losses["loss_lm"] = ll
            total = total + tcfg.lm_coeff * ll

        if tcfg.batch_size_mmu > 0:
            feats = vision_features(vision_params, batch)
            img_embeds = unigen.mm_project(params, feats)
            e1 = unigen.embed_tokens(params, batch["mmu_part1"])
            e2 = unigen.embed_tokens(params, batch["mmu_part2"])
            embeds = jnp.concatenate([e1, img_embeds.astype(e1.dtype), e2], axis=1)
            b, l, _ = embeds.shape
            att = M.create_attention_mask_for_mmu_vit(
                b, l,
                num_tokens=(batch["mmu_spatial_shapes"] if naflex
                            else img_embeds.shape[1]),
                prefix_length=batch["mmu_part1"].shape[1])
            keep = jnp.arange(l)[None] < batch["mmu_prompt_len"][:, None]
            att = att & keep[:, None, None, :] & keep[:, None, :, None]
            _, _, _, lm = unigen.forward(params, cfg, input_ids=None,
                                         input_embeddings=embeds, attention_mask=att,
                                         labels=batch["mmu_labels"],
                                         batch_size_mmu=b, remat=tcfg.remat,
                                         memory_efficient_loss=tcfg.memory_efficient_loss)
            losses["loss_mmu"] = lm
            total = total + tcfg.mmu_coeff * lm

        losses["loss"] = total
        losses["avg_masking_rate"] = mask_prob.mean()
        return total, losses

    def sft_step(state: TrainState, vq_params, vision_params, batch, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, vq_params, vision_params, batch, key)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return sft_step
