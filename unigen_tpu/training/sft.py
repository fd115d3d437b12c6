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
    # When set (to the mmu splice length), t2i/lm rows are LEFT-padded to this
    # length and all three flows run as ONE backbone call with a single
    # backward layer-scan — the memory shape that fits flagship SFT on one
    # 16GB chip (see loss_fused). None = separate per-length calls.
    common_length: "int | None" = None
    # With common_length set, additionally SEQUENCE-PACK the short t2i/lm rows
    # (several 387-token segments per 1344-token row, block-diagonal attention,
    # per-segment RoPE restart) instead of padding each row: 8 rows × 1344
    # tokens become 6, removing ~70% of the pad-token FLOPs (see loss_packed).
    # Falls back to plain left-padding for ar-mode t2i or a gen projector.
    pack_rows: bool = True


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

    use_meta = tcfg.use_flash_attention

    def _attn_kw(mask_list):
        """masks-list entry/entries -> the forward kwarg for the active
        representation (dense attention_mask vs AttnMeta for the Pallas kernel)."""
        if use_meta:
            return {"attn_meta": M.concat_meta(*mask_list)}
        if len(mask_list) == 1:
            return {"attention_mask": mask_list[0]}
        return {"attention_mask": jnp.concatenate(mask_list, axis=0)}

    def build_tl_inputs(vq_params, batch, key, target_len=None):
        """ids/labels/masks for the t2i and lm flows; with ``target_len`` the
        rows are LEFT-padded to it before mask construction (left padding keeps
        the trailing VQ block at the tail, so the t2i loss/gen-projector slicing
        is unchanged; pad positions are masked out of attention and carry -100
        labels, so losses are exactly those of the unpadded rows).

        With ``tcfg.use_flash_attention`` the ``masks`` list carries AttnMeta
        (O(B·L) per-token flags for the Pallas omni-mask kernel) instead of
        dense [B,1,L,L] masks — loss-equivalent (pad rows differ only at -100
        label positions; see ops/masks.py), asserted by the SFT flash parity
        tests."""
        parts, labs_parts, masks = [], [], []
        bt = bl = 0
        mask_prob = jnp.zeros((1,), jnp.float32)

        def pad_to(ids, labs):
            if target_len is None:
                return ids, labs
            p = target_len - ids.shape[1]
            if p < 0:
                raise ValueError(f"common_length {target_len} < row length "
                                 f"{ids.shape[1]}")
            return (jnp.pad(ids, ((0, 0), (p, 0)), constant_values=tcfg.pad_id),
                    jnp.pad(labs, ((0, 0), (p, 0)), constant_values=-100))

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
            ids, labs = pad_to(ids, labs)
            att = (M.t2i_attn_meta(ids, tcfg.pad_id, tcfg.soi_id, tcfg.eoi_id)
                   if use_meta else
                   M.create_attention_mask_predict_next(
                       ids, tcfg.pad_id, tcfg.soi_id, tcfg.eoi_id,
                       rm_pad_in_image=True))
            parts.append(ids)
            labs_parts.append(labs)
            masks.append(att)
            bt = ids.shape[0]
            mask_prob = masked.mask_prob

        if tcfg.batch_size_lm > 0:
            ids, labs = pad_to(batch["lm_ids"], batch["lm_labels"])
            off = ids.shape[1] - batch["lm_ids"].shape[1]
            if off:
                # the pad→first-real-token pair is not a real next-token pair:
                # unpadded CE never scores label[0] (it is only ever an input)
                labs = labs.at[:, off].set(-100)
            att = (M.lm_attn_meta(ids, tcfg.pad_id) if use_meta else
                   M.causal_mask_from_attention(
                       (ids != tcfg.pad_id).astype(jnp.int32)))
            parts.append(ids)
            labs_parts.append(labs)
            masks.append(att)
            bl = ids.shape[0]
        return parts, labs_parts, masks, bt, bl, mask_prob

    def build_mmu_inputs(params, vision_params, batch, want_meta=False):
        """Spliced [part1 | vision embeds | part2] inputs + mask (or, with
        ``want_meta``, the O(B·L) AttnMeta consumed by the Pallas omni-mask
        kernel) for the mmu flow."""
        feats = vision_features(vision_params, batch)
        img_embeds = unigen.mm_project(params, feats)
        e1 = unigen.embed_tokens(params, batch["mmu_part1"])
        e2 = unigen.embed_tokens(params, batch["mmu_part2"])
        embeds = jnp.concatenate([e1, img_embeds.astype(e1.dtype), e2], axis=1)
        b, l, _ = embeds.shape
        num_tokens = (batch["mmu_spatial_shapes"] if naflex
                      else img_embeds.shape[1])
        if want_meta:
            meta = M.mmu_vit_attn_meta(
                b, l, num_tokens=num_tokens,
                prefix_length=batch["mmu_part1"].shape[1],
                prompt_len=batch["mmu_prompt_len"])
            return embeds, meta, batch["mmu_labels"]
        att = M.create_attention_mask_for_mmu_vit(
            b, l, num_tokens=num_tokens,
            prefix_length=batch["mmu_part1"].shape[1])
        keep = jnp.arange(l)[None] < batch["mmu_prompt_len"][:, None]
        att = att & keep[:, None, None, :] & keep[:, None, :, None]
        return embeds, att, batch["mmu_labels"]

    def loss_tl(params, vq_params, batch, key):
        """Weighted t2i + lm loss. The two flows share a sequence length, so
        they run as ONE backbone call (like the pretraining step): each extra
        backward-through-the-layer-scan allocates its own stacked param-gradient
        accumulator set (~1.2GB of [28, ...]-shaped zero buffers at 1.5B)."""
        losses = {}
        total = jnp.zeros((), jnp.float32)
        parts, labs_parts, masks, bt, bl, mask_prob = build_tl_inputs(
            vq_params, batch, key)
        fusable = len(parts) < 2 or parts[0].shape[1] == parts[1].shape[1]
        if parts and fusable:
            _, lt, ll, _ = unigen.forward(
                params, cfg, input_ids=jnp.concatenate(parts, axis=0),
                labels=jnp.concatenate(labs_parts, axis=0),
                batch_size_t2i=bt, batch_size_lm=bl,
                t2i_mode=tcfg.t2i_gen_mode, remat=tcfg.remat,
                memory_efficient_loss=tcfg.memory_efficient_loss,
                **_attn_kw(masks))
            if bt:
                losses["loss_t2i"] = lt
                total = total + tcfg.t2i_coeff * lt
            if bl:
                losses["loss_lm"] = ll
                total = total + tcfg.lm_coeff * ll
        elif parts:
            # unequal t2i/lm lengths: one forward per flow (costs a second
            # backward-scan gradient-accumulator set — fine off the 16GB chip)
            _, lt, _, _ = unigen.forward(
                params, cfg, input_ids=parts[0],
                labels=labs_parts[0], batch_size_t2i=bt,
                t2i_mode=tcfg.t2i_gen_mode, remat=tcfg.remat,
                memory_efficient_loss=tcfg.memory_efficient_loss,
                **_attn_kw(masks[:1]))
            losses["loss_t2i"] = lt
            total = total + tcfg.t2i_coeff * lt
            _, _, ll, _ = unigen.forward(
                params, cfg, input_ids=parts[1],
                labels=labs_parts[1], batch_size_lm=bl, remat=tcfg.remat,
                memory_efficient_loss=tcfg.memory_efficient_loss,
                **_attn_kw(masks[1:]))
            losses["loss_lm"] = ll
            total = total + tcfg.lm_coeff * ll
        losses["avg_masking_rate"] = mask_prob.mean()
        return total, losses

    def loss_mmu(params, vision_params, batch):
        """Weighted mmu (vision-tower conversation) loss at its own length."""
        embeds, att, labels = build_mmu_inputs(params, vision_params, batch,
                                               want_meta=use_meta)
        _, _, _, lm = unigen.forward(params, cfg, input_ids=None,
                                     input_embeddings=embeds,
                                     labels=labels,
                                     batch_size_mmu=embeds.shape[0],
                                     remat=tcfg.remat,
                                     memory_efficient_loss=tcfg.memory_efficient_loss,
                                     **_attn_kw([att]))
        return tcfg.mmu_coeff * lm, {"loss_mmu": lm}

    def loss_fused(params, vq_params, vision_params, batch, key):
        """All three flows in ONE backbone call at ``tcfg.common_length``.

        One fused program with two different-length backbone calls must hold
        the optimizer state plus TWO stacked-gradient trees, which exceeds a
        16GB chip at 1.5B no matter the batch (BENCH.md training section).
        Left-padding the short t2i/lm rows up to the mmu length costs extra
        pad-token FLOPs (~55% at the reference's 387-vs-1344 lengths) but
        keeps a single backward layer-scan — the configuration that actually
        fits. Losses are exactly the separate-mode losses
        (tests/test_hf_import.py::test_sft_common_length_matches_separate)."""
        Lc = tcfg.common_length
        parts, labs_parts, masks, bt, bl, mask_prob = build_tl_inputs(
            vq_params, batch, key, target_len=Lc)
        mmu_embeds, mmu_att, mmu_labels = build_mmu_inputs(
            params, vision_params, batch, want_meta=use_meta)
        if mmu_embeds.shape[1] != Lc:
            raise ValueError(f"common_length {Lc} != mmu splice length "
                             f"{mmu_embeds.shape[1]}")
        embeds = []
        if bt:
            embeds.append(unigen.prepare_inputs_for_t2i(params, cfg, parts[0]))
        if bl:
            embeds.append(unigen.embed_tokens(params, parts[-1]))
        embeds.append(mmu_embeds)
        embeds = jnp.concatenate([e.astype(mmu_embeds.dtype) for e in embeds],
                                 axis=0)
        labels = jnp.concatenate(labs_parts + [mmu_labels], axis=0)
        attn_kw = _attn_kw(masks + [mmu_att])
        bm = mmu_embeds.shape[0]
        # RoPE positions: left-padded rows must rotate their REAL tokens at the
        # positions they'd have unpadded (0..len-1), or the fused losses diverge
        # from the separate-call ones; pad slots clamp to 0 (masked out anyway)
        pos = []
        if bt:
            off = Lc - batch["t2i_template"].shape[1]
            pos.append(jnp.broadcast_to(
                jnp.maximum(0, jnp.arange(Lc) - off)[None], (bt, Lc)))
        if bl:
            off = Lc - batch["lm_ids"].shape[1]
            pos.append(jnp.broadcast_to(
                jnp.maximum(0, jnp.arange(Lc) - off)[None], (bl, Lc)))
        pos.append(jnp.broadcast_to(jnp.arange(Lc)[None], (bm, Lc)))
        _, lt, ll, lmu = unigen.forward(
            params, cfg, input_ids=None, input_embeddings=embeds,
            labels=labels,
            batch_size_t2i=bt, batch_size_lm=bl, batch_size_mmu=bm,
            t2i_mode=tcfg.t2i_gen_mode, remat=tcfg.remat,
            memory_efficient_loss=tcfg.memory_efficient_loss,
            positions=jnp.concatenate(pos, axis=0), **attn_kw)
        losses = {"avg_masking_rate": mask_prob.mean()}
        total = tcfg.mmu_coeff * lmu
        losses["loss_mmu"] = lmu
        if bt:
            losses["loss_t2i"] = lt
            total = total + tcfg.t2i_coeff * lt
        if bl:
            losses["loss_lm"] = ll
            total = total + tcfg.lm_coeff * ll
        return total, losses

    def loss_packed(params, vq_params, vision_params, batch, key):
        """Sequence-packed variant of loss_fused: instead of left-padding each
        387-token t2i/lm row to the 1344-token mmu length (64% pad FLOPs), pack
        ``common_length // row_length`` same-flow segments per row with
        block-diagonal attention and per-segment RoPE positions — at the
        reference's SFT shapes, 8×1344 backbone tokens become 6×1344 (86%
        useful). Per-flow losses come from label-driven chunked CE over the
        packed rows: the t2i labels are -100 outside each segment's VQ block,
        so full-row UNSHIFTED CE equals the reference's block-sliced CE
        (mask mode only); lm/mmu use the shifted CE with each segment's first
        label dropped (never a real next-token target). Exactness:
        tests/test_hf_import.py::test_sft_packed_matches_separate."""
        from ..models import qwen2
        from ..models.unigen import _chunked_ce

        Lc = tcfg.common_length
        parts, labs_parts, masks, bt, bl, mask_prob = build_tl_inputs(
            vq_params, batch, key)
        mmu_embeds, mmu_att, mmu_labels = build_mmu_inputs(
            params, vision_params, batch, want_meta=use_meta)
        if mmu_embeds.shape[1] != Lc:
            raise ValueError(f"common_length {Lc} != mmu splice length "
                             f"{mmu_embeds.shape[1]}")

        def pack(ids_r, labs_r, mask_r, meta_builder=None):
            """Pack r rows of length ls into ceil(r/segs) rows of length Lc.

            Dense mode (``meta_builder`` None): per-segment [ls, ls] masks land
            block-diagonally in a [p_rows, 1, Lc, Lc] mask. Flash mode: returns
            an AttnMeta instead — ``meta_builder(ids_p)`` derives pad/bidir
            flags from the PACKED ids (filler slots are pad_id ⇒ pad=True) and
            the per-slot segment ids confine attention to its own segment
            inside the kernel (ops/flash_attention.py), so no [Lc, Lc] mask is
            ever materialized."""
            r, ls = ids_r.shape
            segs = max(1, Lc // ls)
            p_rows = -(-r // segs)
            ids_p = jnp.full((p_rows, Lc), tcfg.pad_id, ids_r.dtype)
            labs_p = jnp.full((p_rows, Lc), -100, labs_r.dtype)
            att_p = (None if meta_builder is not None
                     else jnp.zeros((p_rows, 1, Lc, Lc), bool))
            pos_p = jnp.zeros((p_rows, Lc), jnp.int32)
            seg_p = jnp.zeros((p_rows, Lc), jnp.int32)
            for i in range(r):
                pr, slot = divmod(i, segs)
                o = slot * ls
                ids_p = ids_p.at[pr, o:o + ls].set(ids_r[i])
                labs_p = labs_p.at[pr, o:o + ls].set(labs_r[i])
                if att_p is not None:
                    att_p = att_p.at[pr, 0, o:o + ls, o:o + ls].set(mask_r[i, 0])
                pos_p = pos_p.at[pr, o:o + ls].set(jnp.arange(ls))
                seg_p = seg_p.at[pr, o:o + ls].set(slot)
            if meta_builder is not None:
                att_p = meta_builder(ids_p)._replace(seg=seg_p)
            return ids_p, labs_p, att_p, pos_p

        embeds, atts, poss = [], [], []
        rt = rl = 0
        t2i_labs_p = lm_labs_p = None
        if bt:
            # the separate/fused paths score ONLY the trailing-VQ-block slice;
            # real prompting emits soi/eoi LABELS outside it (prompting.py
            # t2i_prompt) which the slice discards — mask them here so the
            # unshifted full-row CE scores exactly the block positions
            t2i_labs = labs_parts[0]
            block_only = jnp.full_like(t2i_labs, -100).at[:, -(n + 1):-1].set(
                t2i_labs[:, -(n + 1):-1])
            ids_p, t2i_labs_p, att_p, pos_p = pack(
                parts[0], block_only, masks[0],
                meta_builder=(lambda ip: M.t2i_attn_meta(
                    ip, tcfg.pad_id, tcfg.soi_id, tcfg.eoi_id))
                if use_meta else None)
            embeds.append(unigen.embed_tokens(params, ids_p))
            atts.append(att_p)
            poss.append(pos_p)
            rt = ids_p.shape[0]
        if bl:
            # a segment's first label is never a real next-token target (the
            # preceding position is another segment's tail or padding)
            lm_labs = labs_parts[-1].at[:, 0].set(-100)
            ids_p, lm_labs_p, att_p, pos_p = pack(
                parts[-1], lm_labs, masks[-1],
                meta_builder=(lambda ip: M.lm_attn_meta(ip, tcfg.pad_id))
                if use_meta else None)
            embeds.append(unigen.embed_tokens(params, ids_p))
            atts.append(att_p)
            poss.append(pos_p)
            rl = ids_p.shape[0]
        bm = mmu_embeds.shape[0]
        embeds.append(mmu_embeds)
        atts.append(mmu_att)
        poss.append(jnp.broadcast_to(jnp.arange(Lc)[None], (bm, Lc)))

        hidden, _ = qwen2.forward(
            params["llm"], cfg.llm,
            inputs_embeds=jnp.concatenate(
                [e.astype(mmu_embeds.dtype) for e in embeds], axis=0),
            mask=None if use_meta else jnp.concatenate(atts, axis=0),
            meta=M.concat_meta(*atts) if use_meta else None,
            positions=jnp.concatenate(poss, axis=0), remat=tcfg.remat)
        w = qwen2.lm_head_weight(params["llm"], cfg.llm)

        losses = {"avg_masking_rate": mask_prob.mean()}
        total = jnp.zeros((), jnp.float32)
        if bt:
            lt = _chunked_ce(hidden[:rt], w, t2i_labs_p)       # unshifted
            losses["loss_t2i"] = lt
            total = total + tcfg.t2i_coeff * lt
        if bl:
            ll = _chunked_ce(hidden[rt:rt + rl, :-1], w, lm_labs_p[:, 1:])
            losses["loss_lm"] = ll
            total = total + tcfg.lm_coeff * ll
        lmu = _chunked_ce(hidden[rt + rl:, :-1], w, mmu_labels[:, 1:])
        losses["loss_mmu"] = lmu
        total = total + tcfg.mmu_coeff * lmu
        return total, losses

    def sft_step(state: TrainState, vq_params, vision_params, batch, key):
        params = state.params
        metrics = {}
        total = jnp.zeros((), jnp.float32)
        grads = None
        if tcfg.common_length is not None and tcfg.batch_size_mmu > 0 and (
                tcfg.batch_size_t2i > 0 or tcfg.batch_size_lm > 0):
            packable = (tcfg.pack_rows and tcfg.t2i_gen_mode == "mask"
                        and not cfg.use_gen_projector)
            fused = loss_packed if packable else loss_fused
            (total, m), grads = jax.value_and_grad(fused, has_aux=True)(
                params, vq_params, vision_params, batch, key)
            metrics.update(m)
        else:
            if tcfg.batch_size_t2i > 0 or tcfg.batch_size_lm > 0:
                (l1, m1), grads = jax.value_and_grad(loss_tl, has_aux=True)(
                    params, vq_params, batch, key)
                metrics.update(m1)
                total = total + l1
            if tcfg.batch_size_mmu > 0:
                (l2, m2), g2 = jax.value_and_grad(loss_mmu, has_aux=True)(
                    params, vision_params, batch)
                metrics.update(m2)
                total = total + l2
                grads = g2 if grads is None else jax.tree_util.tree_map(
                    jnp.add, grads, g2)
        metrics["loss"] = total
        metrics.setdefault("avg_masking_rate", jnp.zeros(()))
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    sft_step.loss_tl = loss_tl
    sft_step.loss_mmu = loss_mmu
    return sft_step


def make_sft_grad_fns(
    cfg: UniGenConfig,
    vq_cfg: magvit.MagvitConfig,
    vision_cfg,
    tx: optax.GradientTransformation,
    tcfg: SFTStepConfig,
):
    """The SFT step as three separately-jittable programs for memory-tight
    single-chip runs.

    One fused program must hold the optimizer state (~9.3GB at 1.5B in bf16)
    PLUS two stacked-gradient trees — one from the t2i+lm backward layer-scan
    and one from the mmu backward at its longer sequence (~3.1GB each) — which
    exceeds a 16GB v5e chip at ANY batch size (measured: 16.27G needed, and
    the fixed costs dominate — see BENCH.md training section). Splitting the
    dispatch keeps at most state + ONE gradient set + apply temps resident:

        g1, aux1 = jit(grad_tl)(state.params, vq_params, batch, key)
        g2, aux2 = jit(grad_mmu)(state.params, vision_params, batch)
        state, metrics = jit(apply_grads, donate_argnums=(0, 1, 2))(
            state, g1, g2, aux1, aux2)

    Gradient-of-sum == sum-of-gradients, so this matches make_sft_train_step
    exactly (tests/test_hf_import.py::test_sft_split_dispatch_matches_fused);
    the extra dispatches cost only relay/host latency (~ms) per step. Use the
    fused step for sharded multi-chip runs where HBM is not the constraint.
    """
    if not (tcfg.batch_size_t2i > 0 or tcfg.batch_size_lm > 0) or \
            not tcfg.batch_size_mmu > 0:
        raise ValueError("split dispatch needs both task groups; use "
                         "make_sft_train_step when one group is empty")
    step = make_sft_train_step(cfg, vq_cfg, vision_cfg, tx, tcfg)

    def grad_tl(params, vq_params, batch, key):
        (l1, m1), g1 = jax.value_and_grad(step.loss_tl, has_aux=True)(
            params, vq_params, batch, key)
        return g1, (l1, m1)

    def grad_mmu(params, vision_params, batch):
        (l2, m2), g2 = jax.value_and_grad(step.loss_mmu, has_aux=True)(
            params, vision_params, batch)
        return g2, (l2, m2)

    def apply_grads(state: TrainState, g1, g2, aux1, aux2):
        l1, m1 = aux1
        l2, m2 = aux2
        grads = jax.tree_util.tree_map(jnp.add, g1, g2)
        metrics = {**m1, **m2, "loss": l1 + l2}
        metrics.setdefault("avg_masking_rate", jnp.zeros(()))
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return grad_tl, grad_mmu, apply_grads
