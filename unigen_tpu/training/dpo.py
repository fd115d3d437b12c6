"""DPO over image preferences, fused on device.

Reference: training/train_dpo.py — chosen and rejected images are VQ-encoded and
masked with the *same* prompt (:529-548), policy and frozen-reference models run
concatenated forwards (:573-638), image-token log-probs are summed over the masked
positions of the trailing VQ block (get_batch_logps :51-90), and the loss is
``-logsigmoid(beta * (pi_logratio - ref_logratio))`` (:640-647).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import magvit, qwen2, unigen
from ..models.unigen import UniGenConfig
from ..ops import masking as MK
from ..ops import masks as M
from ..ops import sampling as S
from .train_step import TrainState, _splice

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DPOConfig:
    beta: float = 0.1
    dpo_coef: float = 1.0
    t2i_gen_mode: str = "mask"
    use_causal_mask: bool = False
    min_masking_rate: float = 0.0
    mask_schedule: str = "cosine"
    average_log_prob: bool = False
    max_grad_norm: Optional[float] = None
    pad_id: int = 0
    soi_id: int = 1
    eoi_id: int = 2
    remat: bool = False
    # Chunked logps over the trailing VQ block: the [2B, L, 160k] fp32 logits
    # tensor (≈5 GB at the reference's batch of 10 pairs) never materializes.
    # Exact match to the dense path (tests/test_dpo.py). Ignored with a gen
    # projector, whose 8k-wide img_head is already cheap.
    memory_efficient_logps: bool = True
    # Take the reference-model logps from the batch (ref_chosen_logps /
    # ref_rejected_logps, produced ahead of training by make_ref_logps_fn)
    # instead of running the frozen reference forward inside the step. DPO's
    # reference IS the step-0 policy, so this is the same training trajectory —
    # but the second 1.5B model never occupies HBM during training (the
    # difference between fitting and not fitting DPO on one 16GB chip). The
    # precompute pass runs one forward per TRAINING STEP (masking keys differ
    # per step and per epoch, so values are per-(epoch, step), not reusable) —
    # roughly 1/3 of a training step's FLOPs, paid up front.
    precomputed_ref: bool = False


def get_batch_logps(logits: Array, labels: Array, *, num_vq_tokens: int = 256,
                    t2i_gen_mode: str = "mask", average_log_prob: bool = False,
                    label_pad_token_id: int = -100) -> Array:
    """Sum (or mean) of label log-probs over the trailing VQ block
    (reference: train_dpo.py:51-90)."""
    n = num_vq_tokens
    logits = logits[:, -(n + 1):-1].astype(jnp.float32)
    labels = labels[:, -(n + 1):-1]
    loss_mask = labels != label_pad_token_id
    safe = jnp.where(loss_mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if t2i_gen_mode == "ar":
        per_tok = jnp.take_along_axis(logp[:, :-1], safe[:, 1:, None], axis=2)[..., 0]
        loss_mask = loss_mask[:, 1:]
    else:
        per_tok = jnp.take_along_axis(logp, safe[..., None], axis=2)[..., 0]
    total = (per_tok * loss_mask).sum(-1)
    if average_log_prob:
        return total / loss_mask.sum(-1)
    return total


def get_batch_logps_from_hidden(hidden: Array, w: Array, labels: Array, *,
                                average_log_prob: bool = False,
                                label_pad_token_id: int = -100,
                                chunk: int = 64) -> Array:
    """Per-row sum (or mean) of label log-probs, projecting hidden -> vocab
    chunk-by-chunk along the sequence (models.unigen._chunked_label_logps is
    the shared core). The caller pre-slices ``hidden``/``labels`` so position
    i of one predicts position i of the other; with the unified 160k
    vocabulary this keeps peak logits memory at [B, chunk, V] while matching
    ``get_batch_logps`` exactly (same bf16 matmul -> fp32 log_softmax as the
    dense head)."""
    from ..models.unigen import _chunked_label_logps
    total, count = _chunked_label_logps(hidden, w, labels,
                                        ignore_id=label_pad_token_id,
                                        chunk=chunk, per_row=True)
    if average_log_prob:
        return total / count
    return total


def _encode_and_mask(cfg, vq_cfg, dcfg, schedule, vq_params, pixels,
                     template, labels_t, key):
    """VQ-encode pixels, mask per the schedule, splice into the template
    (reference: train_dpo.py:529-548)."""
    n = cfg.num_vq_tokens
    codes = magvit.get_code(vq_params, vq_cfg, pixels)
    if dcfg.t2i_gen_mode == "mask":
        masked = MK.mask_or_random_replace_tokens(
            key, codes, cfg.codebook_size, schedule,
            min_masking_rate=dcfg.min_masking_rate,
            codebook_size=cfg.codebook_size)
        img_in_cb, img_lab_cb, mask_prob = masked.input_ids, masked.labels, masked.mask_prob
    else:
        img_in_cb, img_lab_cb = codes, codes
        mask_prob = jnp.zeros((codes.shape[0],), jnp.float32)

    if cfg.use_gen_projector:
        img_in, img_lab = img_in_cb, img_lab_cb
    else:
        img_in = jnp.where(img_in_cb == cfg.codebook_size, cfg.mask_token_id,
                           img_in_cb + cfg.text_vocab_len)
        img_lab = jnp.where(img_lab_cb < 0, img_lab_cb,
                            img_lab_cb + cfg.text_vocab_len)
    ids = _splice(template, img_in, template.shape[1] - n - 1)
    labs = _splice(labels_t, img_lab, labels_t.shape[1] - n - 1)
    if dcfg.use_causal_mask:
        att = M.causal_mask_from_attention((ids != dcfg.pad_id).astype(jnp.int32))
    else:
        att = M.create_attention_mask_predict_next(
            ids, dcfg.pad_id, dcfg.soi_id, dcfg.eoi_id, rm_pad_in_image=True)
    return ids, labs, att, mask_prob


def _concatenated_logps(cfg, dcfg, params, ids, labs, att, b):
    n = cfg.num_vq_tokens
    if dcfg.memory_efficient_logps and not cfg.use_gen_projector:
        hidden = unigen.forward(params, cfg, input_ids=ids,
                                attention_mask=att, batch_size_t2i=2 * b,
                                t2i_mode=dcfg.t2i_gen_mode,
                                remat=dcfg.remat, return_hidden=True)
        w = qwen2.lm_head_weight(params["llm"], cfg.llm)
        if dcfg.t2i_gen_mode == "ar":
            # dense path: logits block [:-1] predicts labels block [1:]
            h, lab = hidden[:, -(n + 1):-2], labs[:, -n:-1]
        else:
            h, lab = hidden[:, -(n + 1):-1], labs[:, -(n + 1):-1]
        logps = get_batch_logps_from_hidden(
            h, w, lab, average_log_prob=dcfg.average_log_prob)
        return logps[:b], logps[b:]
    out = unigen.forward(params, cfg, input_ids=ids, attention_mask=att,
                         batch_size_t2i=2 * b, t2i_mode=dcfg.t2i_gen_mode,
                         remat=dcfg.remat)
    logits = out if not isinstance(out, tuple) else out[0]
    logps = get_batch_logps(logits, labs, num_vq_tokens=n,
                            t2i_gen_mode=dcfg.t2i_gen_mode,
                            average_log_prob=dcfg.average_log_prob)
    return logps[:b], logps[b:]


def _build_pair_inputs(cfg, vq_cfg, dcfg, schedule, vq_params, batch, key):
    """Concatenated [chosen; rejected] ids/labels/mask for one batch+key.

    Shared between the training step and the reference-logps precompute pass
    so both see identical masking draws for the same key."""
    k_c, k_r = jax.random.split(key)
    c_ids, c_labs, c_att, c_prob = _encode_and_mask(
        cfg, vq_cfg, dcfg, schedule, vq_params, batch["chosen_pixels"],
        batch["template"], batch["labels"], k_c)
    r_ids, r_labs, r_att, r_prob = _encode_and_mask(
        cfg, vq_cfg, dcfg, schedule, vq_params, batch["rejected_pixels"],
        batch["template"], batch["labels"], k_r)
    ids = jnp.concatenate([c_ids, r_ids], axis=0)
    labs = jnp.concatenate([c_labs, r_labs], axis=0)
    att = jnp.concatenate([c_att, r_att], axis=0)
    return ids, labs, att, c_prob, r_prob


def make_ref_logps_fn(cfg: UniGenConfig, vq_cfg: magvit.MagvitConfig,
                      dcfg: DPOConfig) -> Callable:
    """Reference-model log-probs for one batch, as its own jittable program.

    DPO's reference policy is the frozen snapshot of the policy at step 0
    (reference: train_dpo.py copies the model before training), so every
    (sample, masking-key) pair's reference logps can be computed BEFORE
    training from the initial parameters and stored with the data:

        ref_fn = jax.jit(make_ref_logps_fn(cfg, vq_cfg, dcfg))
        refs = ref_fn(initial_params, vq_params, batch, key)  # dict of [B]
        batch.update(refs)   # then run the precomputed_ref=True step

    The training step then never holds a second 1.5B model (or its forward)
    in HBM — the difference between fitting and not fitting flagship DPO on a
    16GB chip. The pass costs one forward per TRAINING STEP (masking keys
    differ per step and per epoch, so each (epoch, step) needs its own
    values). Identical trajectory to the online path for the same keys
    (tests/test_dpo.py)."""
    schedule = S.get_mask_schedule(dcfg.mask_schedule)

    def ref_logps(params, vq_params, batch, key):
        ids, labs, att, _, _ = _build_pair_inputs(
            cfg, vq_cfg, dcfg, schedule, vq_params, batch, key)
        b = batch["template"].shape[0]
        rc, rr = _concatenated_logps(cfg, dcfg, jax.lax.stop_gradient(params),
                                     ids, labs, att, b)
        return {"ref_chosen_logps": rc, "ref_rejected_logps": rr}

    return ref_logps


def make_dpo_step(cfg: UniGenConfig, vq_cfg: magvit.MagvitConfig,
                  tx: optax.GradientTransformation, dcfg: DPOConfig) -> Callable:
    """Build the jitted DPO step.

    batch fields:
      template  [B, L]  — t2i prompt template (zeros in the image block)
      labels    [B, L]  — label template (zeros in the image block)
      chosen_pixels / rejected_pixels [B, H, W, 3]
      ref_chosen_logps / ref_rejected_logps [B]  — required (and ref_params
        ignored, pass None) when ``dcfg.precomputed_ref``; see make_ref_logps_fn
    step(state, ref_params, vq_params, batch, key) -> (state, metrics)
    """
    schedule = S.get_mask_schedule(dcfg.mask_schedule)

    def dpo_step(state: TrainState, ref_params, vq_params, batch, key):
        b = batch["template"].shape[0]
        ids, labs, att, c_prob, r_prob = _build_pair_inputs(
            cfg, vq_cfg, dcfg, schedule, vq_params, batch, key)

        def loss_fn(params):
            pc, pr = _concatenated_logps(cfg, dcfg, params, ids, labs, att, b)
            if dcfg.precomputed_ref:
                rc = batch["ref_chosen_logps"]
                rr = batch["ref_rejected_logps"]
            else:
                rc, rr = _concatenated_logps(
                    cfg, dcfg, jax.lax.stop_gradient(ref_params),
                    ids, labs, att, b)
            logits_diff = (pc - pr) - (rc - rr)
            loss = dcfg.dpo_coef * (-jax.nn.log_sigmoid(dcfg.beta * logits_diff)).mean()
            metrics = {
                "loss": loss,
                "reward_accuracy": ((pc - pr) > (rc - rr)).mean(),
                "policy_chosen_logps": pc.mean(),
                "policy_rejected_logps": pr.mean(),
                "chosen_masking_rate": c_prob.mean(),
                "rejected_masking_rate": r_prob.mean(),
            }
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return dpo_step
