#!/usr/bin/env python
"""DPO training entry point (the reference's training/train_dpo.py).

Usage:
  python scripts/train_dpo.py config=configs/unigen_1_5b/unigen_dpo.yaml \
      dataset.params.dpo_data_path=pairs.json dataset.params.dpo_image_root=imgs/
Synthetic smoke: dataset.synthetic=true
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from unigen_tpu import launch
    launch.apply_platform_env()
    from unigen_tpu.training import lr_schedules as LRS
    from unigen_tpu.training.dpo import DPOConfig, make_dpo_step
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.train_step import init_train_state
    from unigen_tpu.utils import checkpoint as CK
    from unigen_tpu.utils.configuration import initialize_config
    from unigen_tpu.utils.logging import MetricLogger, get_logger

    logger = get_logger("train_dpo")
    overrides = sys.argv[1:]
    cfg_path = next((o.split("=", 1)[1] for o in overrides if o.startswith("config=")),
                    None)
    config = initialize_config(cfg_path, overrides)

    tokenizer = launch.load_tokenizer(config)
    prompting = launch.build_prompting(config, tokenizer)
    params, cfg = launch.build_unigen(config, prompting)
    vq_params, vq_cfg = launch.build_vq(config)

    tr = config.training
    n = cfg.num_vq_tokens
    b = tr.batch_size_t2i
    # precompute_ref: DPO's reference policy is the frozen step-0 policy, so a
    # forward-only pass ahead of training computes every batch's reference
    # logps and the second 1.5B model is never HBM-resident during training —
    # the memory shape that fits flagship DPO on one 16GB chip (exactness:
    # tests/test_dpo.py::test_dpo_precomputed_ref_matches_online). Needs the
    # deterministic (seeded) dataset so the ref pass replays the training
    # schedule; the synthetic smoke stream keeps the online reference.
    use_precomputed = bool(tr.get("precompute_ref", False)) \
        and not config.dataset.get("synthetic", False)
    ref_params = None if use_precomputed \
        else jax.tree_util.tree_map(jnp.copy, params)  # frozen reference policy

    schedule = LRS.get_scheduler(
        config.lr_scheduler.scheduler,
        num_warmup_steps=config.lr_scheduler.params.warmup_steps,
        num_training_steps=tr.get("max_train_steps", 10000))
    opt = config.optimizer.params
    tx = make_optimizer(params, float(opt.learning_rate), schedule,
                        beta1=float(opt.beta1), beta2=float(opt.beta2),
                        epsilon=float(opt.epsilon),
                        weight_decay=float(opt.weight_decay),
                        max_grad_norm=tr.get("max_grad_norm"))
    dcfg = DPOConfig(beta=tr.get("beta", 0.1), dpo_coef=tr.get("dpo_coef", 1.0),
                     min_masking_rate=tr.get("min_masking_rate", 0.0),
                     pad_id=prompting.pad_id,
                     soi_id=prompting.sptids_dict["<|soi|>"],
                     eoi_id=prompting.sptids_dict["<|eoi|>"],
                     max_grad_norm=tr.get("max_grad_norm"),
                     remat=config.model.get("gradient_checkpointing", False),
                     precomputed_ref=use_precomputed)
    step = jax.jit(make_dpo_step(cfg, vq_cfg, tx, dcfg), donate_argnums=(0,))
    state = init_train_state(params, tx)
    resume_from = 0
    if config.experiment.get("resume_from_checkpoint"):
        # reference train_dpo.py:322+: scan checkpoint-* dirs and restart from
        # the newest trainer state. The deterministic schedule below is then
        # SKIPPED up to the resumed step, so data order, masking keys, and the
        # precomputed reference cache all stay aligned (the reference loses
        # the data position on resume; here it is exact).
        want = config.experiment.resume_from_checkpoint
        path = (CK.latest_checkpoint(config.experiment.output_dir)
                if want == "latest" else want)
        if path and os.path.isdir(os.path.join(path, "state")):
            logger.info(f"resuming from checkpoint {path}")
            state = CK.restore_checkpoint(path, state)
            resume_from = CK.resume_step(path)
    metrics_log = MetricLogger(config.experiment.output_dir)

    def batches():
        if config.dataset.get("synthetic", False):
            rng = np.random.default_rng(0)
            res = config.dataset.preprocessing.resolution
            while True:
                yield {"batch_prompt_list": ["a red cat"] * b,
                       "batch_chosen_image": rng.normal(size=(b, res, res, 3)).astype(np.float32),
                       "batch_rejected_image": rng.normal(size=(b, res, res, 3)).astype(np.float32)}
        else:
            from unigen_tpu.data.dpo_data import DPODataset
            ds = DPODataset([config.dataset.params.dpo_data_path],
                            config.dataset.params.dpo_image_root,
                            per_device_batch_size=b,
                            resolution=config.dataset.preprocessing.resolution)
            for epoch in range(tr.get("num_epoch", 1)):
                yield from iter(ds)

    start_key = jax.random.key(tr.get("seed", 10084))
    max_steps = tr.get("max_train_steps", None)
    placeholder = np.zeros((b, n), np.int64)

    def step_schedule():
        """(device_batch, masking key) pairs; deterministic, so the reference
        precompute pass and the training pass see identical batches and
        masking draws. Prompting keeps a stateful host RNG for conditioning
        dropout — re-seed it at the start of EVERY pass or the two passes
        would draw different dropout masks and the cached reference logps
        would silently describe different inputs."""
        prompting.rng = np.random.default_rng(tr.get("seed", 10084))
        key, gs = start_key, 0
        for batch in batches():
            if max_steps and gs >= max_steps:
                return
            ids, _, labels = prompting((batch["batch_prompt_list"], placeholder,
                                        placeholder), "t2i")
            key, sub = jax.random.split(key)
            yield {
                "template": jnp.asarray(ids), "labels": jnp.asarray(labels),
                "chosen_pixels": jnp.asarray(batch["batch_chosen_image"]),
                "rejected_pixels": jnp.asarray(batch["batch_rejected_image"]),
            }, sub
            gs += 1

    def batch_fingerprint(db):
        """Cheap content check that the training pass sees the precompute
        pass's batch k at step k — the dataset skips unreadable images
        (nothrow), so a transient IO failure in one pass would otherwise
        silently shift every later batch against its cached reference."""
        return (int(np.asarray(db["template"]).sum()),
                float(np.asarray(db["chosen_pixels"]).sum()),
                float(np.asarray(db["rejected_pixels"]).sum()))

    ref_cache = None
    if use_precomputed:
        import time as _time
        from unigen_tpu.training.dpo import make_ref_logps_fn
        ref_fn = jax.jit(make_ref_logps_fn(cfg, vq_cfg, dcfg))
        t0 = _time.time()
        ref_cache = [(batch_fingerprint(db),
                      jax.tree_util.tree_map(np.asarray,
                                             ref_fn(params, vq_params, db, sub)))
                     for db, sub in step_schedule()]
        logger.info(f"precomputed reference logps for {len(ref_cache)} steps "
                    f"in {_time.time() - t0:.1f}s (forward-only pass; the "
                    "reference model is now released)")

    global_step = 0
    for device_batch, sub in step_schedule():
        if global_step < resume_from:
            global_step += 1
            continue
        if use_precomputed:
            if global_step >= len(ref_cache):
                raise RuntimeError(
                    f"training pass yielded more steps than the reference "
                    f"precompute pass ({len(ref_cache)}) — the dataset did "
                    "not replay identically (transient data error?)")
            fp, refs = ref_cache[global_step]
            if fp != batch_fingerprint(device_batch):
                raise RuntimeError(
                    f"step {global_step}: batch does not match the reference "
                    "precompute pass — the dataset did not replay identically "
                    "(transient data error?); rerun or disable precompute_ref")
            device_batch = {**device_batch, **refs}
        state, metrics = step(state, ref_params, vq_params, device_batch, sub)
        global_step += 1
        if global_step % config.experiment.get("log_every", 20) == 0:
            metrics_log.log(metrics, global_step)
            logger.info(f"step {global_step}: dpo_loss={float(metrics['loss']):.4f} "
                        f"acc={float(metrics['reward_accuracy']):.3f}")
        if global_step % config.experiment.get("save_every", 500) == 0:
            CK.save_checkpoint(state, config.experiment.output_dir, global_step,
                               unwrapped_params=state.params)
    CK.save_checkpoint(state, config.experiment.output_dir, global_step,
                       unwrapped_params=state.params)


if __name__ == "__main__":
    main()
