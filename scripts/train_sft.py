#!/usr/bin/env python
"""SFT training entry point (the reference's training/train_w_clip_vit.py):
t2i + lm + continuous-SigLIP mmu conversations.

Usage:
  python scripts/train_sft.py config=configs/unigen_1_5b/unigen_sft.yaml \
      dataset.params.llava_data_paths='["llava.json"]' \
      dataset.params.llava_image_root=imgs/
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
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.sft import SFTStepConfig, make_sft_train_step
    from unigen_tpu.training.train_step import init_train_state
    from unigen_tpu.utils import checkpoint as CK
    from unigen_tpu.utils.configuration import initialize_config
    from unigen_tpu.utils.logging import MetricLogger, get_logger

    logger = get_logger("train_sft")
    overrides = sys.argv[1:]
    cfg_path = next((o.split("=", 1)[1] for o in overrides if o.startswith("config=")),
                    None)
    config = initialize_config(cfg_path, overrides)

    tokenizer = launch.load_tokenizer(config)
    prompting = launch.build_prompting(config, tokenizer)
    params, cfg = launch.build_unigen(config, prompting)
    vq_params, vq_cfg = launch.build_vq(config)
    vs_params, vs_cfg = launch.build_vision_tower(config)
    assert vs_cfg is not None, "SFT needs model.vision_tower.name"

    # Parameter-efficient SFT (beyond-reference; training/lora.py): with
    # model.lora.rank set, adapters go on the backbone's dense layers, the
    # optimizer trains only them (plus lora.extra_tunable modules — the MM
    # projector by default, the usual LoRA-SFT recipe), and the final save
    # can optionally export merged base weights.
    lora_cfg = config.model.get("lora", {}) or {}
    lora_rank = int(lora_cfg.get("rank", 0) or 0)
    merge_on_save = False
    if lora_rank > 0:
        from unigen_tpu.training import lora as LORA
        targets = lora_cfg.get("targets")
        params = dict(params)
        params["llm"] = LORA.add_lora(
            params["llm"], jax.random.key(int(lora_cfg.get("seed", 7))),
            lora_rank,
            alpha=float(lora_cfg["alpha"]) if lora_cfg.get("alpha") is not None else None,
            targets=tuple(targets) if targets else LORA.DEFAULT_TARGETS)
        extra = lora_cfg.get("extra_tunable", ["mm_projector"])
        config.model.mm_tunable_parts = list(LORA.lora_tunable_parts()) + list(extra or [])
        merge_on_save = bool(lora_cfg.get("merge_on_save", False))
        if merge_on_save:
            # fail fast at launch, not after all training steps: merge_lora
            # refuses int8-only nodes (QLoRA base), so validate mergeability
            # while the config is being parsed
            tgt = tuple(targets) if targets else LORA.DEFAULT_TARGETS
            for path in tgt:
                node = params["llm"]["layers"]
                for part in path.split("/"):
                    node = node[part]
                if "kernel" not in node:
                    raise ValueError(
                        f"model.lora.merge_on_save=true but target '{path}' has an "
                        "int8-only base (QLoRA): merging would change the "
                        "quantization grid. Train with merge_on_save=false and "
                        "keep adapters on the runtime path, or use a bf16 base.")
        logger.info(f"LoRA rank {lora_rank}: "
                    f"{LORA.lora_param_count(params['llm']):,} adapter params; "
                    f"tunable = {config.model.mm_tunable_parts}")

    tr = config.training
    schedule = LRS.get_scheduler(
        config.lr_scheduler.scheduler,
        num_warmup_steps=config.lr_scheduler.params.warmup_steps,
        num_training_steps=tr.max_train_steps)
    opt = config.optimizer.params
    lr_mapper = config.model.get("lr_mapper", None)
    tunable = config.model.get("mm_tunable_parts", None)
    tx = make_optimizer(params, float(opt.learning_rate), schedule,
                        beta1=float(opt.beta1), beta2=float(opt.beta2),
                        epsilon=float(opt.epsilon),
                        weight_decay=float(opt.weight_decay),
                        max_grad_norm=tr.get("max_grad_norm"),
                        tunable_parts=tunable.split(",") if isinstance(tunable, str)
                        else tunable,
                        lr_mapper=dict(lr_mapper) if lr_mapper else None)
    tcfg = SFTStepConfig(
        batch_size_t2i=tr.batch_size_t2i, batch_size_lm=tr.batch_size_lm,
        batch_size_mmu=tr.batch_size_mmu,
        t2i_coeff=tr.get("t2i_coeff", 1.0), lm_coeff=tr.get("lm_coeff", 0.1),
        mmu_coeff=tr.get("mmu_coeff", 1.0),
        min_masking_rate=tr.get("min_masking_rate", 0.0),
        max_grad_norm=tr.get("max_grad_norm"), pad_id=prompting.pad_id,
        soi_id=prompting.sptids_dict["<|soi|>"],
        eoi_id=prompting.sptids_dict["<|eoi|>"],
        n_grid=tr.get("n_grid", 0),
        remat=config.model.get("gradient_checkpointing", False))
    # common_length is resolved against the first batch's mmu splice length
    # below: when it covers the t2i/lm rows, all three flows run as ONE
    # backbone call — the memory shape that fits flagship SFT on a 16GB chip
    # (training/sft.py::loss_fused); otherwise separate per-length calls.
    step = None
    state = init_train_state(params, tx)
    resume_step = 0
    if config.experiment.get("resume_from_checkpoint"):
        # reference train_w_clip_vit.py:213-235: scan checkpoint-* dirs and
        # restart from the newest trainer state
        want = config.experiment.resume_from_checkpoint
        path = (CK.latest_checkpoint(config.experiment.output_dir)
                if want == "latest" else want)
        if path and os.path.isdir(os.path.join(path, "state")):
            logger.info(f"resuming from checkpoint {path}")
            state = CK.restore_checkpoint(path, state)
            resume_step = CK.resume_step(path)
    metrics_log = MetricLogger(config.experiment.output_dir)

    res = config.dataset.preprocessing.resolution
    vres = vs_cfg.image_size * (tcfg.n_grid if tcfg.n_grid else 1)
    n = cfg.num_vq_tokens

    def batches():
        if config.dataset.get("synthetic", False):
            rng = np.random.default_rng(0)
            bt, bl, bm = tr.batch_size_t2i, tr.batch_size_lm, tr.batch_size_mmu
            tok = prompting.text_tokenizer
            while True:
                conv = [{"from": "human", "value": "what is this?"},
                        {"from": "gpt", "value": "a cat"}]
                from unigen_tpu.data.llava import collate_batch, preprocess_qwen
                proc = preprocess_qwen([conv] * bm, tok)
                samples = [{"input_ids": proc["input_ids"][i],
                            "labels": proc["labels"][i],
                            "image": rng.normal(size=(vres, vres, 3)).astype(np.float32)}
                           for i in range(bm)]
                mmu = collate_batch(samples, prompting.pad_id, max_length=64)
                yield {
                    "t2i": {"images": rng.normal(size=(bt, res, res, 3)).astype(np.float32),
                            "texts": ["a red cat"] * bt},
                    "lm": {"texts": ["some document"] * bl},
                    "mmu": mmu,
                }
        else:
            from unigen_tpu.data.combined import combined_loader
            from unigen_tpu.data.llava import LlavaDataset
            from unigen_tpu.data.text2image import Text2ImageDataset
            flows = {
                "t2i": ({"images": b["images"], "texts": b["input_ids"]}
                        for b in Text2ImageDataset(
                            config.dataset.params.train_t2i_shards_path_or_url,
                            per_device_batch_size=tr.batch_size_t2i, resolution=res)),
                "mmu": iter(LlavaDataset(
                    config.dataset.params.llava_data_paths,
                    config.dataset.params.llava_image_root, tokenizer,
                    per_device_batch_size=tr.batch_size_mmu, visual_mode="siglip")),
            }
            for b in combined_loader(flows):
                yield {"t2i": b["t2i"], "mmu": b["mmu"],
                       "lm": {"texts": [""] * tr.batch_size_lm}}

    key = jax.random.key(tr.get("seed", 10084))
    global_step = resume_step
    placeholder = np.zeros((tr.batch_size_t2i, n), np.int64)
    for fb in batches():
        if global_step >= tr.max_train_steps:
            break
        ids, _, labels = prompting((fb["t2i"]["texts"], placeholder, placeholder), "t2i")
        lm_ids, _, lm_labels = prompting((fb["lm"]["texts"], prompting.max_seq_len), "lm")
        mmu = fb["mmu"]
        b = mmu["input_ids"].shape[0]
        head = [prompting.sptids_dict[t] for t in
                (("<|mmu|>", "<|im_start|>", "<|soi|>") if prompting.task_token_first
                 else ("<|im_start|>", "<|mmu|>", "<|soi|>"))]
        part1 = np.tile(np.asarray(head, np.int64), (b, 1))
        part2 = np.concatenate([np.full((b, 1), prompting.sptids_dict["<|eoi|>"]),
                                mmu["input_ids"][:, 1:]], axis=1)
        p_tokens = (vs_cfg.image_size // vs_cfg.patch_size) ** 2
        if tcfg.n_grid:
            p_tokens *= 1 + tcfg.n_grid ** 2
        mmu_labels = np.concatenate([np.full((b, 3 + p_tokens + 1), -100),
                                     mmu["labels"][:, 1:]], axis=1)
        prompt_len = np.full((b,), part1.shape[1] + p_tokens + part2.shape[1])
        key, sub = jax.random.split(key)
        device_batch = {
            "t2i_template": jnp.asarray(ids), "t2i_labels": jnp.asarray(labels),
            "t2i_pixels": jnp.asarray(fb["t2i"]["images"]),
            "lm_ids": jnp.asarray(lm_ids), "lm_labels": jnp.asarray(lm_labels),
            "mmu_part1": jnp.asarray(part1), "mmu_part2": jnp.asarray(part2),
            "mmu_labels": jnp.asarray(mmu_labels),
            "mmu_pixels": jnp.asarray(mmu["images"]),
            "mmu_prompt_len": jnp.asarray(prompt_len),
        }
        if step is None:
            import dataclasses as _dc
            mmu_len = part1.shape[1] + p_tokens + part2.shape[1]
            tl_lens = [device_batch[k].shape[1]
                       for k, bs in (("t2i_template", tcfg.batch_size_t2i),
                                     ("lm_ids", tcfg.batch_size_lm)) if bs > 0]
            # fusion only applies when a short t2i/lm group exists (the CoT-V
            # post-SFT stage is mmu-only, reference unigen_cotv_post_sft.yaml)
            common = int(mmu_len) if tl_lens and mmu_len >= max(tl_lens) else None
            logger.info(f"SFT step mode: common_length={common} "
                        f"(mmu {mmu_len}, t2i/lm {tl_lens})")
            step = jax.jit(
                make_sft_train_step(cfg, vq_cfg, vs_cfg, tx,
                                    _dc.replace(tcfg, common_length=common)),
                donate_argnums=(0,))
        state, metrics = step(state, vq_params, vs_params, device_batch, sub)
        global_step += 1
        if global_step % config.experiment.get("log_every", 50) == 0:
            metrics_log.log(metrics, global_step)
            logger.info(f"step {global_step}: loss={float(metrics['loss']):.4f}")
        if global_step % config.experiment.get("save_every", 10000) == 0:
            CK.save_checkpoint(state, config.experiment.output_dir, global_step,
                               unwrapped_params=state.params)
    final_params = state.params
    if merge_on_save:
        # export plain base weights (zero inference overhead; reloadable by
        # every loader) alongside the trainer state
        from unigen_tpu.training.lora import merge_lora
        final_params = dict(final_params)
        final_params["llm"] = merge_lora(final_params["llm"])
        logger.info("merged LoRA adapters into the exported base weights")
    CK.save_checkpoint(state, config.experiment.output_dir, global_step,
                       unwrapped_params=final_params)


if __name__ == "__main__":
    main()
