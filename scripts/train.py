#!/usr/bin/env python
"""Unified pretraining entry point (the reference's training/train.py).

Usage:
  python scripts/train.py config=configs/unigen_1_5b/unigen_pt1.yaml \
      training.max_train_steps=100 dataset.synthetic=true

With ``dataset.synthetic=true`` the three task flows are generated on the fly
(random pixels + captions) so the full trainer runs without datasets on disk.
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_flows(config, n_batches=None):
    """Random t2i/lm/mmu batches with the configured batch sizes."""
    rng = np.random.default_rng(0)
    res = config.dataset.preprocessing.resolution
    bt = config.training.batch_size_t2i
    bl = config.training.batch_size_lm
    bm = config.training.batch_size_mmu
    captions = ["a photo of a red cat", "two dogs on grass", "a blue car",
                "a bowl of fruit on a table"]
    i = 0
    while n_batches is None or i < n_batches:
        batch = {}
        if bt:
            batch["t2i_flow"] = {
                "images": rng.normal(size=(bt, res, res, 3)).astype(np.float32),
                "input_ids": [captions[j % len(captions)] for j in range(bt)]}
        if bl:
            batch["lm_flow"] = {"input_ids": [f"document {i}-{j} text" for j in range(bl)]}
        if bm:
            batch["mmu_flow"] = {
                "images": rng.normal(size=(bm, res, res, 3)).astype(np.float32),
                "input_ids": [captions[(j + 1) % len(captions)] for j in range(bm)]}
        yield batch
        i += 1


def real_flows(config, prompting):
    from unigen_tpu.data.combined import combined_loader
    from unigen_tpu.data.text2image import Text2ImageDataset
    from unigen_tpu.data.lm_data import ParquetTextDataset
    import jax

    params = config.dataset.params
    flows = {}
    if config.training.batch_size_t2i:
        flows["t2i_flow"] = Text2ImageDataset(
            params.train_t2i_shards_path_or_url,
            per_device_batch_size=config.training.batch_size_t2i,
            resolution=config.dataset.preprocessing.resolution,
            short_caption_ratio=params.get("t2i_short_caption_ratio", 0.5))
    if config.training.batch_size_lm:
        flows["lm_flow"] = ParquetTextDataset(
            params.train_lm_shards_path_or_url,
            per_device_batch_size=config.training.batch_size_lm,
            process_index=jax.process_index(), process_count=jax.process_count())
    if config.training.batch_size_mmu:
        flows["mmu_flow"] = Text2ImageDataset(
            params.train_mmu_shards_path_or_url,
            per_device_batch_size=config.training.batch_size_mmu,
            resolution=config.dataset.preprocessing.resolution,
            add_caption_prompt=params.get("add_caption_prompt", False))
    return combined_loader(flows)


def main():
    from unigen_tpu import launch
    launch.apply_platform_env()
    from unigen_tpu.training import lr_schedules as LRS
    from unigen_tpu.training.optimizer import make_optimizer
    from unigen_tpu.training.train_step import TrainStepConfig
    from unigen_tpu.training.trainer import Trainer, TrainerConfig
    from unigen_tpu.utils.configuration import initialize_config

    overrides = sys.argv[1:]
    cfg_path = next((o.split("=", 1)[1] for o in overrides if o.startswith("config=")),
                    None)
    config = initialize_config(cfg_path, overrides)

    tokenizer = launch.load_tokenizer(config)
    prompting = launch.build_prompting(config, tokenizer)
    params, cfg = launch.build_unigen(config, prompting)
    vq_params, vq_cfg = launch.build_vq(config)

    tr = config.training
    schedule = LRS.get_scheduler(
        config.lr_scheduler.scheduler,
        num_warmup_steps=config.lr_scheduler.params.warmup_steps,
        num_training_steps=tr.max_train_steps)
    lr_mapper = config.model.get("lr_mapper", None)
    tunable = config.model.get("mm_tunable_parts", None)
    opt = config.optimizer.params
    tx = make_optimizer(
        params, float(opt.learning_rate), schedule,
        beta1=float(opt.beta1), beta2=float(opt.beta2),
        epsilon=float(opt.epsilon),
        weight_decay=float(opt.weight_decay),
        max_grad_norm=tr.get("max_grad_norm"),
        tunable_parts=tunable.split(",") if isinstance(tunable, str) else tunable,
        lr_mapper=dict(lr_mapper) if lr_mapper else None)

    tcfg = TrainStepConfig(
        batch_size_t2i=tr.batch_size_t2i, batch_size_lm=tr.batch_size_lm,
        batch_size_mmu=tr.batch_size_mmu,
        t2i_coeff=tr.get("t2i_coeff", 1.0), lm_coeff=tr.get("lm_coeff", 0.1),
        mmu_coeff=tr.get("mmu_coeff", 1.0),
        min_masking_rate=tr.get("min_masking_rate", 0.0),
        noise_type=tr.get("noise_type", "mask"),
        use_causal_mask=config.model.get("use_causal_mask", False),
        t2i_gen_mode=config.model.get("t2i_gen_mode", "mask"),
        max_grad_norm=tr.get("max_grad_norm"),
        pad_id=prompting.pad_id,
        soi_id=prompting.sptids_dict["<|soi|>"],
        eoi_id=prompting.sptids_dict["<|eoi|>"],
        grad_accum_steps=tr.get("gradient_accumulation_steps", 1),
        remat=config.model.get("gradient_checkpointing", False))

    trainer_cfg = TrainerConfig(
        output_dir=config.experiment.output_dir,
        max_train_steps=tr.max_train_steps,
        log_every=config.experiment.get("log_every", 50),
        save_every=config.experiment.get("save_every", 2000),
        checkpoints_total_limit=config.experiment.get("checkpoints_total_limit"),
        resume_from_checkpoint=config.experiment.get("resume_from_checkpoint"),
        seed=tr.get("seed", 10084),
        und_type=config.dataset.get("und_type", "captioning"),
        ema_decay=tr.get("ema_decay", 0.0))

    trainer = Trainer(cfg, vq_cfg, tcfg, trainer_cfg, prompting, tx, params, vq_params)

    if config.dataset.get("synthetic", False):
        flow = synthetic_flows(config)
    else:
        flow = real_flows(config, prompting)
    trainer.train(flow)


if __name__ == "__main__":
    main()
