"""Trainer-loop unit test: synthetic flows, resume, metrics file."""
import json
import os

import jax
import numpy as np
import pytest

from unigen_tpu.models import magvit as MV
from unigen_tpu.models import unigen as U
from unigen_tpu.prompting import UniPrompting
from unigen_tpu.training import lr_schedules as LRS
from unigen_tpu.training.optimizer import make_optimizer
from unigen_tpu.training.train_step import TrainStepConfig
from unigen_tpu.training.trainer import Trainer, TrainerConfig

from test_prompting import MockTokenizer, SPECIALS


def _flows(b, res, n_batches):
    rng = np.random.default_rng(0)
    for i in range(n_batches):
        yield {
            "t2i_flow": {"images": rng.normal(size=(b, res, res, 3)).astype(np.float32),
                         "input_ids": ["a cat", "a dog"][:b] * (b // min(b, 2))},
            "lm_flow": {"input_ids": [f"doc {i}"] * b},
            "mmu_flow": {"images": rng.normal(size=(b, res, res, 3)).astype(np.float32),
                         "input_ids": ["what is it?"] * b},
        }


def _build(tmp_path, max_steps=3, ema_decay=0.0):
    tok = MockTokenizer()
    prompting = UniPrompting(tok, special_tokens=SPECIALS, max_seq_len=40,
                             cond_dropout_prob=0.1)
    cfg = U.UniGenConfig.tiny(text_vocab_len=len(tok))
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    params = U.init(jax.random.key(0), cfg)
    vq_params = MV.init(jax.random.key(1), vq_cfg)
    schedule = LRS.get_scheduler("constant")
    tx = make_optimizer(params, 1e-3, schedule)
    tcfg = TrainStepConfig(batch_size_t2i=2, batch_size_lm=2, batch_size_mmu=2,
                           pad_id=prompting.pad_id,
                           soi_id=prompting.sptids_dict["<|soi|>"],
                           eoi_id=prompting.sptids_dict["<|eoi|>"])
    trainer_cfg = TrainerConfig(output_dir=str(tmp_path), max_train_steps=max_steps,
                                log_every=1, save_every=2, visualize_every=3, seed=0,
                                ema_decay=ema_decay)
    return Trainer(cfg, vq_cfg, tcfg, trainer_cfg, prompting, tx, params, vq_params)


def test_trainer_runs_saves_and_resumes(tmp_path):
    trainer = _build(tmp_path, max_steps=3)
    state = trainer.train(_flows(2, 8, 10))
    assert int(state.step) == 3
    ckpts = [d for d in os.listdir(tmp_path) if d.startswith("checkpoint")]
    assert "checkpoint-2" in ckpts and "checkpoint-3" in ckpts
    assert os.path.isdir(os.path.join(tmp_path, "checkpoint-3", "unwrapped_model"))
    with open(os.path.join(tmp_path, "metrics.jsonl")) as f:
        logs = [json.loads(l) for l in f]
    assert any("loss" in l and np.isfinite(l["loss"]) for l in logs)
    # samples/sec is averaged over the meter window (reference train.py:808-819)
    assert any(l.get("samples_per_sec_per_device", 0) > 0 for l in logs)
    # visualize_predictions triptych fired at step 3 and is surfaced in metrics
    vis = [l["visualization"] for l in logs if "visualization" in l]
    assert vis and os.path.isfile(vis[0])

    # a fresh trainer resumes from checkpoint-3 and continues to 5
    trainer2 = _build(tmp_path, max_steps=5)
    assert trainer2.global_step == 3
    state2 = trainer2.train(_flows(2, 8, 10))
    assert int(state2.step) == 5


def test_trainer_throughput_is_window_averaged(tmp_path):
    """The timing meters must reset at every log window: the first window
    contains the step compile, and without the reset every later window's
    samples_per_sec is cumulative-since-start (the r5 live-input bench logged
    a clean 0.8 s/step window as 63 s/step). Window 1 always holds the
    compile, so a true window average makes later batch_time far smaller."""
    trainer = _build(tmp_path, max_steps=6)
    trainer.tr.log_every = 2
    trainer.train(_flows(2, 8, 10))
    with open(os.path.join(tmp_path, "metrics.jsonl")) as f:
        logs = [json.loads(l) for l in f if "batch_time" in l]
    assert len(logs) >= 3
    # compile lives in window 1; windows 2+ must not inherit its average
    assert logs[-1]["batch_time"] < logs[0]["batch_time"] / 2
    assert logs[-1]["samples_per_sec_per_device"] > \
        2 * logs[0]["samples_per_sec_per_device"]


def test_trainer_ema_tracks_and_survives_resume(tmp_path):
    """With ema_decay>0 the in-step EMA advances with training, survives a
    checkpoint resume exactly, and is what the portable export contains
    (live version of the reference's unused EMA, training_utils.py:59-295)."""
    import orbax.checkpoint as ocp

    trainer = _build(tmp_path, max_steps=2, ema_decay=0.999)
    assert trainer.state.ema is not None
    ema0 = jax.tree_util.tree_map(np.asarray, trainer.state.ema.params)
    state = trainer.train(_flows(2, 8, 10))
    assert int(state.ema.step) == 2
    ema2 = jax.tree_util.tree_map(np.asarray, state.ema.params)
    p2 = jax.tree_util.tree_map(np.asarray, state.params)
    moved = any(not np.array_equal(a, b)
                for a, b in zip(jax.tree_util.tree_leaves(ema0),
                                jax.tree_util.tree_leaves(ema2)))
    assert moved, "EMA params never updated"
    distinct = any(not np.array_equal(a, b)
                   for a, b in zip(jax.tree_util.tree_leaves(ema2),
                                   jax.tree_util.tree_leaves(p2)))
    assert distinct, "EMA params identical to raw params"

    # the portable export carries the EMA weights, not the raw params
    with ocp.StandardCheckpointer() as ckptr:
        exported = ckptr.restore(
            os.path.abspath(os.path.join(tmp_path, "checkpoint-2", "unwrapped_model")))
    emb = exported["llm"]["embed"]["weight"]
    np.testing.assert_array_equal(np.asarray(emb), ema2["llm"]["embed"]["weight"])

    # resume restores the EMA stream bitwise and keeps advancing it
    trainer2 = _build(tmp_path, max_steps=4, ema_decay=0.999)
    assert trainer2.global_step == 2
    got = jax.tree_util.tree_map(np.asarray, trainer2.state.ema.params)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(a, b),
                           ema2, got)
    state2 = trainer2.train(_flows(2, 8, 10))
    assert int(state2.ema.step) == 4


def test_trainer_llava_und_type(tmp_path):
    """mmu_conv (pre-tokenized conversations) flow through the trainer."""
    tok = MockTokenizer()
    prompting = UniPrompting(tok, special_tokens=SPECIALS, max_seq_len=40,
                             cond_dropout_prob=0.0)
    cfg = U.UniGenConfig.tiny(text_vocab_len=len(tok))
    vq_cfg = MV.MagvitConfig.tiny(resolution=8, z_channels=5)
    params = U.init(jax.random.key(0), cfg)
    vq_params = MV.init(jax.random.key(1), vq_cfg)
    schedule = LRS.get_scheduler("constant")
    tx = make_optimizer(params, 1e-3, schedule)
    tcfg = TrainStepConfig(batch_size_t2i=0, batch_size_lm=0, batch_size_mmu=2,
                           pad_id=prompting.pad_id,
                           soi_id=prompting.sptids_dict["<|soi|>"],
                           eoi_id=prompting.sptids_dict["<|eoi|>"])
    trainer_cfg = TrainerConfig(output_dir=str(tmp_path), max_train_steps=1,
                                log_every=1, save_every=100, seed=0,
                                und_type="llava", resume_from_checkpoint=None)
    trainer = Trainer(cfg, vq_cfg, tcfg, trainer_cfg, prompting, tx, params, vq_params)

    rng = np.random.default_rng(0)
    n = cfg.num_vq_tokens
    width = prompting.max_seq_len - n - 3
    ids = rng.integers(3, 100, size=(2, width))
    ids[:, -1] = 501  # eos so the eos-scan finds a stop
    labels = np.where(rng.random((2, width)) < 0.5, ids, -100)

    def flow():
        yield {"mmu_flow": {"images": rng.normal(size=(2, 8, 8, 3)).astype(np.float32),
                            "input_ids": ids, "labels": labels}}

    state = trainer.train(flow())
    assert int(state.step) == 1
