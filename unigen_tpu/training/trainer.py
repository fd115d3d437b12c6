"""Unified pretraining orchestration (the reference's training/train.py:59-883).

Host side per step: take the three task flows (t2i/lm/mmu), assemble prompt
*templates* with placeholder image blocks via UniPrompting, and feed the jitted
train step (training/train_step.py) which does everything else on device.

Periodic work mirrors the reference: metric logging with timing meters
(train.py:800-838), checkpoint save/rotation + portable export
(utils/checkpoint.py), resume-from-latest (train.py:205-226), optional
in-training image generation (train.py:847-858), per-parameter grad-norm dumps
(train.py:785-791).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import magvit
from ..models.unigen import UniGenConfig
from ..prompting import UniPrompting
from ..utils import checkpoint as CK
from ..utils.logging import AverageMeter, MetricLogger, get_logger
from .ema import EMAConfig
from .train_step import TrainState, TrainStepConfig, init_train_state, make_train_step

logger = get_logger(__name__)


@dataclasses.dataclass
class TrainerConfig:
    output_dir: str
    max_train_steps: int
    log_every: int = 50
    save_every: int = 2000
    generate_every: int = 0
    visualize_every: int = 0         # [orig | recon | pred] triptychs (train.py:859-875)
    checkpoints_total_limit: Optional[int] = None
    resume_from_checkpoint: Optional[str] = "latest"
    seed: int = 10084
    und_type: str = "captioning"     # 'captioning' (mmu task) | 'llava' (mmu_conv)
    # >0 enables an in-step EMA of the params (reference ships an EMA class it
    # never wires up, models/training_utils.py:59-295; here it is live). The
    # portable `unwrapped_model` export then uses the EMA weights — the whole
    # point of keeping them — while `state` keeps both for exact resume.
    ema_decay: float = 0.0


class Trainer:
    def __init__(
        self,
        cfg: UniGenConfig,
        vq_cfg: magvit.MagvitConfig,
        tcfg: TrainStepConfig,
        trainer_cfg: TrainerConfig,
        prompting: UniPrompting,
        tx,
        params: Any,
        vq_params: Any,
        metric_logger: Optional[MetricLogger] = None,
        generate_callback: Optional[Callable[[Any, int], None]] = None,
    ):
        self.cfg, self.vq_cfg, self.tcfg, self.tr = cfg, vq_cfg, tcfg, trainer_cfg
        self.prompting = prompting
        self.tx = tx
        self.vq_params = vq_params
        self.metrics = metric_logger or MetricLogger(trainer_cfg.output_dir)
        self.generate_callback = generate_callback
        ema_cfg = (EMAConfig(decay=trainer_cfg.ema_decay)
                   if trainer_cfg.ema_decay > 0 else None)
        # donate the TrainState: params/optimizer buffers update in place instead
        # of double-buffering (~2x the 12.4GB state for the 1.5B flagship)
        self.step_fn = jax.jit(make_train_step(cfg, vq_cfg, tx, tcfg, ema_cfg),
                               donate_argnums=(0,))
        self.state = init_train_state(params, tx, ema_cfg)
        self.global_step = 0
        self._maybe_resume()

    # ------------------------------------------------------------- resume --

    def _maybe_resume(self):
        if not self.tr.resume_from_checkpoint:
            return
        path = (CK.latest_checkpoint(self.tr.output_dir)
                if self.tr.resume_from_checkpoint == "latest"
                else self.tr.resume_from_checkpoint)
        if path and os.path.isdir(os.path.join(path, "state")):
            logger.info(f"Resuming from checkpoint {path}")
            self.state = CK.restore_checkpoint(path, self.state)
            self.global_step = CK.resume_step(path)

    def _export_params(self):
        """Portable-model weights: the EMA average when enabled, else the raw
        params (stage handoff consumes `unwrapped_model`, reference
        utils/checkpoint.py:48-59)."""
        return (self.state.ema.params if self.state.ema is not None
                else self.state.params)

    # -------------------------------------------------- host batch building --

    def build_device_batch(self, flow_batch: Dict[str, Dict]) -> Dict[str, Any]:
        """Task flows -> fixed-shape template arrays for the jitted step."""
        n = self.cfg.num_vq_tokens
        out: Dict[str, Any] = {}
        if self.tcfg.batch_size_t2i > 0:
            t2i = flow_batch["t2i_flow"]
            b = len(t2i["input_ids"])
            placeholder = np.zeros((b, n), np.int64)
            ids, _, labels = self.prompting((t2i["input_ids"], placeholder, placeholder),
                                            "t2i")
            out["t2i_template"] = jnp.asarray(ids)
            out["t2i_labels"] = jnp.asarray(labels)
            out["t2i_pixels"] = jnp.asarray(t2i["images"])
        if self.tcfg.batch_size_lm > 0:
            lm = flow_batch["lm_flow"]
            ids, _, labels = self.prompting((lm["input_ids"], self.prompting.max_seq_len),
                                            "lm")
            out["lm_ids"] = jnp.asarray(ids)
            out["lm_labels"] = jnp.asarray(labels)
        if self.tcfg.batch_size_mmu > 0:
            mmu = flow_batch["mmu_flow"]
            b = mmu["images"].shape[0]
            placeholder = np.zeros((b, n), np.int64)
            if self.tr.und_type == "captioning":
                ids, _, labels = self.prompting((placeholder, mmu["input_ids"]), "mmu")
            else:  # llava conversations, pre-tokenized ids/labels
                want = self.prompting.max_seq_len - n - 3
                assert mmu["input_ids"].shape[1] == want, (
                    f"llava mmu conversations must be padded to max_seq_len - "
                    f"num_vq_tokens - 3 = {want} tokens (got "
                    f"{mmu['input_ids'].shape[1]}) so the fused batch is rectangular")
                ids, _, labels = self.prompting(
                    (placeholder, mmu["input_ids"], mmu["labels"], None), "mmu_conv")
            out["mmu_template"] = jnp.asarray(ids)
            out["mmu_labels"] = jnp.asarray(labels)
            out["mmu_pixels"] = jnp.asarray(mmu["images"])
        return out

    # ----------------------------------------------------------- visualize --

    def _visualize(self, batch: Dict[str, Any], key) -> None:
        """[original | VQ recon | model prediction] triptych on the current t2i
        batch, saved as a grid PNG and surfaced in metrics.jsonl (reference
        train.py:859-875 wires visualize_predictions the same way)."""
        from . import visualization as VZ
        ids = VZ.masked_t2i_inputs(
            self.vq_params, self.vq_cfg, self.cfg, batch["t2i_template"],
            batch["t2i_pixels"], key, mask_schedule=self.tcfg.mask_schedule,
            min_masking_rate=self.tcfg.min_masking_rate)
        trip = VZ.visualize_predictions(
            self.state.params, self.cfg, self.vq_params, self.vq_cfg,
            batch["t2i_pixels"], ids, self.tcfg.pad_id, self.tcfg.soi_id,
            self.tcfg.eoi_id)
        if jax.process_index() == 0:
            vis_dir = os.path.join(self.tr.output_dir, "visualizations")
            os.makedirs(vis_dir, exist_ok=True)
            path = os.path.join(vis_dir, f"predictions_step{self.global_step}.png")
            VZ.save_image_grid(trip, path)
            self.metrics.log({"visualization": path}, self.global_step)

    # ---------------------------------------------------------------- train --

    def train(self, combined_flow: Iterator[Dict[str, Dict]]) -> TrainState:
        key = jax.random.key(self.tr.seed)
        batch_time, data_time = AverageMeter(), AverageMeter()
        meters = {k: AverageMeter() for k in ("loss", "loss_t2i", "loss_lm", "loss_mmu")}
        end = time.time()

        per_step_samples = (self.tcfg.batch_size_t2i + self.tcfg.batch_size_lm
                            + self.tcfg.batch_size_mmu)

        # one-step-deferred meter updates: `float(metrics[...])` blocks on the
        # device, so materializing step N's metrics only after step N+1's host
        # batch is built lets input decode/tokenize overlap device compute (the
        # synchronous form measured 18% slower with the live tar pipeline —
        # BENCH.md "PT2 with live input pipeline")
        pending = None

        def _flush(metrics):
            for k, m in meters.items():
                if k in metrics:
                    m.update(metrics[k])

        for flow_batch in combined_flow:
            if self.global_step >= self.tr.max_train_steps:
                break
            batch = self.build_device_batch(flow_batch)
            data_time.update(time.time() - end)

            if pending is not None:
                _flush(pending)
            key, sub = jax.random.split(key)
            self.state, metrics = self.step_fn(self.state, self.vq_params, batch, sub)
            pending = metrics
            self.global_step += 1

            batch_time.update(time.time() - end)
            end = time.time()

            if self.global_step % self.tr.log_every == 0:
                logs = {k: m.avg for k, m in meters.items()}
                logs.update({
                    "avg_masking_rate": float(metrics["avg_masking_rate"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    # window average, matching the reference's averaged meters
                    # (train.py:808-819) — the last-step value is too noisy
                    "samples_per_sec_per_device": per_step_samples / max(batch_time.avg, 1e-9),
                    "data_time": data_time.avg,
                    "batch_time": batch_time.avg,
                })
                self.metrics.log(logs, self.global_step)
                logger.info(f"step {self.global_step}: loss={logs['loss']:.4f} "
                            f"({logs['samples_per_sec_per_device']:.2f} samples/s/dev)")
                # reset the TIMING meters with the loss meters: without this,
                # samples_per_sec is cumulative-since-start, so the first
                # window's compile time depresses every later window's
                # reported throughput (caught by the r5 live-input bench:
                # a clean 0.8 s/step window logged as 63 s/step)
                for m in (*meters.values(), batch_time, data_time):
                    m.reset()

            if self.tr.save_every and self.global_step % self.tr.save_every == 0:
                if jax.process_index() == 0:
                    CK.save_checkpoint(self.state, self.tr.output_dir, self.global_step,
                                       total_limit=self.tr.checkpoints_total_limit,
                                       unwrapped_params=self._export_params())

            if (self.generate_callback and self.tr.generate_every
                    and self.global_step % self.tr.generate_every == 0):
                self.generate_callback(self.state.params, self.global_step)

            if (self.tr.visualize_every and self.tcfg.batch_size_t2i > 0
                    and self.global_step % self.tr.visualize_every == 0):
                key, vk = jax.random.split(key)
                self._visualize(batch, vk)

        # save_every == 0 disables checkpointing entirely (incl. the final
        # save) — perf benches and smoke loops opt out of the multi-GB write
        if self.tr.save_every and jax.process_index() == 0:
            CK.save_checkpoint(self.state, self.tr.output_dir, self.global_step,
                               total_limit=self.tr.checkpoints_total_limit,
                               unwrapped_params=self._export_params())
        return self.state
