"""Training executor: epoch/step loops, CV, logging, checkpointing.

TPU-native counterpart of the reference Executor + train_utils
(reference: chunkformer/utils/executor.py:36-190, utils/train_utils.py): the
DDP join/no_sync/monitored-barrier machinery disappears — the data pipeline
yields a deterministic per-host stream and every device step is one jitted
call. Dynamic-chunk training keeps a small compile cache: one program per
(chunk, L, R) tuple drawn from the finite config lists
(reference encoder.py:198-218).
"""

from __future__ import annotations

import logging
import random
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ChunkFormerConfig
from .checkpoint import save_checkpoint
from .losses import asr_model_loss, transducer_model_loss
from .train_step import TrainState, make_eval_step, make_train_step


def pick_loss_fn(cfg: ChunkFormerConfig):
    if cfg.model == "transducer":
        return transducer_model_loss
    if cfg.model == "classification":
        from ..models.classification import classification_loss

        return classification_loss
    return asr_model_loss


class MetricsWriter:
    """JSONL metrics log (stands in for the reference's tensorboard writer,
    train_utils.py:582-588,788-894). One line per logged step; rank 0 only."""

    def __init__(self, path: Optional[str]):
        self.f = open(path, "a") if path and jax.process_index() == 0 else None

    def log(self, step: int, scope: str, metrics: Dict[str, float]):
        if self.f is None:
            return
        import json

        self.f.write(json.dumps({"step": step, "scope": scope, **metrics}) + "\n")
        self.f.flush()


class Executor:
    def __init__(self, cfg: ChunkFormerConfig, optimizer, model_dir: str,
                 log_interval: int = 100, accum_grad: int = 1,
                 save_interval: Optional[int] = None, seed: int = 777,
                 mesh=None):
        import os

        self.cfg = cfg
        self.optimizer = optimizer
        self.model_dir = model_dir
        self.log_interval = log_interval
        self.accum_grad = accum_grad
        self.save_interval = save_interval
        self.rng = random.Random(seed)
        self.key = jax.random.PRNGKey(seed)
        self.mesh = mesh
        self._step_cache: Dict = {}
        self._eval_step = None
        self.loss_fn = pick_loss_fn(cfg)
        os.makedirs(model_dir, exist_ok=True)
        self.metrics = MetricsWriter(os.path.join(model_dir, "metrics.jsonl"))

    def _get_train_step(self, chunk_cfg):
        if chunk_cfg not in self._step_cache:
            step = make_train_step(self.cfg, self.optimizer, chunk_cfg,
                                   self.accum_grad, self.loss_fn)
            self._step_cache[chunk_cfg] = jax.jit(step, donate_argnums=(0,))
        return self._step_cache[chunk_cfg]

    def _sample_chunk_cfg(self):
        from ..nn.encoder import limited_context_selection

        return limited_context_selection(self.cfg.encoder_conf, self.rng)

    def train_epoch(self, state: TrainState, dataset: Iterable[Dict], epoch: int,
                    cv_dataset: Optional[Iterable[Dict]] = None) -> TrainState:
        t0 = time.time()
        n_seen = 0
        for batch_idx, batch in enumerate(dataset):
            chunk_cfg = self._sample_chunk_cfg()
            step_fn = self._get_train_step(chunk_cfg)
            self.key, sub = jax.random.split(self.key)
            state, metrics = step_fn(
                state, jnp.asarray(batch["feats"]), jnp.asarray(batch["feats_lengths"]),
                jnp.asarray(batch["target"]), jnp.asarray(batch["target_lengths"]), sub)
            n_seen += batch["feats"].shape[0]

            step = int(state.step)
            if step % self.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                rate = n_seen / max(time.time() - t0, 1e-9)
                logging.info(
                    "epoch %d step %d chunk=%s loss %.4f (%s) %.1f utts/s",
                    epoch, step, chunk_cfg, m.get("loss", float("nan")),
                    " ".join(f"{k}={v:.3f}" for k, v in m.items() if k != "loss"),
                    rate)
                self.metrics.log(step, "train", {**m, "utts_per_s": rate,
                                                 "epoch": epoch})
            if self.save_interval and step % self.save_interval == 0 and step > 0:
                cv_loss = self.cv(state.params, cv_dataset) if cv_dataset else None
                self.save(state, epoch, tag=f"step_{step}", cv_loss=cv_loss)
        return state

    def cv(self, params, dataset: Iterable[Dict]) -> float:
        """Cross-validation loss (reference executor.py:132-190)."""
        if self._eval_step is None:
            self._eval_step = jax.jit(make_eval_step(self.cfg, self.loss_fn))
        total, count = 0.0, 0
        for batch in dataset:
            metrics = self._eval_step(
                params, jnp.asarray(batch["feats"]), jnp.asarray(batch["feats_lengths"]),
                jnp.asarray(batch["target"]), jnp.asarray(batch["target_lengths"]))
            b = batch["feats"].shape[0]
            total += float(metrics["loss"]) * b
            count += b
        return total / max(count, 1)

    def save(self, state: TrainState, epoch: int, tag: str,
             cv_loss: Optional[float] = None):
        if jax.process_index() != 0:
            return
        info = {"epoch": epoch, "step": int(state.step),
                "save_time": time.strftime("%d/%m/%Y %H:%M:%S")}
        if cv_loss is not None:
            info["cv_loss"] = float(cv_loss)
        save_checkpoint(self.model_dir, tag, state.params, state.opt_state, info)
        logging.info("saved checkpoint %s (cv_loss=%s)", tag, cv_loss)
