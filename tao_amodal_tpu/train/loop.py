"""Trainer: epochs, metrics, checkpoint/resume, fail-safe retry.

Capability-parity with both reference trainers:
  * pysot ``tools/train.py:155-257``: per-step metrics with batch/data
    timing, gradient clipping, rank-0 epoch snapshots of
    {epoch, state_dict, optimizer};
  * pytracking ``BaseTrainer.train`` (``base_trainer.py:52-88``): the
    10-attempt fail-safe loop that reloads the latest checkpoint after
    a crash and continues.

TPU-first: the step function is produced by
:func:`tao_amodal_tpu.parallel.dp.make_train_step` (sharded batch,
replicated params — no rank logic anywhere); checkpoints go through
orbax (all hosts write shards of the same checkpoint; "rank 0" is not
a concept the trainer needs).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Callable, Optional

import jax
import numpy as np


class AverageMeter:
    """Running averages (capability of reference
    ``pysot/utils/average_meter.py`` / ``ltr/admin/stats.py``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._sums = {}
        self._counts = {}

    def update(self, metrics, n=1):
        for k, v in metrics.items():
            v = float(v)
            self._sums[k] = self._sums.get(k, 0.0) + v * n
            self._counts[k] = self._counts.get(k, 0) + n

    def avg(self, key):
        return self._sums[key] / max(self._counts.get(key, 0), 1)

    def summary(self):
        return {k: self.avg(k) for k in self._sums}


@dataclasses.dataclass
class TrainConfig:
    num_epochs: int = 20
    steps_per_epoch: int = 1000
    checkpoint_dir: str = "./checkpoints"
    keep_checkpoints: int = 5
    log_every: int = 20
    fail_safe_retries: int = 10  # reference base_trainer.py:60 uses 10
    seed: int = 0


class Trainer:
    """Generic epoch trainer over a jitted train step."""

    def __init__(self, train_step, init_state, data_iter_fn,
                 config: TrainConfig, logger=None,
                 epoch_hooks=(), writer=None):
        """
        Args:
          train_step: ``(state, batch, rng) -> (state, metrics)``.
          init_state: initial ``(params, opt_state)`` pytree.
          data_iter_fn: ``epoch -> iterator of batches`` (host
            prefetching happens here).
          writer: optional scalar writer with ``scalar(tag, val, step)``.
        """
        self.train_step = train_step
        self.state = init_state
        # Pristine copy for the fail-safe path: if training crashes
        # before any checkpoint exists, retry from a clean state rather
        # than the mid-epoch partially-mutated one.
        self._init_state = jax.tree_util.tree_map(lambda x: x, init_state)
        self.data_iter_fn = data_iter_fn
        self.config = config
        self.logger = logger or logging.getLogger("tao.train")
        self.epoch_hooks = list(epoch_hooks)
        self.writer = writer
        self.epoch = 0
        self._ckpt_mgr = None

    # -- checkpointing -------------------------------------------------

    def _manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            path = os.path.abspath(self.config.checkpoint_dir)
            os.makedirs(path, exist_ok=True)
            self._ckpt_mgr = ocp.CheckpointManager(
                path,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.config.keep_checkpoints))
        return self._ckpt_mgr

    def save_checkpoint(self):
        import orbax.checkpoint as ocp

        mgr = self._manager()
        mgr.save(self.epoch,
                 args=ocp.args.StandardSave({
                     "state": self.state,
                     "epoch": np.asarray(self.epoch),
                 }))
        mgr.wait_until_finished()

    def load_checkpoint(self, step=None):
        """Load latest (or a specific epoch); returns True on success."""
        import orbax.checkpoint as ocp

        mgr = self._manager()
        step = mgr.latest_step() if step is None else step
        if step is None:
            return False
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore({
                "state": self.state,
                "epoch": np.asarray(self.epoch),
            }))
        self.state = restored["state"]
        self.epoch = int(restored["epoch"])
        return True

    # -- the loop ------------------------------------------------------

    def train_epoch(self):
        cfg = self.config
        meter = AverageMeter()
        rng = jax.random.PRNGKey(cfg.seed + self.epoch)
        data_iter = self.data_iter_fn(self.epoch)
        end = time.time()
        for step, batch in enumerate(data_iter):
            if step >= cfg.steps_per_epoch:
                break
            data_time = time.time() - end
            rng, sub = jax.random.split(rng)
            self.state, metrics = self.train_step(self.state, batch, sub)
            metrics = {k: float(v) for k, v in metrics.items()}
            batch_time = time.time() - end
            end = time.time()
            meter.update({**metrics, "batch_time": batch_time,
                          "data_time": data_time})
            if step % cfg.log_every == 0:
                global_step = self.epoch * cfg.steps_per_epoch + step
                msg = " ".join(f"{k}={meter.avg(k):.4f}"
                               for k in sorted(meter.summary()))
                self.logger.info(
                    f"epoch {self.epoch} step {step}: {msg}")
                if self.writer is not None:
                    for k, v in meter.summary().items():
                        self.writer.scalar(k, v, global_step)
        return meter.summary()

    def train(self, load_latest=False, fail_safe=True):
        """Run all epochs; on crash reload the latest checkpoint and
        continue (reference fail-safe semantics)."""
        if load_latest:
            self.load_checkpoint()
        retries = self.config.fail_safe_retries if fail_safe else 1
        attempt = 0
        while self.epoch < self.config.num_epochs:
            try:
                stats = self.train_epoch()
                self.epoch += 1
                self.save_checkpoint()
                for hook in self.epoch_hooks:
                    hook(self, stats)
                attempt = 0
            except KeyboardInterrupt:
                raise
            except Exception:  # noqa: BLE001 - fail-safe by design
                attempt += 1
                self.logger.exception(
                    f"Training crashed (attempt {attempt}/{retries}); "
                    "restoring latest checkpoint.")
                if attempt >= retries:
                    raise
                if not self.load_checkpoint():
                    # No checkpoint yet (crash inside the first epoch):
                    # restart from the pristine initial state.
                    self.state = self._init_state
                    self.epoch = 0
        return self.state
