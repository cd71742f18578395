"""Profiling + metrics plumbing.

Capability-parity with the reference's observability (survey §5):
per-stage wall timers with ETA (``log_helper.print_speed``), FPS
accounting (``ltr_trainer._print_stats``), tensorboard scalars
(``pysot/tools/train.py:205-240``) — plus what the reference lacks:
real device profiling via ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict


class StepTimer:
    """Named wall-clock section timing with running stats."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def avg_ms(self, name):
        return 1000.0 * self.totals[name] / max(self.counts[name], 1)

    def summary(self):
        return {k: self.avg_ms(k) for k in self.totals}


def print_speed(step, total_steps, step_time, logger=None):
    """ETA line (capability of reference ``log_helper.print_speed``)."""
    remaining = (total_steps - step) * step_time
    h, rem = divmod(int(remaining), 3600)
    m, s = divmod(rem, 60)
    msg = (f"Progress: {step} / {total_steps} "
           f"[{step / max(total_steps, 1):.1%}], "
           f"{step_time:.3f} s/step, ETA {h:d}:{m:02d}:{s:02d}")
    (logger.info if logger else print)(msg)
    return msg


@contextlib.contextmanager
def device_trace(log_dir):
    """jax.profiler trace context — open the result in
    tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class ScalarWriter:
    """Tensorboard-compatible scalar logging without the tensorboard
    dependency: JSONL event stream + optional tensorboardX if present
    (capability of the reference's tensorboardX usage)."""

    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, "scalars.jsonl")
        self._f = open(self._path, "a")
        self._tb = None
        try:  # pragma: no cover - optional dep
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalar(self, tag, value, step):
        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "time": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
