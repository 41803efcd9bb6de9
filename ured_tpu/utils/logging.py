"""Training observability.

The reference logs 10 scalar channels to tensorboardX plus a plain-text
``train.log`` (``engine/train.py:159,284-335,148-150``).  Here: a JSONL
metric stream (always available), an optional tensorboardX sink behind the
same interface, and a step timer built on ``block_until_ready``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import jax


class MetricWriter:
    """Writes one JSON line per step; optionally mirrors to tensorboardX."""

    def __init__(self, log_dir: str, use_tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir=log_dir)
            except ImportError:
                pass

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, global_step=step)

    def text(self, line: str) -> None:
        with open(os.path.join(os.path.dirname(self.path),
                               "train.log"), "a") as f:
            f.write(line + "\n")

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Wall-clock step timing with device sync (the reference only had
    commented-out ``time.time()`` probes, SURVEY.md §5)."""

    def __init__(self):
        self._t0 = None
        self.history = []

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.history.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.history) / max(len(self.history), 1)


def profile_trace(log_dir: str):
    """Context manager around ``jax.profiler.trace`` for on-demand TPU
    profiling."""
    return jax.profiler.trace(log_dir)
