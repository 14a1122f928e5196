"""Profiling / observability utilities.

The reference's story here is `print` + an unused DeepSpeed FlopsProfiler
import (SURVEY.md §5). TPU-native replacements:
  * `flops_estimate`: XLA's own cost analysis of a jitted function;
  * `trace`: context manager around `jax.profiler` (view in XProf/TensorBoard);
  * `StepTimer` / `AverageMeter`: host-side loop instrumentation
    (`pyutils.AverageMeter` equivalent, avs_s4/train.py:217-220).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


def flops_estimate(fn, *args, **kwargs) -> Dict[str, float]:
    """Compile `fn` on the current backend and return XLA's cost analysis
    (flops, bytes accessed, ...). Replaces the reference's FlopsProfiler."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):  # older jax returns a per-device list
        analysis = analysis[0]
    return dict(analysis or {})


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dg_sct_tpu_trace"):
    """Capture a device trace for XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class AverageMeter:
    """Running average tracker (pyutils.AverageMeter equivalent)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class StepTimer:
    """Wall-clock step timer with warmup-exclusion and EMA."""

    def __init__(self, warmup: int = 1, ema: float = 0.9):
        self.warmup = warmup
        self.ema = ema
        self.steps = 0
        self.ema_s: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.steps += 1
        if self.steps > self.warmup:
            self.ema_s = dt if self.ema_s is None else \
                self.ema * self.ema_s + (1 - self.ema) * dt

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.ema_s if self.ema_s else 0.0
