"""Stage timing instrumentation.

Equivalent of the reference's ClockTimer/_timing[] buckets
(GlobalUtil.cpp:301-405, config.h:17-31), with JAX-aware fencing: a stage is
closed only after block_until_ready when a device value is registered.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict


class StageTimer:
    """Accumulates wall-clock per named stage; last-run and running mean."""

    def __init__(self):
        self.last: "OrderedDict[str, float]" = OrderedDict()
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                fence.block_until_ready()
            dt = (time.perf_counter() - t0) * 1000.0
            self.last[name] = dt
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def mean(self, name: str) -> float:
        c = self.counts.get(name, 0)
        return self.totals.get(name, 0.0) / c if c else 0.0

    def report(self) -> str:
        lines = [f"{k:<24s} {v:9.2f} ms (mean {self.mean(k):9.2f} ms)"
                 for k, v in self.last.items()]
        return "\n".join(lines)

    def csv(self) -> str:
        """Per-stage CSV like hess -time (hessgpucmd.cpp:49-67)."""
        keys = list(self.last.keys())
        head = ",".join(keys)
        vals = ",".join(f"{self.last[k]:.3f}" for k in keys)
        return head + "\n" + vals + "\n"


import contextlib as _contextlib


@_contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/hessgpu_tpu_trace"):
    """XLA profiler trace around a block (view with TensorBoard/xprof).

    Something the reference never had: per-op device timelines instead of
    wall-clock buckets (SURVEY.md section 5.1).
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
