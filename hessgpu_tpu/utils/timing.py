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


# ---------------------------------------------------------------------------
# per-stage DEVICE time (reference TIMINGS_* buckets, config.h:17-31)
# ---------------------------------------------------------------------------

# reference bucket names; LOAD_IMAGE / DOWNLOAD_KEYPOINTS are host-side
# (StageTimer covers them), GENERATE_VBO has no TPU analogue
REFERENCE_BUCKETS = (
    "BUILD_PYRAMID", "DETECT_KEYPOINTS", "GENERATE_FEATURE_LIST",
    "COMPUTE_ORIENTATIONS", "MULTI_ORIENTATIONS", "COMPUTE_DESCRIPTORS",
    "FEATURES_REDUCTION", "OTHER", "TOTAL",
)

def device_stage_breakdown(jitted_fn, *args, runs: int = 5,
                           trace_dir: str = "/tmp/hessgpu_stage_trace"):
    """Per-stage DEVICE milliseconds for one jitted pipeline call.

    The reference fences every stage and reads wall clocks
    (PyramidCU.cpp:52-70); under a single fused XLA program that would
    destroy the very overlap we rely on, so instead this maps a profiler
    trace's per-op times back to pipeline stages: run_pipeline wraps each
    stage in jax.named_scope(bucket), the scope lands in every compiled
    HLO op's op_name metadata, and trace ops are looked up by HLO op name.
    Works on the TPU device timeline (device_duration_ps) and the CPU
    backend's per-op host events (dur). Returns OrderedDict bucket -> ms.
    """
    import glob
    import gzip
    import json
    import re
    import shutil

    import jax

    compiled = jitted_fn.lower(*args).compile()
    txt = compiled.as_text()
    meta = {}
    pat = re.compile(r"%([\w.\-]+) = .*?op_name=\"([^\"]+)\"")
    for line in txt.splitlines():
        m = pat.search(line)
        if m:
            op_name = m.group(2)
            for b in REFERENCE_BUCKETS:
                if b in op_name:
                    meta[m.group(1)] = b
                    break

    out = jitted_fn(*args)
    jax.block_until_ready(out)
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(runs):
            out = jitted_fn(*args)
        jax.block_until_ready(out)

    buckets = OrderedDict((b, 0.0) for b in REFERENCE_BUCKETS)
    for p in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        for ev in json.load(gzip.open(p)).get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            args_d = ev.get("args") or {}
            if "device_duration_ps" in args_d:
                # TPU/GPU: device-timeline op events
                ms = int(args_d["device_duration_ps"]) / 1e9 / runs
                name = ev.get("name", "")
            elif "hlo_op" in args_d:
                # CPU backend: per-op host-thread events (dur in us)
                ms = float(ev.get("dur", 0)) / 1e3 / runs
                name = args_d["hlo_op"]
            else:
                continue
            if name.startswith("jit_"):
                # the module-level event spans all sub-ops: it IS the total
                buckets["TOTAL"] += ms
                continue
            buckets[meta.get(name, "OTHER")] += ms
    if buckets["TOTAL"] == 0.0:
        buckets["TOTAL"] = sum(v for b, v in buckets.items() if b != "TOTAL")
    return buckets


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
