"""Per-stage device-time profile of the batched pipeline on the real chip.

Prints the TIMINGS_* bucket table (ms/frame) plus the top individual HLO ops
so the dispatch tail is visible op by op.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import gzip
import json
import shutil
from collections import OrderedDict

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--image", default="/root/reference/data/640-1.jpg")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.io_image import load_image
    from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
    from hessgpu_tpu.parallel.batch import _batched_pipeline
    from hessgpu_tpu.pyramid import _CfgKey, make_plan
    from hessgpu_tpu.utils.timing import REFERENCE_BUCKETS

    img = load_image(args.image)
    g = np.asarray(rgb_to_gray(to_float(jnp.asarray(img))), np.float32)
    h, w = g.shape
    cfg = SiftConfig()
    plan = make_plan(h, w, cfg)
    ckey = _CfgKey(cfg)
    batch = jax.device_put(jnp.asarray(np.stack([g] * args.batch)),
                           jax.devices()[0])

    def jfn(b):
        return _batched_pipeline(b, plan, ckey)

    # map HLO op -> bucket from compiled metadata
    import re
    compiled = _batched_pipeline.lower(batch, plan, ckey).compile()
    txt = compiled.as_text()
    meta = {}
    pat = re.compile(r"%([\w.\-]+) = .*?op_name=\"([^\"]+)\"")
    for line in txt.splitlines():
        m = pat.search(line)
        if m:
            for b in REFERENCE_BUCKETS:
                if b in m.group(2):
                    meta[m.group(1)] = b
                    break

    out = jfn(batch)
    jax.block_until_ready(out)
    trace_dir = "/tmp/hessgpu_stage_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(args.runs):
            out = jfn(batch)
        jax.block_until_ready(out)

    buckets = OrderedDict((b, 0.0) for b in REFERENCE_BUCKETS)
    op_times = {}
    n_events = {}
    for p in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        for ev in json.load(gzip.open(p)).get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            args_d = ev.get("args") or {}
            if "device_duration_ps" in args_d:
                ms = int(args_d["device_duration_ps"]) / 1e9 / args.runs
                name = ev.get("name", "")
            else:
                continue
            if name.startswith("jit_"):
                buckets["TOTAL"] += ms
                continue
            buckets[meta.get(name, "OTHER")] += ms
            op_times[name] = op_times.get(name, 0.0) + ms
            n_events[name] = n_events.get(name, 0) + 1

    B = args.batch
    print(f"== bucket table (ms/frame, B={B}) ==")
    for b, v in buckets.items():
        print(f"  {b:<24s} {v / B:8.4f}")

    print(f"\n== top {args.top} ops (total ms per call, bucket) ==")
    for name, ms in sorted(op_times.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ms:8.4f} ms x{n_events[name] // args.runs:<4d} "
              f"{meta.get(name, 'OTHER'):<22s} {name[:80]}")

    n_ops = sum(n_events.values()) // args.runs
    print(f"\ntotal device ops per call: {n_ops}")


if __name__ == "__main__":
    sys.exit(main())
