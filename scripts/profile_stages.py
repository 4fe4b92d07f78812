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
    ap.add_argument("--detector", default="hessian",
                    choices=["hessian", "dog"])
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
    cfg = SiftConfig(detector=args.detector)
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

    # ---- analytic roofline: ideal HBM bytes per frame per bucket -------
    # (the pipeline is bandwidth-bound at speed-of-light: every stage is
    # stencil/gather work with trivial arithmetic intensity, so the bound
    # is bytes moved / HBM bandwidth; v5e: ~819 GB/s)
    HBM_GBPS = 819.0
    p = cfg.scale_params()
    NKEY = len(p.key_levels)
    L = p.num_levels
    G = min(cfg.global_feature_cap, sum(plan.level_caps))
    import math as _m

    from hessgpu_tpu.ops.descriptor import descriptor_window_size
    ms_ = p.key_level_sigma(p.key_levels[-1]) * p.sigmak
    owin = 2 * int(_m.ceil(abs(ms_) * cfg.orientation_gaussian_factor
                           * cfg.orientation_window_factor + 1.0)) + 1
    dwin = descriptor_window_size(ms_, cfg.descriptor_window_factor)
    px = [hh * ww for (hh, ww) in plan.octave_shapes]
    ideal = {
        # read base + write L levels per octave (one kernel, f32)
        "BUILD_PYRAMID": sum(4 * (1 + L) * n for n in px),
        # read NP gauss planes; write NK * (u16 key + 2 i32 payload
        # + 2 f32 grad/rot planes)
        "DETECT_KEYPOINTS": sum(4 * (NKEY + 2) * n
                                + NKEY * (10 + 8) * n for n in px),
        # read the NK u16 key maps (pair-min + row sort reads; the
        # candidate lists after stage 1 are ~KB-scale)
        "GENERATE_FEATURE_LIST": sum(2 * NKEY * n for n in px),
        # per-keypoint window gathers: G keypoints x window px x
        # (grad + rot) f32
        "COMPUTE_ORIENTATIONS": G * owin * owin * 8,
        "MULTI_ORIENTATIONS": G * 4 * 6 * 4,   # sort/compact the table
        "COMPUTE_DESCRIPTORS": G * dwin * dwin * 8,
    }

    print(f"== bucket table (ms/frame, B={B}) ==")
    print(f"  {'bucket':<24s} {'ms/frame':>9s} {'MB ideal':>9s} "
          f"{'SoL ms':>8s} {'% SoL':>6s}")
    for b, v in buckets.items():
        msf = v / B
        if b in ideal:
            mb = ideal[b] / 1e6
            sol = ideal[b] / (HBM_GBPS * 1e9) * 1e3
            pct = 100.0 * sol / msf if msf > 0 else 0.0
            print(f"  {b:<24s} {msf:9.4f} {mb:9.2f} {sol:8.4f} {pct:5.1f}%")
        else:
            print(f"  {b:<24s} {msf:9.4f}")
    tot_sol = sum(ideal.values()) / (HBM_GBPS * 1e9) * 1e3
    tot_ms = sum(v for b, v in buckets.items() if b in ideal) / B
    print(f"  ideal total {sum(ideal.values())/1e6:.2f} MB/frame -> "
          f"{tot_sol:.4f} ms SoL vs {tot_ms:.4f} ms measured "
          f"({100*tot_sol/max(tot_ms,1e-9):.1f}% of roofline)")

    print(f"\n== top {args.top} ops (total ms per call, bucket) ==")
    for name, ms in sorted(op_times.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ms:8.4f} ms x{n_events[name] // args.runs:<4d} "
              f"{meta.get(name, 'OTHER'):<22s} {name[:80]}")

    n_ops = sum(n_events.values()) // args.runs
    print(f"\ntotal device ops per call: {n_ops}")


if __name__ == "__main__":
    sys.exit(main())
