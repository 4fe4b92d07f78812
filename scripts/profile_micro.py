"""Device-time micro-profiles of BUILD_PYRAMID constituents.

Wall-clock micro-timing through the tunneled runtime is unreliable
below ~2.5 ms (per-call floor) and block_until_ready is not a sync;
this uses the device trace instead: each candidate runs as one jitted
program, and the profiler's device_duration attributes real time per
op. Identifies what the pipeline profile's anonymous fusions/copies
are (e.g. fusion.544 at 0.68 ms/call in BUILD_PYRAMID).
"""

import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 8


def profile(name, fn, *args):
    import jax

    f = jax.jit(fn)
    r = f(*args)
    _ = jax.tree.map(lambda a: a.ravel()[0].item(), r)  # drain
    trace_dir = "/tmp/hessgpu_micro_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _i in range(RUNS):
            r = f(*args)
        _ = jax.tree.map(lambda a: a.ravel()[0].item(), r)
    ops = {}
    total = 0.0
    for p in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        for ev in json.load(gzip.open(p)).get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            a = ev.get("args") or {}
            if "device_duration_ps" not in a:
                continue
            ms = int(a["device_duration_ps"]) / 1e9 / RUNS
            nm = ev.get("name", "")
            if nm.startswith("jit_"):
                total += ms
                continue
            ops[nm] = ops.get(nm, 0.0) + ms
    print(f"== {name}: {total:.4f} ms/call device")
    for nm, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:6]:
        print(f"   {ms:8.4f} ms  {nm[:70]}")
    sys.stdout.flush()


def main():
    import jax.numpy as jnp
    import numpy as np

    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.ops.pallas.conv import blur_pallas, octave_chain_pallas
    from hessgpu_tpu.ops.resize import downsample
    from hessgpu_tpu.params import gaussian_taps

    B, H, W = 16, 480, 640
    x = jnp.asarray(np.random.rand(B, H, W).astype(np.float32))
    p = SiftConfig().scale_params()
    t_init = tuple(gaussian_taps(p.initial_blur_sigma(0),
                                 p.filter_width_factor))
    taps_list = [tuple(gaussian_taps(s, p.filter_width_factor)) if s > 0
                 else () for s in p.incremental_sigmas()]

    profile("downsample_conv", lambda a: downsample(a, 1), x)
    profile("slice_ds", lambda a: a[:, ::2, ::2], x)
    profile("blur_init(13taps)", lambda a: blur_pallas(a, t_init), x)
    profile("edge_pad_only",
            lambda a: jnp.pad(a, ((0, 0), (6, 14), (6, 122)), mode="edge"),
            x)
    profile("octave_chain_oct0",
            lambda a: octave_chain_pallas(a, taps_list), x)
    x1 = jnp.asarray(np.random.rand(B, H // 2, W // 2).astype(np.float32))
    profile("octave_chain_oct1",
            lambda a: octave_chain_pallas(a, taps_list), x1)


if __name__ == "__main__":
    sys.exit(main())
