"""Top device ops of one BA LM step on the attached accelerator.

Confirms where the LM step's time goes (suspect: XLA gathers/scatters
for R[cam_idx]/X[pt_idx] and their segment-sum transposes, which run on
the TPU scalar core at ~ns/element). Prints the per-op table.
"""

import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 8


def main():
    import jax
    import jax.numpy as jnp

    sys.argv += [""]
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np

    from bench_ba import CG_ITERS, _make_problem
    from hessgpu_tpu.sfm.ba import lm_step

    state, prob = _make_problem(np, jnp)
    step = jax.jit(lambda s, lam: lm_step(s, prob, lam, cg_iters=CG_ITERS))
    lam = jnp.asarray(1e-3)
    s, lam2, c0, c1, acc = step(state, lam)
    jax.block_until_ready(s.X)

    trace_dir = "/tmp/hessgpu_ba_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        s = state
        for _ in range(RUNS):
            s, lam, c0, c1, acc = step(s, lam)
        jax.block_until_ready(s.X)

    op_times = {}
    n_events = {}
    total = 0.0
    for p in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        for ev in json.load(gzip.open(p)).get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            args_d = ev.get("args") or {}
            if "device_duration_ps" not in args_d:
                continue
            ms = int(args_d["device_duration_ps"]) / 1e9 / RUNS
            name = ev.get("name", "")
            if name.startswith("jit_"):
                total += ms
                continue
            op_times[name] = op_times.get(name, 0.0) + ms
            n_events[name] = n_events.get(name, 0) + 1

    print(f"device total {total:.3f} ms/LM step ({RUNS} runs)")
    for name, ms in sorted(op_times.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms:8.4f} ms x{n_events[name] // RUNS:<4d} {name[:90]}")


if __name__ == "__main__":
    sys.exit(main())
