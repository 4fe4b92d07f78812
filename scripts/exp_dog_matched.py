"""DoG-vs-Hessian speed at MATCHED feature count (VERDICT r3 task 3).

The personalities share every kernel; at default thresholds DoG finds
3.2x more features (728 vs 230 on 640-1.jpg), and the per-keypoint
stages' cost tracks the VALID count (invalid slots are predicated off),
so dog_fps < hessian_fps at defaults is workload, not structure. This
experiment pins that: DoG at threshold 0.028 yields ~241 features and
should run within a few percent of Hessian's fps.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run(detector, threshold=None):
    import jax
    import jax.numpy as jnp

    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.io_image import load_image
    from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
    from hessgpu_tpu.parallel.batch import _batched_pipeline
    from hessgpu_tpu.pyramid import _CfgKey, make_plan

    img = load_image("/root/reference/data/640-1.jpg")
    g = np.asarray(rgb_to_gray(to_float(jnp.asarray(img))), np.float32)
    cfg = SiftConfig(detector=detector)
    if threshold:
        cfg.threshold = threshold
    plan = make_plan(*g.shape, cfg)
    ckey = _CfgKey(cfg)
    B = 16
    batch = jax.device_put(jnp.asarray(np.stack([g] * B)), jax.devices()[0])
    for _ in range(2):
        t = _batched_pipeline(batch, plan, ckey)
    _ = np.asarray(t.count())        # drain warmup with a VALUE FETCH
    iters = 32
    best = None
    for _ in range(3):               # best-of-3 (tunnel-load variance)
        t0 = time.perf_counter()
        for _ in range(iters):
            t = _batched_pipeline(batch, plan, ckey)
        counts = np.asarray(t.count())   # fetch = honest sync
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    n = int(counts.mean())
    print(f"{detector} t={threshold or 'default'}: "
          f"{B * iters / best:.2f} fps, {n} features/frame", flush=True)


if __name__ == "__main__":
    run("hessian")
    run("dog")
    run("dog", 0.028)
