"""Quick hessian-only throughput check (same protocol as bench.py's
headline number: warmup drained by a value fetch, timed region ends in a
value fetch). For lever iteration; the recorded number stays bench.py's."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B = 16
ITERS = 32


def main():
    import jax
    import jax.numpy as jnp

    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.io_image import load_image
    from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
    from hessgpu_tpu.parallel.batch import _batched_pipeline
    from hessgpu_tpu.pyramid import _CfgKey, make_plan

    img = load_image("/root/reference/data/640-1.jpg")
    g = np.asarray(rgb_to_gray(to_float(jnp.asarray(img))), np.float32)
    h, w = g.shape
    cfg = SiftConfig()
    plan = make_plan(h, w, cfg)
    ckey = _CfgKey(cfg)
    batch = jax.device_put(jnp.asarray(np.stack([g] * B)), jax.devices()[0])

    for _ in range(2):
        table = _batched_pipeline(batch, plan, ckey)
    _ = np.asarray(table.count())

    t0 = time.perf_counter()
    for _ in range(ITERS):
        table = _batched_pipeline(batch, plan, ckey)
    counts = np.asarray(table.count())
    dt = time.perf_counter() - t0
    print("fps=%.2f features=%d" % (B * ITERS / dt, int(counts.mean())))


if __name__ == "__main__":
    main()
