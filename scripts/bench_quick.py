"""Quick hessian-only throughput check (same protocol as bench.py's
headline number: warmup drained by a value fetch, timed region ends in a
value fetch). For lever iteration; the recorded number stays bench.py's."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DEFAULT_IMG = "/root/reference/data/640-1.jpg"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=_DEFAULT_IMG)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()
    B, ITERS = args.batch, args.iters
    import jax
    import jax.numpy as jnp

    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.io_image import load_image
    from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
    from hessgpu_tpu.parallel.batch import _batched_pipeline
    from hessgpu_tpu.pyramid import _CfgKey, make_plan

    img = load_image(args.image)
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
