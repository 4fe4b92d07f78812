"""Single-chip cost of the row-sharded spatial path (VERDICT r3 task 4).

Runs sharded_detect_and_describe on a mesh of ONE real chip vs the plain
pipeline on the same image, so the sharding overhead (halo plumbing,
all_gather masks, per-shard compaction) is measured on hardware and the
multi-chip projection for >3200-px images is grounded. Prints one JSON
line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.io_image import load_image
    from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
    from hessgpu_tpu.parallel.distributed import device_mesh
    from hessgpu_tpu.parallel.spatial import sharded_detect_and_describe
    from hessgpu_tpu.pyramid import _CfgKey, make_plan, run_pipeline_jit

    from PIL import Image

    img800 = load_image("/root/reference/data/800-1.jpg")
    img = np.asarray(Image.fromarray(img800).resize((1024, 768),
                                                    Image.BILINEAR))
    g = np.asarray(rgb_to_gray(to_float(jnp.asarray(img))), np.float32)
    cfg = SiftConfig()
    mesh = device_mesh("rows", 1)

    t = sharded_detect_and_describe(jnp.asarray(g), cfg, mesh)
    jax.block_until_ready(t.x)
    n_sh = int(jnp.sum(t.valid))
    it = 10
    t0 = time.perf_counter()
    for _ in range(it):
        t = sharded_detect_and_describe(jnp.asarray(g), cfg, mesh)
    _ = int(jnp.sum(t.valid))   # fetch = honest sync
    ms_sharded = (time.perf_counter() - t0) / it * 1e3

    plan = make_plan(*g.shape, cfg)
    tb, _ = run_pipeline_jit(jnp.asarray(g), plan, _CfgKey(cfg))
    jax.block_until_ready(tb.x)
    t0 = time.perf_counter()
    for _ in range(it):
        tb, _ = run_pipeline_jit(jnp.asarray(g), plan, _CfgKey(cfg))
    _ = int(jnp.sum(tb.valid))   # fetch = honest sync
    ms_pipeline = (time.perf_counter() - t0) / it * 1e3

    print(json.dumps({
        "metric": "spatial_sharded_single_chip_ms",
        "value": round(ms_sharded, 2),
        "unit": "ms/frame 1024x768 (n=1 sharded path)",
        "vs_baseline": round(ms_pipeline / ms_sharded, 3),
        "pipeline_ms": round(ms_pipeline, 2),
        "features_sharded": n_sh,
        "features_pipeline": int(jnp.sum(tb.valid)),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
