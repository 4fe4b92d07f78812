"""Secondary benchmark: BASELINE.json config 2 - batched detect+describe
over data/list640.txt (640-1..5.jpg) with top-K 2048 selection.

Prints one JSON line (same schema as bench.py). Not run by the driver
automatically; kept for apples-to-apples tracking of the batched+topk
workload.
"""

import json
import sys
import time

import numpy as np

REFERENCE_HZ = 14.3


def main():
    import jax
    import jax.numpy as jnp

    from hessgpu_tpu.config import SiftConfig, TRUNCATE_TOP_K
    from hessgpu_tpu.io_image import load_image
    from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
    from hessgpu_tpu.parallel.batch import _batched_pipeline
    from hessgpu_tpu.pyramid import _CfgKey, make_plan

    paths = [f"/root/reference/data/640-{i}.jpg" for i in range(1, 6)]
    imgs = []
    for p in paths:
        g = np.asarray(rgb_to_gray(to_float(jnp.asarray(load_image(p)))),
                       np.float32)
        imgs.append(g)
    batch = jnp.asarray(np.stack(imgs))

    cfg = SiftConfig(truncate_method=TRUNCATE_TOP_K,
                     feature_count_threshold=2048)
    plan = make_plan(batch.shape[1], batch.shape[2], cfg)
    ckey = _CfgKey(cfg)

    for _ in range(2):
        table = _batched_pipeline(batch, plan, ckey)
        jax.block_until_ready(table.valid)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        table = _batched_pipeline(batch, plan, ckey)
    jax.block_until_ready(table.valid)
    dt = time.perf_counter() - t0

    fps = len(paths) * iters / dt
    counts = np.asarray(table.count())
    print(json.dumps({
        "metric": "list640_batch_topk2048_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_HZ, 2),
        "features_per_frame": counts.tolist(),
    }))


if __name__ == "__main__":
    sys.exit(main())
