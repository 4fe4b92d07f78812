"""Large-image benchmarks (VERDICT round-2 item 8).

The reference's published per-stage numbers are 1024x768 (statistics.pdf
Experiment #1, BASELINE.md rows 1-8) and a 2048x1500 code comment; every
round-2 repo benchmark was 640x480. This bench times detect+describe on:

  - 1024x768  (the statistics.pdf Experiment-1 shape; 800-1.jpg resized)
  - 2048x1536 (data/1600.jpg full size - the filename lies about its
    dimensions; this is the largest image the reference ships, just
    under the -maxd 3200 ceiling and larger than the 2048x1500 shape
    in the ProgramCU.cu:481-484 pyramid-time comment)

single image per run (the realistic large-frame serving shape), with the
reference TIMINGS_* per-stage device buckets. Prints ONE JSON line.
vs_baseline: 1024x768 fps against the reference's 14.3 Hz on the same
shape (doc/statistics.pdf Exp #1 overall; feature count there was ~3082
on an unusually feature-dense image, ours is whatever the data/ image
yields at default settings).
"""

import json
import sys
import time

import numpy as np

ITERS = 20
REFERENCE_HZ = 14.3


def _time_shape(img_gray: np.ndarray, cfg):
    import jax
    import jax.numpy as jnp

    from hessgpu_tpu.pyramid import (_CfgKey, make_plan, prepare_input,
                                     run_pipeline_jit)

    h, w = img_gray.shape
    plan = make_plan(h, w, cfg)
    g = jnp.asarray(img_gray)
    table, _aux = run_pipeline_jit(g, plan, _CfgKey(cfg))
    jax.block_until_ready(table.x)
    n = int(jnp.sum(table.valid))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        table, _aux = run_pipeline_jit(g, plan, _CfgKey(cfg))
    _ = int(jnp.sum(table.valid))   # fetch = honest sync (tunneled runtime)
    dt = (time.perf_counter() - t0) / ITERS
    return 1.0 / dt, n


def main():
    import jax  # noqa: F401  (device init)
    import jax.numpy as jnp
    from PIL import Image

    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.io_image import load_image
    from hessgpu_tpu.ops.resize import rgb_to_gray, to_float

    cfg = SiftConfig()

    img800 = load_image("/root/reference/data/800-1.jpg")
    img1024 = np.asarray(
        Image.fromarray(img800).resize((1024, 768), Image.BILINEAR))
    g1024 = np.asarray(rgb_to_gray(to_float(jnp.asarray(img1024))),
                       np.float32)
    fps1024, n1024 = _time_shape(g1024, cfg)

    img2048 = load_image("/root/reference/data/1600.jpg")
    assert img2048.shape[:2] == (1536, 2048), img2048.shape
    g2048 = np.asarray(rgb_to_gray(to_float(jnp.asarray(img2048))),
                       np.float32)
    fps2048, n2048 = _time_shape(g2048, cfg)

    print(json.dumps({
        "metric": "large_image_fps_per_chip",
        "value": round(fps1024, 1),
        "unit": "frames/s at 1024x768 (single image; 800-1.jpg "
                "bilinear-resized to the statistics.pdf shape)",
        "vs_baseline": round(fps1024 / REFERENCE_HZ, 1),
        "features_1024": n1024,
        "fps_2048x1536": round(fps2048, 1),
        "features_2048": n2048,
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
