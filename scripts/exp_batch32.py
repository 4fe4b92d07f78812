"""One-off: fps at B=16 vs B=32 on the current code (dispatch-gap
amortization check)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run(B):
    import jax
    import jax.numpy as jnp

    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.io_image import load_image
    from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
    from hessgpu_tpu.parallel.batch import _batched_pipeline
    from hessgpu_tpu.pyramid import _CfgKey, make_plan

    img = load_image("/root/reference/data/640-1.jpg")
    g = np.asarray(rgb_to_gray(to_float(jnp.asarray(img))), np.float32)
    cfg = SiftConfig()
    plan = make_plan(*g.shape, cfg)
    ckey = _CfgKey(cfg)
    batch = jax.device_put(jnp.asarray(np.stack([g] * B)), jax.devices()[0])
    for _ in range(2):
        t = _batched_pipeline(batch, plan, ckey)
        jax.block_until_ready(t.valid)
    iters = max(8, 512 // B)
    t0 = time.perf_counter()
    for _ in range(iters):
        t = _batched_pipeline(batch, plan, ckey)
    jax.block_until_ready(t.valid)
    dt = time.perf_counter() - t0
    print(f"B={B}: {B * iters / dt:.2f} fps ({dt / iters * 1e3:.2f} ms/call)",
          flush=True)


if __name__ == "__main__":
    for B in (16, 32, 64):
        run(B)
