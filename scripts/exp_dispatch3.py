"""Best-of-3 re-measurement of the output-composition variants.

exp_dispatch2 ran while a 4-core ATE sweep saturated the host; dispatch
overhead is host-CPU-sensitive, so each variant now times 3 windows and
reports the best (delays are one-sided noise).
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B = 16
ITERS = 32
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.io_image import load_image
    from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
    from hessgpu_tpu.pyramid import _CfgKey, make_plan, run_pipeline_batched

    img = load_image("/root/reference/data/640-1.jpg")
    g = np.asarray(rgb_to_gray(to_float(jnp.asarray(img))), np.float32)
    cfg = SiftConfig()
    plan = make_plan(*g.shape, cfg)
    ckey = _CfgKey(cfg)
    dev = jax.devices()[0]
    batch = jax.device_put(jnp.asarray(np.stack([g] * B)), dev)

    def q_u8(d):
        return jnp.clip(jnp.round(d * 512.0), 0, 255).astype(jnp.uint8)

    def make(outsel):
        @functools.partial(jax.jit, static_argnums=(1, 2))
        def fn(b, plan_, ckey_):
            t = run_pipeline_batched(b, plan_, ckey_.cfg)[0]
            return outsel(t)
        return fn

    variants = [
        ("full-table", make(lambda t: t)),
        ("no-desc", make(lambda t: (t.x, t.y, t.sigma, t.theta,
                                    t.response, t.level, t.ftype,
                                    t.valid, t.count()))),
        ("desc-u8", make(lambda t: t._replace(desc=q_u8(t.desc)))),
        ("count-only", make(lambda t: t.count())),
    ]

    for tag, fn in variants:
        best = None
        for _ in range(REPS):
            for _ in range(1):
                out = fn(batch, plan, ckey)
            _ = np.asarray(jax.tree.leaves(out)[-1])
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(batch, plan, ckey)
            _ = np.asarray(jax.tree.leaves(out)[-1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{tag}: best {B * ITERS / best:.2f} fps "
              f"({best / ITERS * 1e3:.2f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
