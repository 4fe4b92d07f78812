"""Output-composition experiment: which FeatureTable outputs cost the
~5 ms/call gap between full-table (749 fps) and count-only (975 fps)?

Variants return different output subsets from the SAME pipeline so the
compute is identical; only the jit output set changes.
"""
import functools
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
    from hessgpu_tpu.pyramid import _CfgKey, make_plan, run_pipeline_batched

    img = load_image("/root/reference/data/640-1.jpg")
    g = np.asarray(rgb_to_gray(to_float(jnp.asarray(img))), np.float32)
    h, w = g.shape
    cfg = SiftConfig()
    plan = make_plan(h, w, cfg)
    ckey = _CfgKey(cfg)
    dev = jax.devices()[0]
    batch = jax.device_put(jnp.asarray(np.stack([g] * B)), dev)

    def make(outsel):
        @functools.partial(jax.jit, static_argnums=(1, 2))
        def fn(b, plan_, ckey_):
            t = run_pipeline_batched(b, plan_, ckey_.cfg)[0]
            return outsel(t)
        return fn

    variants = [
        ("full-table", make(lambda t: t)),
        ("count-only", make(lambda t: t.count())),
        ("desc-only", make(lambda t: (t.desc, t.count()))),
        ("no-desc", make(lambda t: (t.x, t.y, t.sigma, t.theta,
                                    t.response, t.level, t.ftype,
                                    t.valid, t.count()))),
        ("desc-u8", make(lambda t: t._replace(
            desc=jnp.clip(jnp.round(t.desc * 512.0), 0, 255)
            .astype(jnp.uint8)))),
        ("packed-2", make(lambda t: (
            # one f32 block for all per-kp fields + desc as u8
            jnp.stack([t.x, t.y, t.sigma, t.theta, t.response,
                       t.level.astype(jnp.float32),
                       t.ftype.astype(jnp.float32),
                       t.valid.astype(jnp.float32)], -1),
            jnp.clip(jnp.round(t.desc * 512.0), 0, 255)
            .astype(jnp.uint8)))),
    ]

    for tag, fn in variants:
        for _ in range(2):
            out = fn(batch, plan, ckey)
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[-1]
        _ = np.asarray(leaf)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(batch, plan, ckey)
        _ = np.asarray(jax.tree.leaves(out)[-1])
        dt = time.perf_counter() - t0
        print(f"{tag}: {B * ITERS / dt:.2f} fps "
              f"({dt / ITERS * 1e3:.2f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
