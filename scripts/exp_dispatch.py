"""Localize the per-execution dispatch gap (VERDICT r4 task 4).

Round-4 profile: device time 22.4 ms/batch vs wall 25.9 ms/batch - a
~3.5 ms/batch gap through the tunneled runtime. Candidate causes:
  (a) per-output-buffer creation RPCs (FeatureTable has many leaves);
  (b) fixed per-execution runtime overhead (unfixable from here);
  (c) insufficient queue depth (executions not overlapping).
Experiments:
  1. full pipeline, value-fetch sync (the bench protocol) - baseline;
  2. same but the jitted function returns ONLY the count vector (one
     small output buffer) - isolates (a);
  3. two independent input batches alternated - isolates input-buffer
     reuse serialization;
  4. B=32 - amortizes any per-execution overhead over 2x frames.
"""
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
    dev = jax.devices()[0]
    batch = jax.device_put(jnp.asarray(np.stack([g] * B)), dev)

    def timed(tag, fn, nframes=B * ITERS):
        for _ in range(2):
            out = fn()
        _ = np.asarray(out)          # drain
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn()
        _ = np.asarray(out)          # honest sync
        dt = time.perf_counter() - t0
        print(f"{tag}: {nframes / dt:.2f} fps "
              f"({dt / ITERS * 1e3:.2f} ms/call)", flush=True)

    # 1. baseline (bench protocol)
    timed("full-table", lambda: _batched_pipeline(batch, plan, ckey).count())

    # 2. count-only output
    import functools

    from hessgpu_tpu.pyramid import run_pipeline_batched

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def count_only(b, plan_, ckey_):
        return run_pipeline_batched(b, plan_, ckey_.cfg)[0].count()

    timed("count-only", lambda: count_only(batch, plan, ckey))

    # 3. alternating input buffers
    batch2 = jax.device_put(jnp.asarray(np.stack([g] * B)), dev)
    bufs = [batch, batch2]

    def alt():
        t1 = _batched_pipeline(bufs[0], plan, ckey)
        t2 = _batched_pipeline(bufs[1], plan, ckey)
        return jnp.stack([t1.count(), t2.count()])

    timed("alternating-x2", alt, nframes=2 * B * ITERS)

    # 4. B=32
    batch32 = jax.device_put(jnp.asarray(np.stack([g] * 32)), dev)
    timed("B=32", lambda: _batched_pipeline(batch32, plan, ckey).count(),
          nframes=32 * ITERS)


if __name__ == "__main__":
    main()
