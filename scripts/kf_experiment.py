"""Keyframe-selection experiment: ATE at the DEFAULT detection threshold
on the 40-frame synthetic sequence, sweeping keyframe_parallax_deg.

Features are detected once and cached to disk so each SfM setting reruns
in seconds. Usage:
    python scripts/kf_experiment.py [par_deg ...] [key=value ...]
key=value args are forwarded to reconstruct_sequence (ints/floats/strings
inferred), e.g.:
    python scripts/kf_experiment.py 0.0 huber_delta=1.5 final_rounds=3
"""

import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from hessgpu_tpu import HessianSift, SiftConfig
from hessgpu_tpu.sfm.datasets import load_tum_sequence
from hessgpu_tpu.sfm.evaluate import ate_rmse, camera_centers
from hessgpu_tpu.sfm.incremental import reconstruct_sequence
from hessgpu_tpu.sfm.synthetic import write_tum_sequence

N_FRAMES = int(os.environ.get("KF_FRAMES", "40"))
PASSES = int(os.environ.get("KF_PASSES", "1"))
THRESHOLD = float(os.environ.get("KF_T", "0"))  # 0 = library default
MESH = int(os.environ.get("KF_MESH", "0"))      # >0: sharded periodic BAs


def main():
    tag = f"{N_FRAMES}_{PASSES}_{THRESHOLD}"
    root = os.path.join(tempfile.gettempdir(), f"hessgpu_kfexp_{tag}")
    cache = os.path.join(root, "feats.pkl")
    meta = write_tum_sequence(root, n_frames=N_FRAMES, h=480, w=640,
                              passes=PASSES)
    seq = load_tum_sequence(root)

    if os.path.exists(cache):
        with open(cache, "rb") as f:
            feats = pickle.load(f)
    else:
        cfg = SiftConfig()
        if THRESHOLD:
            cfg.threshold = THRESHOLD
        sift = HessianSift(cfg)
        t0 = time.time()
        feats = [sift.run(p) for p in seq["image_paths"]]
        print(f"detect: {time.time() - t0:.0f}s, "
              f"{np.mean([len(f['x']) for f in feats]):.0f} feats/frame")
        with open(cache, "wb") as f:
            pickle.dump(feats, f)

    gt = seq["gt_centers"]
    mesh = None
    if MESH:
        from hessgpu_tpu.parallel.distributed import device_mesh
        mesh = device_mesh("obs", MESH)
    overrides = {}
    pars = []
    for a in sys.argv[1:]:
        if "=" in a:
            k, v = a.split("=", 1)
            try:
                overrides[k] = int(v)
            except ValueError:
                try:
                    overrides[k] = float(v)
                except ValueError:
                    overrides[k] = v
        else:
            pars.append(float(a))
    sweep = pars or [0.0, 1.0, 1.5, 2.5, 4.0]
    if overrides:
        print("overrides:", overrides, flush=True)
    for par in sweep:
        t0 = time.time()
        rec = reconstruct_sequence(feats, meta["K"], mesh=mesh,
                                   keyframe_parallax_deg=par, **overrides)
        if rec is None:
            print(f"par={par}: FAILED")
            continue
        est = camera_centers(rec.R, rec.t)
        ids = rec.view_ids or list(range(rec.num_cameras))
        sel = [(c, v) for c, v in enumerate(ids) if v < len(gt)]
        ate = ate_rmse(est[[c for c, _ in sel]], gt[[v for _, v in sel]])
        print(f"par={par}: ATE {ate:.4f}  reg {rec.num_cameras}/{N_FRAMES} "
              f"pts {rec.num_points}  {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
