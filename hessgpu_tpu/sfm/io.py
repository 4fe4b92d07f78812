"""Checkpoint / resume for reconstructions.

The detector side persists features via formats.save_sift (the reference's
SaveSIFT, SURVEY.md section 5.4); this module is the SfM-layer analogue:
a Reconstruction snapshots to one .npz and a long sequence can resume
from it (reconstruct_sequence(..., resume=...)) - e.g. checkpoint every N
keyframes on a multi-hour mapping run and restart after preemption, the
north-star equivalent of a training job's checkpoint/restore.
"""

from __future__ import annotations

import numpy as np

from .incremental import Reconstruction


def save_reconstruction(path: str, rec: Reconstruction) -> None:
    """Snapshot a Reconstruction to one compressed .npz."""
    obs = (np.asarray(rec.obs, np.float64).reshape(-1, 4)
           if rec.obs else np.zeros((0, 4)))
    tracks = (np.asarray(
        [(im, fi, tid) for (im, fi), tid in rec.track_of.items()],
        np.int64).reshape(-1, 3) if rec.track_of else
        np.zeros((0, 3), np.int64))
    view_ids = rec.view_ids if rec.view_ids is not None \
        else list(range(len(rec.R)))
    np.savez_compressed(
        path, R=np.stack(rec.R), t=np.stack(rec.t),
        K=np.asarray(rec.K), points=np.asarray(rec.points),
        obs=obs, tracks=tracks,
        view_ids=np.asarray(view_ids, np.int64))


def load_reconstruction(path: str) -> Reconstruction:
    z = np.load(path)
    return Reconstruction(
        R=[r for r in z["R"]],
        t=[t for t in z["t"]],
        K=z["K"],
        points=z["points"],
        obs=[(int(c), int(p), float(u), float(v)) for c, p, u, v in z["obs"]],
        track_of={(int(im), int(fi)): int(t) for im, fi, t in z["tracks"]},
        view_ids=[int(v) for v in z["view_ids"]],
    )
