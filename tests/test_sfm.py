"""Incremental SfM on a synthetic scene with known trajectory."""

import numpy as np
import pytest

from hessgpu_tpu.sfm.evaluate import ate_rmse, camera_centers, umeyama_alignment
from hessgpu_tpu.sfm.incremental import reconstruct_sequence


def _synthetic_sequence(rng, n_views=5, n_pts=300, noise=0.3):
    """Render feature sets for a camera orbiting a point cloud.

    Descriptors encode point identity (orthogonal-ish random codes) so
    matching recovers ground-truth correspondences.
    """
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    X = rng.rand(n_pts, 3) * np.array([6, 4, 3]) + np.array([-3, -2, 8])
    # unique descriptor per 3D point
    D = np.abs(rng.randn(n_pts, 128)).astype(np.float32)
    D /= np.linalg.norm(D, axis=1, keepdims=True)

    feats = []
    Rs, ts = [], []
    from hessgpu_tpu.sfm.ba import so3_exp
    import jax.numpy as jnp
    for v in range(n_views):
        ang = 0.04 * v
        R = np.asarray(so3_exp(jnp.asarray([0.0, ang, 0.0])))
        t = np.array([-0.6 * v, 0.02 * v, 0.0])
        Rs.append(R)
        ts.append(t)
        xc = X @ R.T + t
        z = xc[:, 2]
        u = K[0, 0] * xc[:, 0] / z + K[0, 2]
        w = K[1, 1] * xc[:, 1] / z + K[1, 2]
        vis = (z > 0.5) & (u > 10) & (u < 630) & (w > 10) & (w < 470)
        idx = np.nonzero(vis)[0]
        feats.append({
            "x": (u[idx] + noise * rng.randn(len(idx))).astype(np.float32),
            "y": (w[idx] + noise * rng.randn(len(idx))).astype(np.float32),
            "sigma": np.ones(len(idx), np.float32) * 2,
            "theta": np.zeros(len(idx), np.float32),
            "ftype": (idx % 3).astype(np.int32),  # consistent types per point
            "desc": D[idx],
        })
    return K, Rs, ts, X, feats


def test_umeyama_identity(rng):
    pts = rng.rand(20, 3)
    s, R, t = umeyama_alignment(pts, pts)
    assert abs(s - 1) < 1e-9
    np.testing.assert_allclose(R, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(t, 0, atol=1e-9)


def test_umeyama_recovers_similarity(rng):
    from hessgpu_tpu.sfm.ba import so3_exp
    import jax.numpy as jnp
    src = rng.rand(30, 3)
    Rg = np.asarray(so3_exp(jnp.asarray([0.2, -0.1, 0.3])))
    dst = 2.5 * src @ Rg.T + np.array([1, 2, 3])
    s, R, t = umeyama_alignment(src, dst)
    assert abs(s - 2.5) < 1e-6
    np.testing.assert_allclose(R, Rg, atol=1e-6)


def test_incremental_sfm_low_ate(rng):
    K, Rs, ts, X, feats = _synthetic_sequence(rng)
    rec = reconstruct_sequence(feats, K, ba_every=2, verbose=False)
    assert rec is not None
    assert rec.num_cameras == len(feats)
    est = camera_centers(rec.R, rec.t)
    gt = camera_centers(Rs, ts)
    err = ate_rmse(est, gt)
    # trajectory scale is ~3 units; demand cm-level ATE
    assert err < 0.05, f"ATE {err}"


def test_incremental_sfm_reprojection(rng):
    K, Rs, ts, X, feats = _synthetic_sequence(rng, noise=0.0)
    rec = reconstruct_sequence(feats, K, ba_every=2)
    assert rec is not None
    # noise-free input -> near-zero reprojection residuals after BA
    errs = []
    for c, p, u, v in rec.obs:
        if p >= rec.points.shape[0]:
            continue
        xc = rec.R[c] @ rec.points[p] + rec.t[c]
        pu = K[0, 0] * xc[0] / xc[2] + K[0, 2]
        pv = K[1, 1] * xc[1] / xc[2] + K[1, 2]
        errs.append(np.hypot(pu - u, pv - v))
    assert np.median(errs) < 0.1, np.median(errs)


def test_incremental_sfm_skips_bad_view(rng):
    """A corrupted middle view is skipped (lookback registration bridges
    the gap) instead of truncating the reconstruction."""
    K, Rs, ts, X, feats = _synthetic_sequence(rng, n_views=7)
    # destroy view 3's descriptors so it cannot match anything
    feats[3] = dict(feats[3])
    feats[3]["desc"] = np.abs(rng.randn(*feats[3]["desc"].shape)) \
        .astype(np.float32)
    rec = reconstruct_sequence(feats, K, ba_every=2)
    assert rec is not None
    assert rec.view_ids is not None and 3 not in rec.view_ids
    assert rec.num_cameras == 6  # all other views registered
    good = [v for v in range(7) if v != 3]
    est = camera_centers(rec.R, rec.t)
    gt = camera_centers([Rs[v] for v in good], [ts[v] for v in good])
    assert ate_rmse(est, gt) < 0.05


def test_incremental_sfm_loop_closure(rng):
    """A long orbit sequence: loop-closure edges + pose graph keep ATE low
    and the pose-graph path actually executes (loop_gap small enough)."""
    K, Rs, ts, X, feats = _synthetic_sequence(rng, n_views=12, noise=0.2)
    rec = reconstruct_sequence(feats, K, ba_every=3, loop_gap=6)
    assert rec is not None
    assert rec.num_cameras == 12
    est = camera_centers(rec.R, rec.t)
    gt = camera_centers(Rs, ts)
    assert ate_rmse(est, gt) < 0.05


def test_checkpoint_resume_matches_full_run(rng, tmp_path):
    """Reconstruct a prefix, snapshot (sfm.io), reload, resume over the
    full sequence: trajectory accuracy must match the one-shot run."""
    from hessgpu_tpu.sfm.io import load_reconstruction, save_reconstruction

    K, Rs, ts, X, feats = _synthetic_sequence(rng, n_views=8)
    gt_centers = camera_centers(Rs, ts)

    full = reconstruct_sequence(feats, K, ba_every=2, verbose=False)

    prefix = reconstruct_sequence(feats[:5], K, ba_every=2, verbose=False,
                                  loop_closure=False)
    p = str(tmp_path / "ckpt.npz")
    save_reconstruction(p, prefix)
    loaded = load_reconstruction(p)
    # round trip is exact
    np.testing.assert_array_equal(np.stack(prefix.R), np.stack(loaded.R))
    np.testing.assert_array_equal(prefix.points, loaded.points)
    assert loaded.track_of == prefix.track_of
    assert loaded.obs == prefix.obs
    assert loaded.view_ids == prefix.view_ids

    resumed = reconstruct_sequence(feats, K, ba_every=2, verbose=False,
                                   resume=loaded)
    assert resumed.num_cameras == full.num_cameras == 8

    for rec in (full, resumed):
        est = camera_centers(rec.R, rec.t)
        ate = ate_rmse(est, gt_centers[rec.view_ids])
        assert ate < 0.05, f"ATE {ate}"


def test_apply_track_merges_dedupes():
    """Union-find merge canonicalizes track ids and drops duplicate
    (camera, track) observations (the other track's view of the point)."""
    from hessgpu_tpu.sfm.incremental import Reconstruction, _apply_track_merges

    rec = Reconstruction(
        R=[np.eye(3)] * 3, t=[np.zeros(3)] * 3,
        K=np.eye(3), points=np.arange(9.0).reshape(3, 3),
        obs=[(0, 0, 1.0, 1.0), (1, 0, 2.0, 2.0),
             (1, 2, 2.1, 2.1),           # duplicate view of track 0 via 2
             (2, 2, 3.0, 3.0),
             (0, 1, 5.0, 5.0)],
        track_of={(0, 10): 0, (1, 11): 0, (1, 12): 2, (2, 13): 2, (0, 14): 1},
    )
    n = _apply_track_merges(rec, {2: 0})
    assert n == 1
    assert set(rec.track_of.values()) == {0, 1}
    # (1, 2) collapsed onto the existing (1, 0) observation
    assert rec.obs == [(0, 0, 1.0, 1.0), (1, 0, 2.0, 2.0),
                       (2, 0, 3.0, 3.0), (0, 1, 5.0, 5.0)]


def test_extend_tracks_adds_observations(rng):
    """Track extension grows observation count (longer tracks) without
    hurting trajectory accuracy, and never double-books a (cam, track)."""
    K, Rs, ts, X, feats = _synthetic_sequence(rng, n_views=6)
    rec_off = reconstruct_sequence(feats, K, ba_every=3, extend_tracks=False)
    rec_on = reconstruct_sequence(feats, K, ba_every=3, extend_tracks=True)
    assert len(rec_on.obs) >= len(rec_off.obs)
    pairs = [(c, t) for c, t, _, _ in rec_on.obs]
    assert len(pairs) == len(set(pairs))
    gt = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    est = camera_centers(rec_on.R, rec_on.t)
    assert ate_rmse(est, gt[: len(est)]) < 0.05
