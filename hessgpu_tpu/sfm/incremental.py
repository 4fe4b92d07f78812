"""Incremental SfM: sequential pose chaining, track building, triangulation,
periodic bundle adjustment.

North-star component (SURVEY.md section 7.6; no reference code). The
pipeline consumes the detector's typed features:

    images -> detect+describe (HessianSift)
           -> pairwise type-aware matching (SiftMatcher)
           -> two-view initialization (ransac_fundamental/recover_pose)
           -> PnP-style registration of each next view
           -> track table -> triangulation -> LM bundle adjustment

Scale convention: the first two cameras define the gauge (|t_01| = 1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ba import BAProblem, BAState, bundle_adjust, so3_exp
from .twoview import (essential_from_fundamental, ransac_fundamental,
                      recover_pose, triangulate)


@dataclasses.dataclass
class Reconstruction:
    """Host-side reconstruction state."""
    R: List[np.ndarray]            # per registered camera (3, 3)
    t: List[np.ndarray]            # (3,)
    K: np.ndarray                  # shared intrinsics (3, 3)
    points: np.ndarray             # (P, 3)
    # observations: (cam, pt) -> (u, v)
    obs: List[Tuple[int, int, float, float]]
    # track id per (image, feature index)
    track_of: Dict[Tuple[int, int], int]

    @property
    def num_cameras(self) -> int:
        return len(self.R)

    @property
    def num_points(self) -> int:
        return self.points.shape[0]


def default_intrinsics(width: int, height: int, focal_factor: float = 1.2):
    """COLMAP-style prior: f = focal_factor * max(w, h)."""
    f = focal_factor * max(width, height)
    return np.array([[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1.0]])


def _match_pair(feats1, feats2, matcher, type_aware=True):
    import jax.numpy as jnp

    from ..matcher import _match_core, quantize_descriptors

    d1 = quantize_descriptors(feats1["desc"])
    d2 = quantize_descriptors(feats2["desc"])
    gate = None
    if type_aware and "ftype" in feats1:
        from .twoview import type_aware_match_mask
        gate = type_aware_match_mask(jnp.asarray(feats1["ftype"]),
                                     jnp.asarray(feats2["ftype"]))
    rm = _match_core(jnp.asarray(d1), jnp.asarray(d2),
                     jnp.ones(len(d1), bool), jnp.ones(len(d2), bool),
                     0.7, 0.8, mutual_best=True, gate=gate)
    rm = np.asarray(rm)
    rows = np.nonzero(rm >= 0)[0]
    return np.stack([rows, rm[rows]], 1) if len(rows) else np.zeros((0, 2), int)


def _pnp_register(K, pts3d, pts2d, iterations=200, threshold=8.0, seed=0):
    """Register a camera from 3D-2D correspondences: vectorized P3P-lite.

    Minimal RANSAC over random 6-point DLT pose hypotheses, refined by a
    small LM on inliers (via the BA machinery with points fixed).
    """
    n = pts3d.shape[0]
    if n < 6:
        return None
    rng = np.random.RandomState(seed)
    Ki = np.linalg.inv(K)
    norm2d = (np.hstack([pts2d, np.ones((n, 1))]) @ Ki.T)[:, :2]

    best_inl = None
    best_Rt = None
    for _ in range(iterations):
        sel = rng.choice(n, 6, replace=False)
        Rt = _dlt_pose(pts3d[sel], norm2d[sel])
        if Rt is None:
            continue
        R, t = Rt
        xc = pts3d @ R.T + t
        z = np.maximum(xc[:, 2], 1e-9)
        proj = xc[:, :2] / z[:, None]
        pix = (proj @ K[:2, :2].T) + K[:2, 2]
        err = np.linalg.norm(pix - pts2d, axis=1)
        inl = (err < threshold) & (xc[:, 2] > 0)
        if best_inl is None or inl.sum() > best_inl.sum():
            best_inl = inl
            best_Rt = (R, t)
    if best_inl is None or best_inl.sum() < 6:
        return None
    R, t = best_Rt
    # refine on inliers with fixed points: 1-camera BA
    obs_idx = np.nonzero(best_inl)[0]
    prob = BAProblem(
        cam_idx=jnp.zeros(len(obs_idx), jnp.int32),
        pt_idx=jnp.asarray(np.arange(len(obs_idx)), jnp.int32),
        uv=jnp.asarray(pts2d[obs_idx], jnp.float32),
        weight=jnp.ones(len(obs_idx), jnp.float32),
    )
    intr = jnp.asarray([[K[0, 0], K[0, 2], K[1, 2]]], jnp.float32)
    st = BAState(R=jnp.asarray(R[None], jnp.float32),
                 t=jnp.asarray(t[None], jnp.float32),
                 X=jnp.asarray(pts3d[obs_idx], jnp.float32), intr=intr)
    # fix points by zero-weighting their updates: run LM with points frozen
    st2, _ = _refine_pose_only(st, prob)
    return np.asarray(st2.R[0]), np.asarray(st2.t[0]), best_inl


def _refine_pose_only(state: BAState, prob: BAProblem, iters: int = 10):
    """Gauss-Newton on the single camera pose with points fixed."""
    from .ba import _residual_fn

    def cost_fn(pose6):
        dp = pose6[None]
        dx = jnp.zeros_like(state.X)
        return _residual_fn(state, prob)((dp, dx))

    pose = jnp.zeros(6)
    for _ in range(iters):
        r = cost_fn(pose)
        J = jax.jacfwd(cost_fn)(pose).reshape(-1, 6)
        rflat = r.reshape(-1)
        H = J.T @ J + 1e-6 * jnp.eye(6)
        step = jnp.linalg.solve(H, -J.T @ rflat)
        pose = pose + step
    R = so3_exp(pose[:3]) @ state.R[0]
    t = state.t[0] + pose[3:]
    return state._replace(R=R[None], t=t[None]), None


def _dlt_pose(X, x_norm):
    """6-point DLT for P = [R|t] from 3D-2D (normalized) correspondences."""
    n = X.shape[0]
    A = []
    for i in range(n):
        Xi = np.append(X[i], 1.0)
        u, v = x_norm[i]
        A.append(np.concatenate([np.zeros(4), -Xi, v * Xi]))
        A.append(np.concatenate([Xi, np.zeros(4), -u * Xi]))
    A = np.asarray(A)
    try:
        _, _, vt = np.linalg.svd(A)
    except np.linalg.LinAlgError:
        return None
    P = vt[-1].reshape(3, 4)
    M = P[:, :3]
    # enforce rotation via SVD; fix scale/sign
    u, s, vt2 = np.linalg.svd(M)
    d = np.linalg.det(u @ vt2)
    R = u @ np.diag([1, 1, d]) @ vt2
    scale = np.mean(s) * d
    if abs(scale) < 1e-12:
        return None
    t = P[:, 3] / scale
    # cheirality check on the sample
    if np.sum((X @ R.T + t)[:, 2] > 0) < n // 2 + 1:
        R2 = -R  # improper flip
        return None
    return R, t


def reconstruct_sequence(
    feature_sets: List[dict],
    K: np.ndarray,
    min_matches: int = 30,
    ba_every: int = 3,
    ba_iterations: int = 10,
    verbose: bool = False,
) -> Optional[Reconstruction]:
    """Incremental SfM over an ordered list of per-image feature dicts
    (the output of HessianSift.run)."""
    from ..matcher import SiftMatcher

    matcher = SiftMatcher()
    n_img = len(feature_sets)
    if n_img < 2:
        return None

    # ---- initialize from the first pair ----------------------------------
    m01 = _match_pair(feature_sets[0], feature_sets[1], matcher)
    if len(m01) < min_matches:
        return None
    p1 = np.stack([feature_sets[0]["x"][m01[:, 0]],
                   feature_sets[0]["y"][m01[:, 0]]], 1).astype(np.float32)
    p2 = np.stack([feature_sets[1]["x"][m01[:, 1]],
                   feature_sets[1]["y"][m01[:, 1]]], 1).astype(np.float32)
    res = ransac_fundamental(jax.random.PRNGKey(0), jnp.asarray(p1),
                             jnp.asarray(p2), jnp.ones(len(p1), bool))
    E = essential_from_fundamental(res.F, jnp.asarray(K), jnp.asarray(K))
    R1, t1, X01, front = recover_pose(E, jnp.asarray(p1), jnp.asarray(p2),
                                      jnp.asarray(K), jnp.asarray(K),
                                      valid=res.inliers)
    keep = np.asarray(front & res.inliers)
    X01 = np.asarray(X01)

    rec = Reconstruction(
        R=[np.eye(3), np.asarray(R1)],
        t=[np.zeros(3), np.asarray(t1)],
        K=K, points=X01[keep], obs=[], track_of={},
    )
    kept_idx = np.nonzero(keep)[0]
    for tid, mi in enumerate(kept_idx):
        f0, f1 = m01[mi]
        rec.track_of[(0, int(f0))] = tid
        rec.track_of[(1, int(f1))] = tid
        rec.obs.append((0, tid, float(p1[mi, 0]), float(p1[mi, 1])))
        rec.obs.append((1, tid, float(p2[mi, 0]), float(p2[mi, 1])))

    # ---- register remaining views sequentially ---------------------------
    for i in range(2, n_img):
        mm = _match_pair(feature_sets[i - 1], feature_sets[i], matcher)
        if len(mm) < min_matches:
            if verbose:
                print(f"view {i}: too few matches, stopping")
            break
        # 2D-3D correspondences through existing tracks
        pts3d, pts2d, new_pairs = [], [], []
        for fprev, fcur in mm:
            tid = rec.track_of.get((i - 1, int(fprev)))
            if tid is not None:
                pts3d.append(rec.points[tid])
                pts2d.append([feature_sets[i]["x"][fcur],
                              feature_sets[i]["y"][fcur]])
                new_pairs.append((int(fcur), tid))
        if len(pts3d) < 6:
            if verbose:
                print(f"view {i}: too few 2D-3D, stopping")
            break
        got = _pnp_register(K, np.asarray(pts3d), np.asarray(pts2d), seed=i)
        if got is None:
            break
        Ri, ti, inl = got
        rec.R.append(Ri)
        rec.t.append(ti)
        for (fcur, tid), ok in zip(new_pairs, inl):
            if ok:
                rec.track_of[(i, fcur)] = tid
                rec.obs.append((i, tid,
                                float(feature_sets[i]["x"][fcur]),
                                float(feature_sets[i]["y"][fcur])))

        # triangulate brand-new tracks between i-1 and i
        P_prev = K @ np.hstack([rec.R[i - 1], rec.t[i - 1][:, None]])
        P_cur = K @ np.hstack([Ri, ti[:, None]])
        fresh = [(fp, fc) for fp, fc in mm
                 if (i - 1, int(fp)) not in rec.track_of
                 and (i, int(fc)) not in rec.track_of]
        if fresh:
            fp = np.asarray([f for f, _ in fresh])
            fc = np.asarray([f for _, f in fresh])
            q1 = np.stack([feature_sets[i - 1]["x"][fp],
                           feature_sets[i - 1]["y"][fp]], 1)
            q2 = np.stack([feature_sets[i]["x"][fc],
                           feature_sets[i]["y"][fc]], 1)
            Xn = np.asarray(triangulate(
                jnp.asarray(P_prev, jnp.float32),
                jnp.asarray(P_cur, jnp.float32),
                jnp.asarray(q1, jnp.float32), jnp.asarray(q2, jnp.float32)))
            z1 = (Xn @ rec.R[i - 1].T + rec.t[i - 1])[:, 2]
            z2 = (Xn @ Ri.T + ti)[:, 2]
            ok = (z1 > 0) & (z2 > 0) & np.isfinite(Xn).all(1)
            base = rec.points.shape[0]
            rec.points = np.vstack([rec.points, Xn[ok]])
            tid = base
            for k, (fpk, fck) in enumerate(fresh):
                if ok[k]:
                    rec.track_of[(i - 1, int(fpk))] = tid
                    rec.track_of[(i, int(fck))] = tid
                    rec.obs.append((i - 1, tid, float(q1[k, 0]), float(q1[k, 1])))
                    rec.obs.append((i, tid, float(q2[k, 0]), float(q2[k, 1])))
                    tid += 1

        if (i + 1) % ba_every == 0 or i == n_img - 1:
            rec = run_global_ba(rec, iterations=ba_iterations)
            if verbose:
                print(f"view {i}: cams={rec.num_cameras} pts={rec.num_points}")

    rec = run_global_ba(rec, iterations=ba_iterations)
    return rec


def run_global_ba(rec: Reconstruction, iterations: int = 10) -> Reconstruction:
    obs = np.asarray([(c, p, u, v) for c, p, u, v in rec.obs
                      if p < rec.points.shape[0]])
    if len(obs) < 10:
        return rec
    prob = BAProblem(
        cam_idx=jnp.asarray(obs[:, 0], jnp.int32),
        pt_idx=jnp.asarray(obs[:, 1], jnp.int32),
        uv=jnp.asarray(obs[:, 2:4], jnp.float32),
        weight=jnp.ones(len(obs), jnp.float32),
    )
    C = rec.num_cameras
    intr = jnp.broadcast_to(
        jnp.asarray([rec.K[0, 0], rec.K[0, 2], rec.K[1, 2]], jnp.float32),
        (C, 3))
    st = BAState(R=jnp.asarray(np.stack(rec.R), jnp.float32),
                 t=jnp.asarray(np.stack(rec.t), jnp.float32),
                 X=jnp.asarray(rec.points, jnp.float32), intr=intr)
    out, _ = bundle_adjust(st, prob, iterations=iterations)
    rec.R = [np.asarray(out.R[i]) for i in range(C)]
    rec.t = [np.asarray(out.t[i]) for i in range(C)]
    rec.points = np.asarray(out.X)
    return rec
