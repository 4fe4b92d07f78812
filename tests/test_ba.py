"""Bundle adjustment on synthetic problems with known ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from hessgpu_tpu.sfm.ba import (BAProblem, BAState, bundle_adjust,
                                reprojection_rmse, so3_exp)


def _rotmat(rng, scale=0.1):
    """Rotation by a random axis-angle with |angle| ~ scale (well-defined
    smallness - QR of a near-identity matrix is NOT near identity due to
    sign conventions)."""
    from hessgpu_tpu.sfm.ba import so3_exp
    return np.asarray(so3_exp(jnp.asarray(scale * rng.randn(3))))


def _make_problem(rng, C=4, P=60, noise=0.0, perturb=0.05):
    f, cx, cy = 500.0, 320.0, 240.0
    X = rng.rand(P, 3) * np.array([4, 3, 2]) + np.array([-2, -1.5, 6])
    Rs, ts = [], []
    for c in range(C):
        Rs.append(_rotmat(rng, 0.05))
        ts.append(np.array([c * 0.5, 0.02 * c, 0.01 * c]))
    Rs, ts = np.stack(Rs), np.stack(ts)

    cams, pts, uvs = [], [], []
    for c in range(C):
        xc = X @ Rs[c].T + ts[c]
        u = f * xc[:, 0] / xc[:, 2] + cx
        v = f * xc[:, 1] / xc[:, 2] + cy
        for p in range(P):
            cams.append(c)
            pts.append(p)
            uvs.append([u[p] + noise * rng.randn(),
                        v[p] + noise * rng.randn()])

    prob = BAProblem(
        cam_idx=jnp.asarray(cams, jnp.int32),
        pt_idx=jnp.asarray(pts, jnp.int32),
        uv=jnp.asarray(uvs, jnp.float32),
        weight=jnp.ones(len(cams), jnp.float32),
    )
    intr = jnp.broadcast_to(jnp.asarray([f, cx, cy]), (C, 3))
    gt = BAState(R=jnp.asarray(Rs, jnp.float32),
                 t=jnp.asarray(ts, jnp.float32),
                 X=jnp.asarray(X, jnp.float32), intr=intr)

    # perturb everything except camera 0 (the gauge)
    Rp = Rs.copy()
    tp = ts.copy()
    for c in range(1, C):
        Rp[c] = _rotmat(rng, perturb * 0.2) @ Rp[c]
        tp[c] = tp[c] + perturb * rng.randn(3)
    Xp = X + perturb * rng.randn(P, 3)
    init = BAState(R=jnp.asarray(Rp, jnp.float32),
                   t=jnp.asarray(tp, jnp.float32),
                   X=jnp.asarray(Xp, jnp.float32), intr=intr)
    return gt, init, prob


def test_so3_exp_basic():
    R = np.asarray(so3_exp(jnp.asarray([0.0, 0.0, np.pi / 2])))
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(R, want, atol=1e-6)
    # identity for zero
    np.testing.assert_allclose(np.asarray(so3_exp(jnp.zeros(3))), np.eye(3),
                               atol=1e-6)


def test_ba_reduces_reprojection_error(rng):
    gt, init, prob = _make_problem(rng)
    rmse0 = reprojection_rmse(init, prob)
    out, _ = bundle_adjust(init, prob, iterations=15)
    rmse1 = reprojection_rmse(out, prob)
    assert rmse0 > 1.0          # the perturbation is visible
    assert rmse1 < 0.05, (rmse0, rmse1)


def test_ba_recovers_poses(rng):
    gt, init, prob = _make_problem(rng)
    out, _ = bundle_adjust(init, prob, iterations=20)
    # camera rotations recovered (gauge fixed by camera 0)
    for c in range(gt.R.shape[0]):
        dR = np.asarray(out.R[c]) @ np.asarray(gt.R[c]).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.5, (c, ang)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(gt.t), atol=0.02)


def test_ba_noise_floor(rng):
    """With pixel noise, BA converges to ~noise-level residuals."""
    gt, init, prob = _make_problem(rng, noise=0.5)
    out, _ = bundle_adjust(init, prob, iterations=15)
    rmse = reprojection_rmse(out, prob)
    assert rmse < 0.8, rmse


def test_ba_respects_weights(rng):
    gt, init, prob = _make_problem(rng)
    # zero out half the observations; BA should still converge using the rest
    w = np.asarray(prob.weight).copy()
    w[::2] = 0.0
    prob2 = prob._replace(weight=jnp.asarray(w))
    out, _ = bundle_adjust(init, prob2, iterations=20)
    assert reprojection_rmse(out, prob2) < 0.05


def test_huber_ba_resists_outliers(rng):
    """Gross outlier observations: plain BA gets dragged, a redescending
    (Cauchy) robust loss + pruning recovers near the clean solution."""
    from hessgpu_tpu.sfm.ba import prune_outliers

    gt, init, prob = _make_problem(rng)
    uv = np.asarray(prob.uv).copy()
    n_out = len(uv) // 10
    idx = rng.choice(len(uv), n_out, replace=False)
    uv[idx] += rng.rand(n_out, 2) * 200 + 50
    prob_bad = prob._replace(uv=jnp.asarray(uv))

    out_plain, _ = bundle_adjust(init, prob_bad, iterations=15)
    out_rob, _ = bundle_adjust(init, prob_bad, iterations=15,
                               huber_delta=2.0, loss="cauchy")
    probp, npruned = prune_outliers(out_rob, prob_bad, threshold=4.0)
    assert npruned >= n_out * 0.8, npruned
    out_rob, _ = bundle_adjust(out_rob, probp, iterations=8,
                               huber_delta=2.0, loss="cauchy")

    # measure on the clean inlier set only
    mask = np.ones(len(uv), bool)
    mask[idx] = False
    clean = prob._replace(weight=jnp.asarray(mask.astype(np.float32)))
    rmse_plain = reprojection_rmse(out_plain, clean)
    rmse_rob = reprojection_rmse(out_rob, clean)
    assert rmse_rob < 0.1, rmse_rob
    assert rmse_rob < rmse_plain


def test_prune_outliers_counts(rng):
    gt, init, prob = _make_problem(rng)
    # ground-truth state: every observation is exact, so nothing prunes
    from hessgpu_tpu.sfm.ba import prune_outliers
    prob2, n = prune_outliers(gt, prob, threshold=1.0)
    assert n == 0
    assert np.all(np.asarray(prob2.weight) == np.asarray(prob.weight))


def test_dense_selection_matches_gather():
    """The one-hot-matmul observation selection (TPU formulation) equals
    the gather formulation: bit-exact residuals, same LM trajectory to
    float-accumulation tolerance."""
    import jax.numpy as jnp
    import numpy as np

    from hessgpu_tpu.sfm.ba import (BAProblem, BAState, _residual_fn,
                                    lm_step, reprojection_rmse, so3_exp)

    rng = np.random.default_rng(3)
    C, P, O = 5, 300, 900
    X = jnp.asarray(rng.uniform(-2, 2, (P, 3)) + [[0, 0, 6.0]], jnp.float32)
    R = so3_exp(jnp.asarray(rng.normal(0, 0.1, (C, 3)), jnp.float32))
    t = jnp.asarray(rng.normal(0, 0.2, (C, 3)), jnp.float32)
    intr = jnp.tile(jnp.asarray([[200.0, 64.0, 48.0]], jnp.float32), (C, 1))
    state = BAState(R=R, t=t, X=X, intr=intr)
    prob = BAProblem(
        cam_idx=jnp.asarray(rng.integers(0, C, O), jnp.int32),
        pt_idx=jnp.asarray(rng.integers(0, P, O), jnp.int32),
        uv=jnp.asarray(rng.uniform(0, 128, (O, 2)), jnp.float32),
        weight=jnp.ones((O,), jnp.float32))

    zero = (jnp.zeros((C, 6)), jnp.zeros_like(X))
    r0 = _residual_fn(state, prob, dense=False)(zero)
    r1 = _residual_fn(state, prob, dense=True)(zero)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))

    lam = jnp.asarray(1e-3)
    sA = sB = state
    lamA = lamB = lam
    for _ in range(4):
        sA, lamA, *_ = lm_step(sA, prob, lamA, cg_iters=10, dense=False)
        sB, lamB, *_ = lm_step(sB, prob, lamB, cg_iters=10, dense=True)
    assert abs(reprojection_rmse(sA, prob)
               - reprojection_rmse(sB, prob)) < 1e-4
