"""Pose-graph optimization: drift correction with loop closures."""

import numpy as np
import jax.numpy as jnp
import pytest

from hessgpu_tpu.sfm.ba import so3_exp
from hessgpu_tpu.sfm.posegraph import (PoseGraph, graph_cost,
                                       optimize_pose_graph, so3_log)


def test_so3_log_roundtrip(rng):
    for _ in range(10):
        w = rng.randn(3) * 0.8
        R = so3_exp(jnp.asarray(w))
        back = np.asarray(so3_log(R))
        np.testing.assert_allclose(back, w, atol=1e-5)


def _make_trajectory(rng, C=12):
    """Ground-truth poses along a noisy circle + odometry/loop edges."""
    Rs, ts = [], []
    for c in range(C):
        Rs.append(np.asarray(so3_exp(jnp.asarray([0.0, 0.3 * c, 0.0]))))
        ts.append(np.array([np.cos(0.3 * c), 0.1 * c % 0.5,
                            np.sin(0.3 * c)]))
    Rs, ts = np.stack(Rs), np.stack(ts)

    ei, ej, Rij, tij = [], [], [], []

    def add_edge(i, j):
        Rr = Rs[j] @ Rs[i].T
        tr = ts[j] - Rr @ ts[i]
        ei.append(i)
        ej.append(j)
        Rij.append(Rr)
        tij.append(tr)

    for c in range(C - 1):
        add_edge(c, c + 1)
    add_edge(0, C - 1)       # loop closure
    add_edge(0, C // 2)
    graph = PoseGraph(
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        R_ij=jnp.asarray(np.stack(Rij), jnp.float32),
        t_ij=jnp.asarray(np.stack(tij), jnp.float32),
        weight=jnp.ones(len(ei), jnp.float32),
    )
    return Rs, ts, graph


def test_posegraph_recovers_from_drift(rng):
    Rs, ts, graph = _make_trajectory(rng)
    C = Rs.shape[0]
    # perturb all poses except the gauge
    Rp = Rs.copy()
    tp = ts.copy()
    for c in range(1, C):
        Rp[c] = np.asarray(so3_exp(jnp.asarray(0.05 * rng.randn(3)))) @ Rp[c]
        tp[c] = tp[c] + 0.1 * rng.randn(3)

    c_before = graph_cost(Rp, tp, graph)
    Ro, to = optimize_pose_graph(jnp.asarray(Rp, jnp.float32),
                                 jnp.asarray(tp, jnp.float32), graph)
    c_after = graph_cost(np.asarray(Ro), np.asarray(to), graph)
    assert c_after < c_before * 1e-3, (c_before, c_after)
    # poses recovered (gauge = camera 0 anchored at ground truth)
    np.testing.assert_allclose(np.asarray(to), ts, atol=0.02)
    for c in range(C):
        dR = np.asarray(Ro[c]) @ Rs[c].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0, (c, ang)
