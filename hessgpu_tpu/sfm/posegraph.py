"""Pose-graph optimization: SE(3) relative-pose constraints, Gauss-Newton.

North-star component (BASELINE.json: "pose-graph via all-reduce"). Given
odometry/loop-closure edges (i, j, R_ij, t_ij) measuring camera j's pose in
camera i's frame, refine absolute poses. Vectorized over edges; the edge
residual sum distributes across a mesh with psum (edges sharded) - the same
pattern as distributed BA.

Convention: world->camera poses (R_c, t_c); the relative measurement
predicts R_ij = R_j R_i^T, t_ij = t_j - R_j R_i^T t_i.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .ba import so3_exp


class PoseGraph(NamedTuple):
    edge_i: jnp.ndarray     # i32 (E,)
    edge_j: jnp.ndarray     # i32 (E,)
    R_ij: jnp.ndarray       # f32 (E, 3, 3) measured relative rotations
    t_ij: jnp.ndarray       # f32 (E, 3)
    weight: jnp.ndarray     # f32 (E,)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3), Taylor-safe."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    small = theta < 1e-5
    # scale = theta / (2 sin theta); -> 1/2 as theta -> 0
    sin = jnp.sin(theta)
    sin_safe = jnp.where(small, 1.0, sin)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0,
                      theta / (2.0 * sin_safe))
    return w * scale[..., None]


def _residuals(R, t, delta, graph: PoseGraph):
    """Edge residuals (E, 6): [rotation log | translation]."""
    dR = so3_exp(delta[:, :3])
    Rn = dR @ R
    tn = t + delta[:, 3:]

    Ri = Rn[graph.edge_i]
    Rj = Rn[graph.edge_j]
    ti = tn[graph.edge_i]
    tj = tn[graph.edge_j]

    R_rel = Rj @ jnp.swapaxes(Ri, -1, -2)
    t_rel = tj - jnp.einsum("eij,ej->ei", R_rel, ti)

    r_rot = so3_log(jnp.swapaxes(graph.R_ij, -1, -2) @ R_rel)
    r_t = t_rel - graph.t_ij
    return jnp.concatenate([r_rot, r_t], axis=1) * graph.weight[:, None]


def optimize_pose_graph(
    R0: jnp.ndarray, t0: jnp.ndarray, graph: PoseGraph,
    iterations: int = 20, lam: float = 1e-4,
    fix_first: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton on the pose graph. R0: (C, 3, 3), t0: (C, 3)."""
    C = R0.shape[0]
    R, t = jnp.asarray(R0), jnp.asarray(t0)

    mask = jnp.ones((C, 1))
    if fix_first:
        mask = mask.at[0].set(0.0)

    @jax.jit
    def step(R, t):
        def fn(delta):
            return _residuals(R, t, delta, graph)

        zero = jnp.zeros((C, 6))
        res = fn(zero)
        _, vjp = jax.vjp(fn, zero)
        grad = vjp(res)[0] * mask

        def hvp(v):
            _, jv = jax.jvp(fn, (zero,), (v,))
            return vjp(jv)[0] * mask + lam * v

        # plain CG (the system is small: 6C unknowns)
        b = -grad
        x = jnp.zeros_like(b)
        r = b
        p = r
        rs = jnp.sum(r * r)

        def body(_, carry):
            x, r, p, rs = carry
            hp = hvp(p)
            alpha = rs / (jnp.sum(p * hp) + 1e-20)
            x = x + alpha * p
            r = r - alpha * hp
            rs_new = jnp.sum(r * r)
            p = r + (rs_new / (rs + 1e-20)) * p
            return x, r, p, rs_new

        x, *_ = jax.lax.fori_loop(0, 40, body, (x, r, p, rs))
        x = x * mask
        Rn = so3_exp(x[:, :3]) @ R
        tn = t + x[:, 3:]
        # accept only if cost decreased
        c0 = jnp.sum(res ** 2)
        c1 = jnp.sum(_residuals(Rn, tn, jnp.zeros((C, 6)), graph) ** 2)
        ok = c1 < c0
        return (jnp.where(ok, Rn, R), jnp.where(ok, tn, t))

    for _ in range(iterations):
        R, t = step(R, t)
    return R, t


def graph_cost(R, t, graph: PoseGraph) -> float:
    C = R.shape[0]
    res = _residuals(jnp.asarray(R), jnp.asarray(t),
                     jnp.zeros((C, 6)), graph)
    return float(jnp.sum(res ** 2))
