"""Distributed bundle adjustment: observations sharded across a device mesh.

North-star component (BASELINE.json config 5): map blocks / observation
lists partitioned across chips (and hosts via jax.distributed), with the
Gauss-Newton system solved by the same matrix-free PCG as sfm/ba.py -
every Hessian-vector product and preconditioner block becomes a LOCAL
segment-sum followed by a psum over the mesh. State (poses, points) is
replicated; gradients/curvature are reduce-summed - the Schur-free analogue
of distributed Schur reduction, with identical collectives cost shape
(all-reduce of per-camera/per-point blocks).

The observation list is padded to a multiple of the mesh size with
zero-weight entries, so sharding is trivial and exact.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .ba import BAProblem, BAState, so3_exp


def _project_local(state: BAState, dpose, dpt, cam_idx, pt_idx, uv, weight):
    dR = so3_exp(dpose[:, :3])
    R = dR @ state.R
    t = state.t + dpose[:, 3:]
    X = state.X + dpt

    Rc = R[cam_idx]
    tc = t[cam_idx]
    Xp = X[pt_idx]
    xc = jnp.einsum("oij,oj->oi", Rc, Xp) + tc
    z = jnp.maximum(xc[:, 2], 1e-6)
    intr = state.intr[cam_idx]
    u = intr[:, 0] * xc[:, 0] / z + intr[:, 1]
    v = intr[:, 0] * xc[:, 1] / z + intr[:, 2]
    res = jnp.stack([u, v], 1) - uv
    return res * weight[:, None]


def pad_problem(prob: BAProblem, multiple: int) -> BAProblem:
    """Pad the observation list with zero-weight entries."""
    n = prob.cam_idx.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return prob
    return BAProblem(
        cam_idx=jnp.pad(prob.cam_idx, (0, pad)),
        pt_idx=jnp.pad(prob.pt_idx, (0, pad)),
        uv=jnp.pad(prob.uv, ((0, pad), (0, 0))),
        weight=jnp.pad(prob.weight, (0, pad)),
    )


def make_sharded_lm_step(mesh: Mesh, cg_iters: int = 30,
                         fix_first_cam: bool = True):
    """Build a jitted LM step with observations sharded over the mesh."""
    axis = mesh.axis_names[0]

    def local_blocks(state, lam, cam_idx, pt_idx, uv, weight):
        """Local block-diagonal curvature, then psum."""
        C = state.R.shape[0]
        Pn = state.X.shape[0]

        def per_obs(ci, pi, uvi, wt):
            Rc, tc, intr = state.R[ci], state.t[ci], state.intr[ci]
            Xp = state.X[pi]

            def res_one(dp6, dx3):
                R = so3_exp(dp6[:3]) @ Rc
                t = tc + dp6[3:]
                X = Xp + dx3
                xc = R @ X + t
                z = jnp.maximum(xc[2], 1e-6)
                u = intr[0] * xc[0] / z + intr[1]
                v = intr[0] * xc[1] / z + intr[2]
                return (jnp.stack([u, v]) - uvi) * wt

            Jp = jax.jacfwd(res_one, argnums=0)(jnp.zeros(6), jnp.zeros(3))
            Jx = jax.jacfwd(res_one, argnums=1)(jnp.zeros(6), jnp.zeros(3))
            return Jp.T @ Jp, Jx.T @ Jx

        Hcc, Hpp = jax.vmap(per_obs)(cam_idx, pt_idx, uv, weight)
        Hc = jax.ops.segment_sum(Hcc, cam_idx, C)
        Hp = jax.ops.segment_sum(Hpp, pt_idx, Pn)
        Hc = jax.lax.psum(Hc, axis) + lam * jnp.eye(6)[None]
        Hp = jax.lax.psum(Hp, axis) + lam * jnp.eye(3)[None]
        return jnp.linalg.inv(Hc), jnp.linalg.inv(Hp)

    def step(state: BAState, lam, cam_idx, pt_idx, uv, weight):
        C = state.R.shape[0]
        zero = (jnp.zeros((C, 6)), jnp.zeros_like(state.X))

        cam_mask = jnp.ones((C, 1))
        if fix_first_cam:
            cam_mask = cam_mask.at[0].set(0.0)

        def project(v):
            return (v[0] * cam_mask, v[1])

        def fn(params):
            dp, dx = params
            return _project_local(state, dp, dx, cam_idx, pt_idx, uv, weight)

        res0 = fn(zero)
        cost0 = 0.5 * jax.lax.psum(jnp.sum(res0 ** 2), axis)

        _, vjp = jax.vjp(fn, zero)
        g_local = vjp(res0)[0]
        grad = jax.tree.map(lambda a: jax.lax.psum(a, axis), g_local)

        def hvp(v):
            _, jv = jax.jvp(fn, (zero,), (v,))
            hv_local = vjp(jv)[0]
            hv = jax.tree.map(lambda a: jax.lax.psum(a, axis), hv_local)
            return project((hv[0] + lam * v[0], hv[1] + lam * v[1]))

        Mc, Mp = local_blocks(state, lam, cam_idx, pt_idx, uv, weight)

        def precond(v):
            return project((jnp.einsum("cij,cj->ci", Mc, v[0]),
                            jnp.einsum("pij,pj->pi", Mp, v[1])))

        b = project((-grad[0], -grad[1]))

        def dot(a, bb):
            return jnp.sum(a[0] * bb[0]) + jnp.sum(a[1] * bb[1])

        x = (jnp.zeros_like(b[0]), jnp.zeros_like(b[1]))
        r = b
        z = precond(r)
        p = z
        rz = dot(r, z)

        def body(_, carry):
            x, r, p, rz = carry
            hp = hvp(p)
            alpha = rz / (dot(p, hp) + 1e-20)
            x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
            r = (r[0] - alpha * hp[0], r[1] - alpha * hp[1])
            z = precond(r)
            rz_new = dot(r, z)
            beta = rz_new / (rz + 1e-20)
            p = (z[0] + beta * p[0], z[1] + beta * p[1])
            return x, r, p, rz_new

        x, r, p, rz = jax.lax.fori_loop(0, cg_iters, body, (x, r, p, rz))

        res1 = fn(x)
        cost1 = 0.5 * jax.lax.psum(jnp.sum(res1 ** 2), axis)
        accept = cost1 < cost0

        dR = so3_exp(x[0][:, :3])
        newR = jnp.where(accept, dR @ state.R, state.R)
        newt = jnp.where(accept, state.t + x[0][:, 3:], state.t)
        newX = jnp.where(accept, state.X + x[1], state.X)
        new_lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-8, 1e6)
        new_state = BAState(R=newR, t=newt, X=newX, intr=state.intr)
        return new_state, new_lam, cost0, cost1

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis, None), P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def bundle_adjust_sharded(state: BAState, prob: BAProblem, mesh: Mesh,
                          iterations: int = 15, lam0: float = 1e-3,
                          cg_iters: int = 30,
                          fix_first_cam: bool = True) -> Tuple[BAState, float]:
    """Run distributed LM over observation shards."""
    axis = mesh.axis_names[0]
    prob = pad_problem(prob, mesh.size)
    step = make_sharded_lm_step(mesh, cg_iters=cg_iters,
                                fix_first_cam=fix_first_cam)

    shard = NamedSharding(mesh, P(axis))
    cam_idx = jax.device_put(prob.cam_idx, shard)
    pt_idx = jax.device_put(prob.pt_idx, shard)
    uv = jax.device_put(prob.uv, NamedSharding(mesh, P(axis, None)))
    weight = jax.device_put(prob.weight, shard)

    lam = jnp.asarray(lam0)
    cost = None
    for _ in range(iterations):
        state, lam, c0, c1 = step(state, lam, cam_idx, pt_idx, uv, weight)
        cost = float(jnp.minimum(c0, c1))
    return state, cost
