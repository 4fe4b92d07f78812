"""Pallas TPU kernels for the per-keypoint stages (orientation, descriptor).

The jnp formulations of these stages lower to XLA gathers, which run on the
TPU scalar core (~840 ms/image for descriptors). These kernels instead:

  * store the whole pyramid's gradient/rotation maps as one padded
    (L, Hp, Wp) HBM stack (padding PAD on top/left so window DMAs never go
    out of bounds);
  * run a 1-D grid over keypoint slots; each program reads its keypoint's
    geometry from scalar-prefetch SMEM, DMAs the (wsize, wsize) window into
    VMEM, and computes on the VPU;
  * predicate everything on the slot's validity - invalid (padding) slots
    cost almost nothing, so runtime tracks the *real* feature count even
    though shapes are static.

Math is identical to ops/orientation.py / ops/descriptor.py (which remain
the reference implementations the tests compare against - the same role the
GLSL backend played for the reference's CUDA path).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 2.0 * math.pi
BINS_PER_RADIAN = 36.0 / TWO_PI
PI = math.pi


def build_padded_stack(grads: Sequence[jnp.ndarray],
                       rots: Sequence[jnp.ndarray], pad: int):
    """Stack per-level maps into (L, Hp, Wp) with `pad` zeros on every side.

    All levels are placed at offset (pad, pad); smaller levels just leave
    the tail unused. Returns (grad_stack, rot_stack, level_h, level_w).
    """
    H = max(g.shape[0] for g in grads)
    W = max(g.shape[1] for g in grads)
    Hp = H + 2 * pad + 8
    Wp = (W + 2 * pad + 127) // 128 * 128  # lane-align the row stride
    L = len(grads)

    gs = jnp.zeros((L, Hp, Wp), jnp.float32)
    rs = jnp.zeros((L, Hp, Wp), jnp.float32)
    for i, (g, r) in enumerate(zip(grads, rots)):
        gs = jax.lax.dynamic_update_slice(gs, g[None], (i, pad, pad))
        rs = jax.lax.dynamic_update_slice(rs, r[None], (i, pad, pad))
    level_h = jnp.asarray([g.shape[0] for g in grads], jnp.int32)
    level_w = jnp.asarray([g.shape[1] for g in grads], jnp.int32)
    return gs, rs, level_h, level_w


# ---------------------------------------------------------------------------
# descriptor kernel
# ---------------------------------------------------------------------------

def _descriptor_compute(kx, ky, spt, theta, y0f, x0f, h, w,
                        gwin, rwin, wsize, cols):
    """VPU math for one keypoint's 128-d raw descriptor.

    gwin/rwin: (rows, cols) VMEM windows whose [i, j] is image[y0+i, x0+j].
    Returns (16, 8) cell histogram.
    """
    rows = gwin.shape[0]
    iy = y0f + jax.lax.broadcasted_iota(jnp.float32, (rows, cols), 0)
    ix = x0f + jax.lax.broadcasted_iota(jnp.float32, (rows, cols), 1)
    px = ix + 0.5
    py = iy + 0.5
    dx = px - kx
    dy = py - ky

    c = jnp.cos(theta)
    s = jnp.sin(theta)
    crspt = c / spt
    srspt = s / spt
    u = crspt * dx + srspt * dy
    v = crspt * dy - srspt * dx
    anglef = jnp.where(theta > PI, theta - TWO_PI, theta)
    gauss_w = jnp.exp(-0.125 * (u * u + v * v))

    cu = u + 1.5
    cv = v + 1.5

    in_win = (jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) < wsize) \
        & (jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) < wsize)
    interior = (ix >= 1.0) & (ix <= w - 2.0) & (iy >= 1.0) & (iy <= h - 2.0)
    in_support = (cu > -1.0) & (cu < 4.0) & (cv > -1.0) & (cv < 4.0)
    base_mask = in_win & interior & in_support

    # scratch beyond the DMA'd window holds garbage (possibly NaN): zero it
    # through the mask so downstream arithmetic stays NaN-free
    gwin = jnp.where(in_win, gwin, 0.0)
    rwin = jnp.where(in_win, rwin, 0.0)

    theta_pix = (anglef - rwin) * (4.0 / PI)
    theta_pix = jnp.where(theta_pix < 0, theta_pix + 8.0, theta_pix)
    fo = jnp.floor(theta_pix)
    ob = jnp.clip(fo.astype(jnp.int32), 0, 7)
    w2 = theta_pix - fo
    w1 = 1.0 - w2

    weight = jnp.where(base_mask, gauss_w * gwin, 0.0)

    out = []
    for cyi in range(4):
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(cv - cyi))
        for cxi in range(4):
            ax = jnp.maximum(0.0, 1.0 - jnp.abs(cu - cxi))
            cw = weight * ay * ax
            row = []
            for b in range(8):
                contrib = jnp.where(ob == b, cw * w1, 0.0) + \
                    jnp.where(((ob + 1) & 7) == b, cw * w2, 0.0)
                row.append(jnp.sum(contrib))
            out.append(jnp.stack(row))
    return jnp.stack(out)  # (16, 8)


def descriptor_pallas(
    x, y, sigma, theta, valid, level_id,
    grad_stack, rot_stack, level_h, level_w,
    wsize: int, pad: int,
    window_factor: float = 3.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw (unnormalized) descriptors for the global keypoint table.

    grad_stack/rot_stack: (L, Hp, Wp) padded pyramid (build_padded_stack).
    Returns (G, 128) float32 (caller applies half-SIFT fold + normalize).
    """
    G = x.shape[0]
    rows = (wsize + 7) // 8 * 8
    cols = (wsize + 127) // 128 * 128

    def kernel(xs, ys, sigs, ths, lvls, valids, lh, lw,
               grad_hbm, rot_hbm, out_ref, gwin, rwin, sems):
        k = pl.program_id(0)
        is_valid = valids[k] != 0

        @pl.when(is_valid)
        def _():
            kx = xs[k]
            ky = ys[k]
            sig = sigs[k]
            th = ths[k]
            lvl = lvls[k]
            r = (wsize - 1) // 2
            y0 = jnp.floor(ky).astype(jnp.int32) - r
            x0 = jnp.floor(kx).astype(jnp.int32) - r

            cp_g = pltpu.make_async_copy(
                grad_hbm.at[lvl, pl.ds(y0 + pad, wsize),
                            pl.ds(x0 + pad, wsize)],
                gwin.at[:wsize, :wsize], sems.at[0])
            cp_r = pltpu.make_async_copy(
                rot_hbm.at[lvl, pl.ds(y0 + pad, wsize),
                           pl.ds(x0 + pad, wsize)],
                rwin.at[:wsize, :wsize], sems.at[1])
            cp_g.start()
            cp_r.start()
            cp_g.wait()
            cp_r.wait()

            spt = jnp.abs(sig * window_factor)
            desc = _descriptor_compute(
                kx, ky, spt, th,
                y0.astype(jnp.float32), x0.astype(jnp.float32),
                lh[lvl].astype(jnp.float32), lw[lvl].astype(jnp.float32),
                gwin[:, :], rwin[:, :], wsize, cols)
            out_ref[0, :] = desc.reshape(-1)

        @pl.when(jnp.logical_not(is_valid))
        def _():
            out_ref[0, :] = jnp.zeros((128,), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # grad stack (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # rot stack
        ],
        out_specs=pl.BlockSpec((1, 128), lambda k, *_: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, cols), jnp.float32),
            pltpu.VMEM((rows, cols), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, 128), jnp.float32),
        interpret=interpret,
    )(x, y, sigma, theta, level_id.astype(jnp.int32),
      valid.astype(jnp.int32), level_h, level_w, grad_stack, rot_stack)


# ---------------------------------------------------------------------------
# orientation kernel
# ---------------------------------------------------------------------------

def orientation_pallas(
    x, y, sigma, valid, level_id,
    grad_stack, rot_stack, level_h, level_w,
    wsize: int, pad: int,
    gaussian_factor: float = 1.5,
    window_factor: float = 2.0,
    peak_threshold: float = 0.8,
    half_sift: bool = False,
    single: bool = False,
    interpret: bool = False,
):
    """Orientation histograms + peaks for the global table.

    Returns (thetas (G, 4), valid (G, 4) as int32).
    """
    G = x.shape[0]
    rows = (wsize + 7) // 8 * 8
    cols = (wsize + 127) // 128 * 128

    def kernel(xs, ys, sigs, lvls, valids, lh, lw,
               grad_hbm, rot_hbm, th_ref, ov_ref, gwin, rwin, sems):
        k = pl.program_id(0)
        is_valid = valids[k] != 0

        @pl.when(is_valid)
        def _():
            kx = xs[k]
            ky = ys[k]
            sig = sigs[k]
            lvl = lvls[k]
            r = (wsize - 1) // 2
            y0 = jnp.floor(ky).astype(jnp.int32) - r
            x0 = jnp.floor(kx).astype(jnp.int32) - r

            cp_g = pltpu.make_async_copy(
                grad_hbm.at[lvl, pl.ds(y0 + pad, wsize),
                            pl.ds(x0 + pad, wsize)],
                gwin.at[:wsize, :wsize], sems.at[0])
            cp_r = pltpu.make_async_copy(
                rot_hbm.at[lvl, pl.ds(y0 + pad, wsize),
                           pl.ds(x0 + pad, wsize)],
                rwin.at[:wsize, :wsize], sems.at[1])
            cp_g.start()
            cp_r.start()
            cp_g.wait()
            cp_r.wait()

            h = lh[lvl].astype(jnp.float32)
            w = lw[lvl].astype(jnp.float32)

            gw = gwin[:, :]
            rw = rwin[:, :]

            gsigma = sig * gaussian_factor
            win = jnp.abs(sig) * (gaussian_factor * window_factor)
            dist_threshold = win * win + 0.5
            factor = -0.5 / (gsigma * gsigma)

            iy = y0.astype(jnp.float32) + jax.lax.broadcasted_iota(
                jnp.float32, (rows, cols), 0)
            ix = x0.astype(jnp.float32) + jax.lax.broadcasted_iota(
                jnp.float32, (rows, cols), 1)
            dxp = ix + 0.5 - kx
            dyp = iy + 0.5 - ky
            sq = dxp * dxp + dyp * dyp

            in_win = (jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
                      < wsize) & \
                     (jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
                      < wsize)
            in_range = in_win \
                & (ix >= jnp.maximum(1.0, jnp.floor(kx - win))) \
                & (ix <= jnp.minimum(w - 2.0, jnp.floor(kx + win))) \
                & (iy >= jnp.maximum(1.0, jnp.floor(ky - win))) \
                & (iy <= jnp.minimum(h - 2.0, jnp.floor(ky + win))) \
                & (sq < dist_threshold)

            rw = jnp.where(in_win, rw, 0.0)  # NaN-safety for scratch tail
            obin = jnp.floor(rw * BINS_PER_RADIAN).astype(jnp.int32)
            obin = jnp.where(obin < 0, obin + 36, obin)
            obin = jnp.clip(obin, 0, 35)
            wt = jnp.where(in_range, gw * jnp.exp(sq * factor), 0.0)

            votes = []
            for b in range(36):
                votes.append(jnp.sum(jnp.where(obin == b, wt, 0.0)))
            v = jnp.stack(votes).reshape(1, 36)

            # 6x circular [1/3 1/3 1/3] smoothing
            for _ in range(6):
                vl = jnp.concatenate([v[:, -1:], v[:, :-1]], axis=1)
                vr = jnp.concatenate([v[:, 1:], v[:, :1]], axis=1)
                v = (vl + v + vr) / 3.0

            if half_sift:
                folded = v[:, :18] + v[:, 18:]
                v = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=1)

            vl = jnp.concatenate([v[:, -1:], v[:, :-1]], axis=1)
            vr = jnp.concatenate([v[:, 1:], v[:, :1]], axis=1)
            vmax = jnp.max(v)

            if single:
                # first-max argmax + parabolic refinement
                imax = jnp.argmax(v[0])
                pre = vl[0, imax]
                nxt = vr[0, imax]
                off = 0.5 * (nxt - pre) / (vmax + vmax - nxt - pre)
                theta = (imax.astype(jnp.float32) + 0.5 + off) \
                    / BINS_PER_RADIAN
                th_ref[0, 0] = theta
                th_ref[0, 1] = 0.0
                th_ref[0, 2] = 0.0
                th_ref[0, 3] = 0.0
                ov_ref[0, 0] = 1
                ov_ref[0, 1] = 0
                ov_ref[0, 2] = 0
                ov_ref[0, 3] = 0
            else:
                is_peak = (v > peak_threshold * vmax) & (v > vl) & (v > vr)
                score = jnp.where(is_peak, v, -jnp.inf)[0]
                top_v, top_i = jax.lax.top_k(score, 4)
                for j in range(4):
                    ok = jnp.isfinite(top_v[j])
                    ii = top_i[j]
                    pre = vl[0, ii]
                    nxt = vr[0, ii]
                    vi = v[0, ii]
                    di = 0.5 * (nxt - pre) / (vi + vi - nxt - pre)
                    rotb = ii.astype(jnp.float32) + di + 0.5
                    frac = rotb / 36.0
                    frac = jnp.where(frac < 0, frac + 1.0, frac)
                    q = jnp.floor(frac * 255.0)
                    th_ref[0, j] = jnp.where(ok, q * (TWO_PI / 255.0), 0.0)
                    ov_ref[0, j] = jnp.where(ok, 1, 0)

        @pl.when(jnp.logical_not(is_valid))
        def _():
            th_ref[0, :] = jnp.zeros((4,), jnp.float32)
            ov_ref[0, :] = jnp.zeros((4,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, 4), lambda k, *_: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda k, *_: (k, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, cols), jnp.float32),
            pltpu.VMEM((rows, cols), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    thetas, ovalid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((G, 4), jnp.float32),
                   jax.ShapeDtypeStruct((G, 4), jnp.int32)),
        interpret=interpret,
    )(x, y, sigma, level_id.astype(jnp.int32), valid.astype(jnp.int32),
      level_h, level_w, grad_stack, rot_stack)
    return thetas, ovalid.astype(jnp.bool_) & valid[:, None]
