"""Pallas TPU kernels for the per-keypoint stages (orientation, descriptor).

The jnp formulations of these stages lower to XLA gathers, which run on the
TPU scalar core (~840 ms/image for descriptors). These kernels instead:

  * store the whole pyramid's gradient/rotation maps as one padded
    (L, Hp, Wp) HBM stack (padding PAD on top/left so window DMAs never go
    out of bounds);
  * run a grid over blocks of 8 keypoint slots; each program reads keypoint
    geometry from scalar-prefetch SMEM, DMAs a tile-aligned window into
    VMEM (origin rounded down to the (8, 128) tile grid - Mosaic requires
    aligned DMA offsets and shapes), and computes on the VPU;
  * predicate everything on the slot's validity - invalid (padding) slots
    cost almost nothing, so runtime tracks the *real* feature count even
    though shapes are static.

Membership masks use absolute level coordinates (support / window-radius /
border tests), so the enlarged aligned window contributes exactly the same
pixel set as the reference's per-keypoint scan.

Math is identical to ops/orientation.py / ops/descriptor.py (which remain
the reference implementations the tests compare against - the same role the
GLSL backend played for the reference's CUDA path).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 2.0 * math.pi
BINS_PER_RADIAN = 36.0 / TWO_PI
PI = math.pi


def _lroll(a, shift: int):
    """Circular lane roll (pltpu.roll wants non-negative shifts)."""
    return pltpu.roll(a, shift % a.shape[-1], a.ndim - 1)


def _sub(dtype) -> int:
    """Sublane tile of the canvas dtype: DMA row origins must be
    multiples of it (8 for f32, 16 for bf16's (16, 128) tiles)."""
    return 16 if dtype == jnp.bfloat16 else 8


def _window_dims(wsize: int, sub: int = 8):
    """Aligned scratch dims covering a wsize window at any origin
    aligned to `sub` rows / 128 cols."""
    rows = (wsize + sub - 1) // sub * sub + sub
    cols = (wsize + 127) // 128 * 128 + 128
    return rows, cols


class PackedStack(NamedTuple):
    """Pyramid grad/rot maps packed into (P, Hp, Wp) canvas planes.

    Small levels shelf-pack into shared planes on the (8, 128) tile grid
    instead of each getting an octave-0-sized plane (zero-padding 15
    full-size planes per image cost ~0.5 ms/frame of pure HBM writes).
    Per-level lookup tables (all indexed by the same level id the
    keypoint tables carry) say which plane a level lives in and at which
    tile-aligned offset."""
    grad: jnp.ndarray      # (P[*B], Hp, Wp)
    rot: jnp.ndarray
    plane: jnp.ndarray     # (L[*B],) i32 plane index per level
    row_off: jnp.ndarray   # (L[*B],) i32, multiple of 8
    col_off: jnp.ndarray   # (L[*B],) i32, multiple of 128
    level_h: jnp.ndarray   # (L[*B],) i32
    level_w: jnp.ndarray


class PackingPlan:
    """Host-side canvas geometry shared by the jnp canvas builder and the
    detect kernel's direct canvas writes.

    Level i's DATA pixel (0, 0) lives at plane `plane_of[i]`, row
    `dro[i]`, col `dco[i]` - a (8, 128)-tile-aligned origin so the detect
    kernel can DMA (row-block, 128k)-shaped gradient tiles straight into
    the cell. Window margins around the data may hold zeros, a neighbour
    level's pixels, or write-overshoot junk; per-keypoint kernels mask
    membership in absolute level coordinates, so margin CONTENT never
    matters (only that it is finite).
    """

    def __init__(self, shapes: Sequence[tuple], pad: int,
                 dtype=jnp.float32):
        L = len(shapes)
        # row grid follows the canvas dtype's sublane tile (8 for f32,
        # 16 for bf16) so cell origins are tile-aligned for DMAs
        sub = _sub(dtype)
        pad8 = (pad + sub - 1) // sub * sub
        # left margin must cover the window radius (reads start at
        # dco + kx - r, r <= pad) AND stay a multiple of 128 so the
        # detect kernel's canvas DMA origins are lane-aligned
        pad128 = max(128, (pad + 127) // 128 * 128)
        cells = []
        for (h, w) in shapes:
            # rows: data at pad8 (tile-aligned), detect writes
            # overshoot <= 63 rows (row blocks up to 64), window reads
            # round down < sub and reach ~pad below the data; cols: data
            # at pad128, writes overshoot < 128, reads reach ~pad + 256
            ch = (h + pad8 + pad + 64 + sub - 1) // sub * sub
            cw = (w + pad128 + pad + 256 + 127) // 128 * 128
            cells.append((ch, cw))
        # plane size = the largest cell (in the pipeline that is always
        # cells[0], octave 0; the sharded-band canvases can have a later
        # replicated octave taller than the octave-0 band)
        Hp = max(ch for (ch, _) in cells)
        Wp = max(cw for (_, cw) in cells)

        # shelf packing: full-height cells get their own plane; smaller
        # cells fill shared planes left-to-right, top-to-bottom
        plane_of = [0] * L
        roff = [0] * L
        coff = [0] * L
        plane_shelves = []   # per plane: list of shelves [(y, [levels])]
        cur = None           # (plane_idx, next_y, next_x, shelf_h)
        for i, (ch, cw) in enumerate(cells):
            if ch >= Hp and cw >= Wp:
                plane_shelves.append([(0, [i])])
                plane_of[i] = len(plane_shelves) - 1
                continue
            if cur is not None:
                pi, ny, nx, sh = cur
                if nx + cw > Wp:                      # new shelf
                    ny, nx, sh = ny + sh, 0, 0
                if ny + ch > Hp:                      # plane full
                    cur = None
            if cur is None:
                plane_shelves.append([])
                cur = (len(plane_shelves) - 1, 0, 0, 0)
                pi, ny, nx, sh = cur
                if nx + cw > Wp or ny + ch > Hp:
                    raise ValueError("cell larger than plane")
            if nx == 0:
                plane_shelves[pi].append((ny, []))
            plane_shelves[pi][-1][1].append(i)
            plane_of[i], roff[i], coff[i] = pi, ny, nx
            cur = (pi, ny, nx + cw, max(sh, ch))

        self.shapes = list(shapes)
        self.pad = pad
        self.pad8 = pad8
        self.pad128 = pad128
        self.cells = cells
        self.Hp, self.Wp = Hp, Wp
        self.plane_of = plane_of
        self.plane_shelves = plane_shelves
        self.num_planes = len(plane_shelves)
        self.dro = [roff[i] + pad8 for i in range(L)]
        self.dco = [coff[i] + pad128 for i in range(L)]

    def tables(self, batch: Optional[int] = None):
        """PackedStack lookup tables (plane, row_off, col_off, h, w).

        row_off/col_off follow _aligned_origin's convention: data pixel
        (0, 0) sits at (row_off + pad, col_off + pad)."""
        L = len(self.shapes)
        plane_a = np.asarray(self.plane_of, np.int32)
        roff_a = np.asarray([d - self.pad for d in self.dro], np.int32)
        coff_a = np.asarray([d - self.pad for d in self.dco], np.int32)
        lh = np.asarray([h for (h, _) in self.shapes], np.int32)
        lw = np.asarray([w for (_, w) in self.shapes], np.int32)
        if batch is not None:
            P = self.num_planes
            plane_a = (np.tile(plane_a, batch)
                       + np.repeat(np.arange(batch, dtype=np.int32) * P, L))
            roff_a = np.tile(roff_a, batch)
            coff_a = np.tile(coff_a, batch)
            lh = np.tile(lh, batch)
            lw = np.tile(lw, batch)
        return (jnp.asarray(plane_a), jnp.asarray(roff_a),
                jnp.asarray(coff_a), jnp.asarray(lh), jnp.asarray(lw))


def build_padded_stack(grads: Sequence[jnp.ndarray],
                       rots: Sequence[jnp.ndarray], pad: int,
                       dtype=jnp.float32) -> PackedStack:
    """Pack per-level maps into shared canvas planes -> PackedStack.

    jnp pad/concat canvas builder for the CPU/fallback path (the TPU
    detect kernel writes the canvas directly, detect_octave_pallas).

    Per-level maps may carry a leading batch dim (B, h, w); planes are
    then (B * P, Hp, Wp) and every lookup table is (B * L,), so one
    per-keypoint kernel launch serves a whole batch (the caller offsets
    level_id by b * L).
    """
    L = len(grads)
    batched = grads[0].ndim == 3
    plan = PackingPlan([(g.shape[-2], g.shape[-1]) for g in grads], pad,
                       dtype=dtype)
    cells = plan.cells
    Hp, Wp = plan.Hp, plan.Wp
    plane_shelves = plan.plane_shelves
    pad_r = plan.pad8
    pad_c = plan.pad128
    P = plan.num_planes

    def build(levels):
        planes = []
        for shelves in plane_shelves:
            rows = []
            used_h = 0
            for (y, idxs) in shelves:
                sh = max(cells[i][0] for i in idxs)
                row_cells = []
                used_w = 0
                for i in idxs:
                    a = levels[i].astype(dtype)
                    h, w = a.shape[-2], a.shape[-1]
                    ch, cw = cells[i]
                    spec = ((0, 0),) * (a.ndim - 2) + (
                        (pad_r, sh - h - pad_r), (pad_c, cw - w - pad_c))
                    row_cells.append(jnp.pad(a, spec))
                    used_w += cw
                row = row_cells[0] if len(row_cells) == 1 else \
                    jnp.concatenate(row_cells, axis=-1)
                if used_w < Wp:
                    spec = ((0, 0),) * (row.ndim - 2) + ((0, 0),
                                                         (0, Wp - used_w))
                    row = jnp.pad(row, spec)
                rows.append(row)
                used_h += sh
            plane = rows[0] if len(rows) == 1 else \
                jnp.concatenate(rows, axis=-2)
            if used_h < Hp:
                spec = ((0, 0),) * (plane.ndim - 2) + ((0, Hp - used_h),
                                                       (0, 0))
                plane = jnp.pad(plane, spec)
            planes.append(plane)
        return jnp.stack(planes, axis=-3)

    gs = build(grads)
    rs = build(rots)
    B = grads[0].shape[0] if batched else None
    if batched:
        gs = gs.reshape(-1, Hp, Wp)
        rs = rs.reshape(-1, Hp, Wp)
    return PackedStack(gs, rs, *plan.tables(B))


def _aligned_origin(ky, kx, r, pad, roff=0, coff=0, sub=8):
    """Tile-aligned DMA origin for a window of radius r around (ky, kx).

    roff/coff: the level's cell origin inside its canvas plane (multiples
    of (8, 128), see PackedStack). Returns (row_start, col_start) into the
    plane and the absolute level coordinates (y0f, x0f) of the scratch's
    [0, 0] element.
    """
    y0 = jnp.floor(ky).astype(jnp.int32) - r
    x0 = jnp.floor(kx).astype(jnp.int32) - r
    srow = y0 + pad + roff
    scol = x0 + pad + coff
    srow_a = pl.multiple_of(srow - jnp.remainder(srow, sub), sub)
    scol_a = pl.multiple_of(scol - jnp.remainder(scol, 128), 128)
    y0f = (srow_a - pad - roff).astype(jnp.float32)
    x0f = (scol_a - pad - coff).astype(jnp.float32)
    return srow_a, scol_a, y0f, x0f


def _compute_dims(wsize: int, sub: int = 8):
    """Post-DMA compute dims: the DMA scratch must be (8, 128)-aligned at
    any origin (_window_dims), but once the window is in VMEM a dynamic
    roll can move the support to the corner and the math can run on the
    minimal aligned extent - (96, 128) instead of (104, 256) for a 91-px
    window, ~2.9x fewer VPU ops in the per-keypoint stages."""
    rows, cols = _window_dims(wsize, sub)
    crows = (wsize + sub - 1) // sub * sub
    ccols = 128 if wsize <= 128 else cols
    return (crows, ccols) if (crows, ccols) != (rows, cols) else None


def _corner_window(win, r0, c0, cdims):
    """Roll the support to the scratch's corner and slice to cdims.

    r0 in [0, sub) / c0 in [0, 128) are the deltas the DMA origin was
    rounded down by; the returned (crows, ccols) view's [0, 0] is the
    window's true (unaligned) origin, so the caller must offset y0f/x0f
    by r0/c0.
    """
    rows, cols = win.shape
    w = pltpu.roll(win, jnp.remainder(rows - r0, rows), 0)
    w = pltpu.roll(w, jnp.remainder(cols - c0, cols), 1)
    crows, ccols = cdims
    return w[:crows, :ccols]


# ---------------------------------------------------------------------------
# descriptor kernel
# ---------------------------------------------------------------------------

def _descriptor_compute(kx, ky, spt, theta, y0f, x0f, h, w, gwin, rwin,
                        mxu: bool = False):
    """VPU math for one keypoint's 128-d raw descriptor -> (1, 128).

    gwin/rwin: (rows, cols) VMEM windows whose [i, j] is the level image at
    absolute coordinates (y0f + i, x0f + j); membership masks are exact in
    absolute coordinates so extra gathered pixels contribute nothing.
    """
    rows, cols = gwin.shape
    # canvas margins may hold NaN/Inf garbage (detect kernel creates the
    # canvas without zero-fill); masked-out pixels must still yield 0 in
    # the bin-weight products below (0 * NaN = NaN), so sanitize the
    # rotation window. gwin needs none: `weight` masks it with where().
    rwin = jnp.where(jnp.abs(rwin) < 1e30, rwin, 0.0)
    iy = y0f + jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) \
        .astype(jnp.float32)
    ix = x0f + jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) \
        .astype(jnp.float32)
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

    interior = (ix >= 1.0) & (ix <= w - 2.0) & (iy >= 1.0) & (iy <= h - 2.0)
    in_support = (cu > -1.0) & (cu < 4.0) & (cv > -1.0) & (cv < 4.0)
    base_mask = interior & in_support

    theta_pix = (anglef - rwin) * (4.0 / PI)
    theta_pix = jnp.where(theta_pix < 0, theta_pix + 8.0, theta_pix)
    fo = jnp.floor(theta_pix)
    ob = jnp.clip(fo.astype(jnp.int32), 0, 7)
    w2 = theta_pix - fo
    w1 = 1.0 - w2

    weight = jnp.where(base_mask, gauss_w * gwin, 0.0)

    # per-bin weight fields computed once: g[b] = w1*[ob==b] + w2*[ob+1==b]
    # (keeps the inner cell/bin loop to one multiply + one reduction)
    gbin = []
    for b in range(8):
        gbin.append(jnp.where(ob == b, w1, 0.0)
                    + jnp.where(((ob + 1) & 7) == b, w2, 0.0))

    if mxu:
        # the 128 cell/bin sums are a tensor contraction
        # out[cell, bin] = sum_px U[cell, px] * V[bin, px]: one MXU
        # dot_general replaces 128 full-window VPU reductions (the
        # dominant per-keypoint cost). f32 MXU accumulation differs from
        # the VPU sum order by ~1e-6 relative - inside the descriptor's
        # 0.2-clamp/normalize pipeline that is far below the reference's
        # own uint8 quantization step.
        U = []
        for cyi in range(4):
            ay = jnp.maximum(0.0, 1.0 - jnp.abs(cv - cyi))
            way = weight * ay
            for cxi in range(4):
                ax = jnp.maximum(0.0, 1.0 - jnp.abs(cu - cxi))
                U.append(way * ax)
        Um = jnp.stack(U).reshape(16, rows * cols)
        Vm = jnp.stack(gbin).reshape(8, rows * cols)
        if mxu == "bf16":
            # bf16 operands run the MXU single-pass (f32 needs a
            # multi-pass emulation); f32 accumulation keeps the sums.
            # Relative error ~2^-9 per tap - see STATUS bf16 experiment.
            Um = Um.astype(jnp.bfloat16)
            Vm = Vm.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            Um, Vm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (16, 8)

    # accumulate the 128 cell/bin sums into a (1, 128) lane-masked vector -
    # Mosaic cannot reshape a (16, 8) vector into 128 lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    total = jnp.zeros((1, 128), jnp.float32)
    idx = 0
    for cyi in range(4):
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(cv - cyi))
        for cxi in range(4):
            ax = jnp.maximum(0.0, 1.0 - jnp.abs(cu - cxi))
            cw = weight * ay * ax
            for b in range(8):
                ssum = jnp.sum(cw * gbin[b])
                total = total + jnp.where(lane == idx, ssum, 0.0)
                idx += 1
    return total  # (1, 128)


def descriptor_pallas(
    x, y, sigma, theta, valid, level_id,
    stack: PackedStack,
    wsize: int, pad: int,
    window_factor: float = 3.0,
    mxu: bool = False,
    interpret: bool = False,
    flat: bool = True,
) -> jnp.ndarray:
    """Raw (unnormalized) descriptors for the global keypoint table.

    flat=False (mxu mode only) returns the kernel's native (G, 16, 8)
    cell/bin layout - the (G, 128) reshape is a real relayout copy on
    TPU (~0.27 ms per 16k slots), and ops.descriptor.
    finalize_descriptors consumes the 3-D form directly so the copy
    fuses into the normalize fusion instead.

    stack: packed pyramid canvas (build_padded_stack).
    Returns (G, 128) float32 (caller applies half-SIFT fold + normalize).
    Rows whose `valid` flag is 0 are UNSPECIFIED (stale scratch bytes when
    compiled on real hardware) — callers must mask with `valid`, as
    pyramid.py and describe.py do.

    mxu=True computes each keypoint's 16x8 cell/bin table as one MXU
    dot_general instead of 128 VPU window reductions (see
    _descriptor_compute); results differ from the VPU path only by f32
    summation order (~1e-6 relative).
    """
    G0 = x.shape[0]
    BK = 8   # keypoints per group (one window scratch buffer per slot)
    NG = 16  # groups per program; a group whose slots are ALL invalid is
    # skipped with one predicate, so the program-sequencing overhead of
    # the (large) invalid tail of the front-packed table amortizes 16x.
    # Each grid step - even a fully skipped one - still pays sequencing
    # plus its output-block pipeline DMA, so fewer/larger programs win
    # when ~95% of the static table is invalid padding (B*G slots vs
    # a few hundred real features per frame).
    BKP = BK * NG
    padk = (-G0) % BKP
    if padk:
        x = jnp.pad(x, (0, padk))
        y = jnp.pad(y, (0, padk))
        sigma = jnp.pad(sigma, (0, padk), constant_values=1.0)
        theta = jnp.pad(theta, (0, padk))
        valid = jnp.pad(valid, (0, padk))
        level_id = jnp.pad(level_id, (0, padk))
    G = G0 + padk
    sub = _sub(stack.grad.dtype)
    rows, cols = _window_dims(wsize, sub)
    r = (wsize - 1) // 2
    cdims = _compute_dims(wsize, sub)

    # host-side activity masks: the kernel's scalar core paid ~0.1 us per
    # INVALID slot just loading 8 valids and OR-ing them per group (3.7 ms
    # per 32k-slot launch at B=16); precomputing one flag per group and per
    # program makes a skipped program cost two SMEM loads
    vgrp = valid.reshape(-1, BK).any(axis=1)
    grp_any = vgrp.astype(jnp.int32)
    prog_any = vgrp.reshape(-1, NG).any(axis=1).astype(jnp.int32)

    def kernel(prog_anys, grp_anys, xs, ys, sigs, ths, lvls, valids,
               lh, lw, pln, roff, coff,
               grad_hbm, rot_hbm, out_ref, gwin, rwin, obuf, sems):
        kb = pl.program_id(0)

        def copies(i, k):
            lvl = lvls[k]
            srow, scol, _, _ = _aligned_origin(ys[k], xs[k], r, pad,
                                               roff[lvl], coff[lvl], sub)
            pi = pln[lvl]
            return (
                pltpu.make_async_copy(
                    grad_hbm.at[pi, pl.ds(srow, rows), pl.ds(scol, cols)],
                    gwin.at[i], sems.at[i, 0]),
                pltpu.make_async_copy(
                    rot_hbm.at[pi, pl.ds(srow, rows), pl.ds(scol, cols)],
                    rwin.at[i], sems.at[i, 1]),
            )

        # groups run under a fori_loop (traced ONCE - a 4x unrolled body
        # made Mosaic compiles take tens of minutes); slot results stage
        # into obuf and land with one aligned block store per group
        def group(g, carry):
            base = kb * BKP + g * BK
            any_valid = grp_anys[kb * NG + g]

            @pl.when(any_valid != 0)
            def _():
                # launch every slot's window DMAs up front so the 2*BK
                # transfers overlap each other and the compute below
                # (latency was the bottleneck: one start();wait() pair per
                # slot serialized ~4k transfers per image)
                for i in range(BK):
                    k = base + i

                    @pl.when(valids[k] != 0)
                    def _(i=i, k=k):
                        cp_g, cp_r = copies(i, k)
                        cp_g.start()
                        cp_r.start()

                for i in range(BK):
                    k = base + i
                    is_valid = valids[k] != 0

                    @pl.when(is_valid)
                    def _(i=i, k=k):
                        kx = xs[k]
                        ky = ys[k]
                        sig = sigs[k]
                        th = ths[k]
                        lvl = lvls[k]
                        _, _, y0f, x0f = _aligned_origin(
                            ky, kx, r, pad, roff[lvl], coff[lvl], sub)

                        cp_g, cp_r = copies(i, k)
                        cp_g.wait()
                        cp_r.wait()

                        # unpack bf16 canvas windows to f32 BEFORE the
                        # corner roll (Mosaic dynamic_rotate is 32-bit
                        # only); math below is f32 either way
                        gw = gwin[i].astype(jnp.float32)
                        rw = rwin[i].astype(jnp.float32)
                        if cdims is not None:
                            # roll the support to the corner: compute on
                            # (crows, 128) instead of the aligned DMA
                            # extent (~2.9x fewer window ops)
                            r0 = jnp.floor(ky).astype(jnp.int32) - r \
                                - y0f.astype(jnp.int32)
                            c0 = jnp.floor(kx).astype(jnp.int32) - r \
                                - x0f.astype(jnp.int32)
                            gw = _corner_window(gw, r0, c0, cdims)
                            rw = _corner_window(rw, r0, c0, cdims)
                            y0f = y0f + r0.astype(jnp.float32)
                            x0f = x0f + c0.astype(jnp.float32)

                        spt = jnp.abs(sig * window_factor)
                        desc = _descriptor_compute(
                            kx, ky, spt, th, y0f, x0f,
                            lh[lvl].astype(jnp.float32),
                            lw[lvl].astype(jnp.float32),
                            gw, rw, mxu=mxu)
                        if mxu:
                            obuf[i, :, :] = desc
                        else:
                            obuf[i:i + 1, :] = desc

                # invalid slots (and all-invalid groups below) leave stale
                # scratch/output bytes behind on purpose: callers mask with
                # `where(valid, desc, 0)`, and skipping the zero-stores cuts
                # the front-packed table's long invalid tail to almost
                # nothing (it was ~40% of the stage at B=16)
                o0 = pl.multiple_of(g * BK, BK)
                if mxu:
                    out_ref[pl.ds(o0, BK), :, :] = obuf[:, :, :]
                else:
                    out_ref[pl.ds(o0, BK), :] = obuf[:, :]

            return carry

        @pl.when(prog_anys[kb] != 0)
        def _():
            jax.lax.fori_loop(0, NG, group, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=13,
        grid=(G // BKP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # grad stack (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # rot stack
        ],
        out_specs=(pl.BlockSpec((BKP, 16, 8), lambda k, *_: (k, 0, 0),
                                memory_space=pltpu.VMEM) if mxu else
                   pl.BlockSpec((BKP, 128), lambda k, *_: (k, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((BK, rows, cols), stack.grad.dtype),
            pltpu.VMEM((BK, rows, cols), stack.grad.dtype),
            (pltpu.VMEM((BK, 16, 8), jnp.float32) if mxu else
             pltpu.VMEM((BK, 128), jnp.float32)),
            pltpu.SemaphoreType.DMA((BK, 2)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, 16, 8) if mxu else (G, 128),
                                       jnp.float32),
        interpret=interpret,
    )(prog_any, grp_any, x, y, sigma, theta, level_id.astype(jnp.int32),
      valid.astype(jnp.int32), stack.level_h, stack.level_w,
      stack.plane, stack.row_off, stack.col_off, stack.grad, stack.rot)
    if mxu:
        if not flat:
            return out[:G0]         # (G0, 16, 8), row-major == tap order
        out = out.reshape(G, 128)   # (cell, bin) row-major == tap order
    return out[:G0]


# ---------------------------------------------------------------------------
# orientation kernel
# ---------------------------------------------------------------------------

def orientation_pallas(
    x, y, sigma, valid, level_id,
    stack: PackedStack,
    wsize: int, pad: int,
    gaussian_factor: float = 1.5,
    window_factor: float = 2.0,
    peak_threshold: float = 0.8,
    half_sift: bool = False,
    single: bool = False,
    max_peaks: int = 4,
    interpret: bool = False,
):
    """Orientation histograms + peaks for the global table.

    max_peaks: the -m <1..4> cap on orientations per keypoint
    (ProgramCU.cu:1424-1489). Returns (thetas (G, 4), valid (G, 4) bool).
    Rows whose input `valid` flag is 0 are UNSPECIFIED in both outputs
    (stale scratch bytes when compiled on real hardware) — callers must
    mask with `valid`.
    """
    G0 = x.shape[0]
    BK = 8   # keypoints per group (one window scratch buffer per slot)
    NG = 16  # groups per program; all-invalid groups skip on one predicate
    # (16 groups/program: see descriptor_pallas - fewer grid steps means
    # less fixed sequencing + output-block DMA for the invalid tail)
    BKP = BK * NG
    padk = (-G0) % BKP
    if padk:
        x = jnp.pad(x, (0, padk))
        y = jnp.pad(y, (0, padk))
        sigma = jnp.pad(sigma, (0, padk), constant_values=1.0)
        valid = jnp.pad(valid, (0, padk))
        level_id = jnp.pad(level_id, (0, padk))
    G = G0 + padk
    sub = _sub(stack.grad.dtype)
    rows, cols = _window_dims(wsize, sub)
    r = (wsize - 1) // 2
    cdims = _compute_dims(wsize, sub)

    def _window_copies(i, k, xs, ys, lvls, pln, roff, coff,
                       grad_hbm, rot_hbm, gwin, rwin, sems):
        lvl = lvls[k]
        srow, scol, _, _ = _aligned_origin(ys[k], xs[k], r, pad,
                                           roff[lvl], coff[lvl], sub)
        pi = pln[lvl]
        return (
            pltpu.make_async_copy(
                grad_hbm.at[pi, pl.ds(srow, rows), pl.ds(scol, cols)],
                gwin.at[i], sems.at[i, 0]),
            pltpu.make_async_copy(
                rot_hbm.at[pi, pl.ds(srow, rows), pl.ds(scol, cols)],
                rwin.at[i], sems.at[i, 1]),
        )

    def _slot_votes(k, i, xs, ys, sigs, lvls, valids, lh, lw,
                    pln, roff, coff,
                    grad_hbm, rot_hbm, vbuf, gwin, rwin, sems):
        """Per-slot: window DMA wait + 36-bin votes -> vbuf[i] as a
        36-periodic lane vector (3.5 copies across the 128 lanes)."""
        is_valid = valids[k] != 0

        @pl.when(is_valid)
        def _():
            kx = xs[k]
            ky = ys[k]
            sig = sigs[k]
            lvl = lvls[k]
            _, _, y0f, x0f = _aligned_origin(ky, kx, r, pad,
                                             roff[lvl], coff[lvl], sub)

            cp_g, cp_r = _window_copies(i, k, xs, ys, lvls, pln, roff, coff,
                                        grad_hbm, rot_hbm, gwin, rwin, sems)
            cp_g.wait()
            cp_r.wait()

            h = lh[lvl].astype(jnp.float32)
            w = lw[lvl].astype(jnp.float32)

            gw = gwin[i].astype(jnp.float32)   # bf16 canvas -> f32 math
            rw = rwin[i].astype(jnp.float32)   # (rolls are 32-bit only)
            if cdims is not None:
                # roll the support to the corner: the histogram runs on
                # (crows, 128) instead of the aligned DMA extent
                r0 = jnp.floor(ky).astype(jnp.int32) - r \
                    - y0f.astype(jnp.int32)
                c0 = jnp.floor(kx).astype(jnp.int32) - r \
                    - x0f.astype(jnp.int32)
                gw = _corner_window(gw, r0, c0, cdims)
                rw = _corner_window(rw, r0, c0, cdims)
                y0f = y0f + r0.astype(jnp.float32)
                x0f = x0f + c0.astype(jnp.float32)

            gsigma = sig * gaussian_factor
            win = jnp.abs(sig) * (gaussian_factor * window_factor)
            dist_threshold = win * win + 0.5
            factor = -0.5 / (gsigma * gsigma)

            iy = y0f + jax.lax.broadcasted_iota(
                jnp.int32, gw.shape, 0).astype(jnp.float32)
            ix = x0f + jax.lax.broadcasted_iota(
                jnp.int32, gw.shape, 1).astype(jnp.float32)
            dxp = ix + 0.5 - kx
            dyp = iy + 0.5 - ky
            sq = dxp * dxp + dyp * dyp

            in_range = (
                (ix >= jnp.maximum(1.0, jnp.floor(kx - win)))
                & (ix <= jnp.minimum(w - 2.0, jnp.floor(kx + win)))
                & (iy >= jnp.maximum(1.0, jnp.floor(ky - win)))
                & (iy <= jnp.minimum(h - 2.0, jnp.floor(ky + win)))
                & (sq < dist_threshold)
            )

            obin = jnp.floor(rw * BINS_PER_RADIAN).astype(jnp.int32)
            obin = jnp.where(obin < 0, obin + 36, obin)
            obin = jnp.clip(obin, 0, 35)
            wt = jnp.where(in_range, gw * jnp.exp(sq * factor), 0.0)

            v = [jnp.sum(jnp.where(obin == b, wt, 0.0)) for b in range(36)]

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            lmod = jnp.remainder(lane, 36)
            # balanced-tree assembly: the 36 lane-selects are independent
            # (disjoint lanes), so the adds pipeline instead of forming a
            # 36-deep serial select chain
            parts = [jnp.where(lmod == b, v[b], 0.0) for b in range(36)]
            while len(parts) > 1:
                parts = [parts[j] + parts[j + 1]
                         if j + 1 < len(parts) else parts[j]
                         for j in range(0, len(parts), 2)]
            vbuf[i:i + 1, :] = parts[0]

    def _group_tail(vbuf, thbuf, ovbuf):
        """Histogram smoothing + peak selection for a WHOLE group at once
        on (BK, 128) vregs - rolls/reductions amortize over the 8 slots
        (a per-slot scalar formulation burned ~2k scalar-core ops per
        keypoint and dominated the stage). Reading the MIDDLE 36-lane
        copy gives correct circular neighbours from the adjacent copies;
        6 smoothing rounds corrupt only 6 lanes from each end. Rows of
        invalid slots hold stale garbage - their outputs are garbage too,
        masked by the caller (documented contract)."""
        hv = vbuf[:, :]                                  # (BK, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BK, 128), 1)
        lmod = jnp.remainder(lane, 36)

        for _ in range(6):
            # same association as the reference: (pre + cur) + nxt
            hv = ((_lroll(hv, 1) + hv) + _lroll(hv, -1)) / 3.0

        if half_sift:
            hv = jnp.where(lmod < 18, hv + _lroll(hv, -18), 0.0)

        mid = (lane >= 36) & (lane < 72)
        neg1 = jnp.float32(-1.0)
        vmax = jnp.max(jnp.where(mid, hv, neg1), axis=1, keepdims=True)

        lane4 = jax.lax.broadcasted_iota(jnp.int32, (BK, 4), 1)
        if single:
            # first max = lowest bin on ties (the reference's scan keeps
            # the first strict maximum) + parabolic refinement
            imax = jnp.min(jnp.where(mid & (hv == vmax), lmod, 36),
                           axis=1, keepdims=True)
            pre = jnp.sum(jnp.where(lane == 35 + imax, hv, 0.0),
                          axis=1, keepdims=True)
            nxt = jnp.sum(jnp.where(lane == 37 + imax, hv, 0.0),
                          axis=1, keepdims=True)
            best = vmax
            off = 0.5 * (nxt - pre) / (best + best - nxt - pre)
            theta = (imax.astype(jnp.float32) + 0.5 + off) \
                / BINS_PER_RADIAN                        # (BK, 1)
            thbuf[:, :] = jnp.where(lane4 == 0, theta, 0.0)
            ovbuf[:, :] = jnp.where(lane4 == 0, 1, 0)
        else:
            thr = peak_threshold * vmax
            is_pk = (hv > thr) & (hv > _lroll(hv, 1)) & (hv > _lroll(hv, -1))
            peak_v = jnp.where(mid & is_pk, hv, neg1)
            th_rows = jnp.zeros((BK, 4), jnp.float32)
            ov_rows = jnp.zeros((BK, 4), jnp.int32)
            # select top-max_peaks peaks by vote (ties -> lowest bin, like
            # the reference's stable insertion sort); lanes past the -m
            # cap stay zero
            taken = jnp.zeros((BK, 128), jnp.int32)
            for slot in range(min(4, max_peaks)):
                cand = jnp.where(taken != 0, neg1, peak_v)
                best = jnp.max(cand, axis=1, keepdims=True)
                bi = jnp.min(jnp.where(cand == best, lmod, 36),
                             axis=1, keepdims=True)
                ok = best > 0.0
                taken = taken | (lmod == bi).astype(jnp.int32)
                pre = jnp.sum(jnp.where(lane == 35 + bi, hv, 0.0),
                              axis=1, keepdims=True)
                nxt = jnp.sum(jnp.where(lane == 37 + bi, hv, 0.0),
                              axis=1, keepdims=True)
                vi = jnp.sum(jnp.where(lane == 36 + bi, hv, 0.0),
                             axis=1, keepdims=True)
                vi = jnp.where(ok, vi, 1.0)
                di = 0.5 * (nxt - pre) / (vi + vi - nxt - pre)
                rotb = bi.astype(jnp.float32) + di + 0.5
                frac = rotb / 36.0
                frac = jnp.where(frac < 0, frac + 1.0, frac)
                q = jnp.floor(frac * 255.0)
                th_rows = th_rows + jnp.where(
                    lane4 == slot,
                    jnp.where(ok, q * (TWO_PI / 255.0), 0.0), 0.0)
                ov_rows = ov_rows + jnp.where(
                    lane4 == slot, jnp.where(ok, 1, 0), 0)
            thbuf[:, :] = th_rows
            ovbuf[:, :] = ov_rows

        # invalid slots leave stale buffer bytes on purpose: the caller
        # masks ovalid with `& valid[:, None]` and consumers mask thetas

    # host-side activity masks (see descriptor_pallas): one SMEM load per
    # skipped group/program instead of 8 valid loads + ORs on the scalar core
    vgrp = valid.reshape(-1, BK).any(axis=1)
    grp_any = vgrp.astype(jnp.int32)
    prog_any = vgrp.reshape(-1, NG).any(axis=1).astype(jnp.int32)

    def kernel(prog_anys, grp_anys, xs, ys, sigs, lvls, valids,
               lh, lw, pln, roff, coff,
               grad_hbm, rot_hbm, th_ref, ov_ref, gwin, rwin,
               vbuf, thbuf, ovbuf, sems):
        kb = pl.program_id(0)

        # groups run under a fori_loop (traced ONCE - a 4x unrolled body
        # made Mosaic compiles take tens of minutes); slot results stage
        # into th/ov buffers and land with one aligned block store each
        def group(g, carry):
            base = kb * BKP + g * BK
            any_valid = grp_anys[kb * NG + g]

            @pl.when(any_valid != 0)
            def _():
                # prefetch every slot's windows before any compute
                # (overlaps the 2*BK DMAs with each other and the math)
                for i in range(BK):
                    k = base + i

                    @pl.when(valids[k] != 0)
                    def _(i=i, k=k):
                        cp_g, cp_r = _window_copies(
                            i, k, xs, ys, lvls, pln, roff, coff,
                            grad_hbm, rot_hbm, gwin, rwin, sems)
                        cp_g.start()
                        cp_r.start()

                for i in range(BK):
                    _slot_votes(base + i, i, xs, ys, sigs,
                                lvls, valids, lh, lw, pln, roff, coff,
                                grad_hbm, rot_hbm, vbuf, gwin, rwin, sems)

                # smoothing + peak selection for the whole group at once
                _group_tail(vbuf, thbuf, ovbuf)

                # all-invalid groups skip even the stores: outputs keep
                # stale bytes, masked by the caller's `& valid[:, None]`
                o0 = pl.multiple_of(g * BK, BK)
                th_ref[pl.ds(o0, BK), :] = thbuf[:, :]
                ov_ref[pl.ds(o0, BK), :] = ovbuf[:, :]

            return carry

        @pl.when(prog_anys[kb] != 0)
        def _():
            jax.lax.fori_loop(0, NG, group, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=12,
        grid=(G // BKP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((BKP, 4), lambda k, *_: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BKP, 4), lambda k, *_: (k, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((BK, rows, cols), stack.grad.dtype),
            pltpu.VMEM((BK, rows, cols), stack.grad.dtype),
            pltpu.VMEM((BK, 128), jnp.float32),
            pltpu.VMEM((BK, 4), jnp.float32),
            pltpu.VMEM((BK, 4), jnp.int32),
            pltpu.SemaphoreType.DMA((BK, 2)),
        ],
    )

    thetas, ovalid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((G, 4), jnp.float32),
                   jax.ShapeDtypeStruct((G, 4), jnp.int32)),
        interpret=interpret,
    )(prog_any, grp_any, x, y, sigma, level_id.astype(jnp.int32),
      valid.astype(jnp.int32),
      stack.level_h, stack.level_w, stack.plane, stack.row_off,
      stack.col_off, stack.grad, stack.rot)
    thetas = thetas[:G0]
    ovalid = ovalid[:G0]
    return thetas, ovalid.astype(jnp.bool_) & valid[:G0, None]
