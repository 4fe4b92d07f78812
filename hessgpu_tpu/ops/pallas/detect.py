"""Fused Pallas detection kernel: det-of-Hessian response, gradients,
3x3x3 NMS, edge rejection, subpixel refinement, and blob typing in one
VMEM-resident pass.

The XLA formulation (ops/hessian.py + ops/keypoint.py) materializes ~30
shifted copies of each level in HBM; this kernel DMAs a row-block of the
Gaussian stack once and produces every detection output for the block -
identical math (the same where-masked tests and the same symmetric 3x3
adjugate solve as ops/keypoint.py, which remains the reference
implementation for tests).

Layout: grid over row blocks. Each program copies gauss[(L, BRH, Wp)]
(2-row halo each side, edge-padded outside), computes responses for all L
levels, then for each key level the full keypoint test plus gradient maps.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..keypoint import TYPE_BRIGHT_BLOB, TYPE_DARK_BLOB, TYPE_NONE, TYPE_SADDLE

_BR = 64

_PI = math.pi
_TAN_PI_8 = 0.4142135623730951


def _atan2(y, x):
    """Branch-free float32 atan2 (Mosaic has no atan2 primitive).

    Cephes-style: z = min/max in [0, 1], one range reduction at tan(pi/8),
    degree-9 odd polynomial; quadrant fixes by selects. ~1e-7 absolute error
    - far below the 10-degree orientation bins downstream.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    z = mn / jnp.where(mx == 0.0, 1.0, mx)

    big = z > _TAN_PI_8
    z2 = jnp.where(big, (z - 1.0) / (z + 1.0), z)
    w = z2 * z2
    p = ((8.05374449538e-2 * w - 1.38776856032e-1) * w
         + 1.99777106478e-1) * w - 3.33329491539e-1
    r = z2 + z2 * w * p
    a = jnp.where(big, r + _PI / 4.0, r)

    a = jnp.where(ay > ax, _PI / 2.0 - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    a = jnp.where(y < 0.0, -a, a)
    return a


def _f16_bits(x):
    """IEEE f32 -> f16 bit pattern (RNE, subnormals, inf saturation) in
    vector integer ops - Mosaic has no f32->f16 convert, and the fp16
    response quantization (ProgramCU.cu:865 parity) must happen inside
    the kernel so the packed payload plane can be written directly.

    Matches jnp.float16 casting bit-for-bit (tests pin this against the
    astype path in interpret mode). NaN inputs are not handled (responses
    are finite by construction)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    sign = jax.lax.shift_right_logical(bits, 16) & 0x8000
    exp = jax.lax.shift_right_logical(bits, 23) & 0xFF
    mant = bits & 0x7FFFFF

    # normal f16: exponent exp-112 in [1, 30], RNE on the low 13 bits
    base = ((exp - 112) << 10) | jax.lax.shift_right_logical(mant, 13)
    rem = mant & 0x1FFF
    up = (rem > 0x1000) | ((rem == 0x1000) & ((base & 1) == 1))
    h_norm = base + up.astype(jnp.int32)
    h_norm = jnp.where(exp >= 143, 0x7C00, h_norm)   # overflow -> inf

    # subnormal f16 (exp <= 112): bits = RNE(M / 2^s), M = implicit-1
    # mantissa, s = 126 - exp (>= 14); s > 24 underflows to 0
    M = mant | 0x800000
    s = jnp.minimum(126 - exp, 30)
    base_s = jax.lax.shift_right_logical(M, s)
    rem_s = M & ((1 << s) - 1)
    half_s = 1 << (s - 1)
    up_s = (rem_s > half_s) | ((rem_s == half_s) & ((base_s & 1) == 1))
    h_sub = base_s + up_s.astype(jnp.int32)

    return jnp.where(exp <= 112, h_sub, h_norm) | sign


def _solve3(a0, a1, a2):
    """Symmetric 3x3 adjugate solve (same as ops/keypoint._solve3_pivoted,
    which documents the Cramer formulation and its degenerate-system
    contract). ~45 vector ops vs ~95 for the pivoted elimination this
    replaced - solve3 was the largest single VPU block of the detect
    kernel's per-level loop."""
    a, b, c, r0 = a0
    d, e, r1 = a1[1], a1[2], a1[3]
    f, r2 = a2[2], a2[3]
    C00 = d * f - e * e
    C01 = c * e - b * f
    C02 = b * e - c * d
    det = a * C00 + b * C01 + c * C02
    ok = jnp.abs(det) >= 1e-30
    rdet = 1.0 / jnp.where(ok, det, 1.0)
    # scale the rhs once instead of each solution: same op count, but
    # det/rdet and each cofactor die as soon as their dot is formed,
    # which keeps the Mosaic vmem stack under the 16 MB scoped limit
    # (the naive ordering of this solve overflowed it by 32 KB at
    # BRD=64, W=640)
    s0 = r0 * rdet
    s1 = r1 * rdet
    s2 = r2 * rdet
    dx = C00 * s0 + C01 * s1 + C02 * s2
    C11 = a * f - c * c
    C12 = b * c - a * e
    dy = C01 * s0 + C11 * s1 + C12 * s2
    C22 = a * d - b * b
    ds = C02 * s0 + C12 * s1 + C22 * s2
    zero = jnp.zeros_like(ds)
    return ok, jnp.where(ok, dx, zero), jnp.where(ok, dy, zero), \
        jnp.where(ok, ds, zero)


def detect_octave_pallas(
    gauss_oct: jnp.ndarray,
    norms: Sequence[float],
    key_levels: Sequence[int],
    threshold: float,
    edge_threshold: float,
    subpixel: bool = True,
    darkness_adaption: bool = False,
    canvas=None,
    compressed: bool = False,
    detector: str = "hessian",
    interpret: bool = False,
    prepadded=None,
):
    """Fused detection for one octave - ONE kernel launch per octave.

    gauss_oct: (L, H, W) or (B, L, H, W) Gaussian stack; a leading batch
    dim rides the grid ((B, row-blocks)) so the compiled program is flat
    in B, and every output gains the same leading dim.

    Each program DMAs the span of Gaussian planes the key levels need
    once (5 planes instead of 3 per level across 3 calls), computes every
    plane's det-of-Hessian response once (shared by the adjacent key
    levels' 3x3x3 tests), and writes all levels' outputs - which also
    hands the compaction stage level-stacked arrays with no extra copies.

    Returns (KeypointMaps with (NK, H, W) leaves - row i = key level
    key_levels[i], grad (NK, H, W), rot (NK, H, W)); gradient maps are
    per KEY level.

    canvas: optional (grad_planes, rot_planes, plane_ids, dros, dcos, P)
    - the kernel then DMAs each level's gradient/rotation blocks STRAIGHT
    into the PackedStack canvas cells (plane b*P + plane_ids[li], rows
    dros[li] + block, cols dcos[li]; all static, tile-aligned - see
    patch.PackingPlan) instead of materializing (NK, H, W) maps that a
    separate pad/concat pass would re-copy. Returns (maps, grad_planes,
    rot_planes) with the canvases threaded through (input/output
    aliased). grad_planes/rot_planes may also be jax.ShapeDtypeStruct:
    the kernel then CREATES the canvases as pure outputs (saves zeroing
    ~50 MB/image of canvas in HBM - broadcast(0) cost ~1.2 ms/batch at
    B=16); cells this call does not write hold uninitialized garbage
    (possibly NaN/Inf bit patterns), which the patch kernels tolerate
    (orientation masks weights before use; descriptor_pallas sanitizes
    the rotation window - see patch._descriptor_compute).

    compressed (requires canvas mode, W <= 16383): instead of six
    (B, NK, H, W) keypoint maps the kernel emits the compaction stage's
    inputs directly - key (u16: col<<2|ftype where valid, else the W<<2
    sentinel) and two packed payload planes p1 = q14(dx)<<16|q14(dy),
    p2 = f16bits(response)<<16|q14(ds) (the exact encoding
    ops.compaction._pack_payload used to build from the maps in XLA,
    reading 24 B/px and writing 10 B/px of fusions per level). Returns
    ((key, p1, p2), grad_planes, rot_planes); feed to
    compact_octave_compressed.

    detector: "hessian" (det-of-Hessian response, sign-consistent NMS,
    saddle/blob typing) or "dog" (the SIFT personality: response[l] =
    gauss[l+1] - gauss[l], plain NMS, bright/dark typing by extremum
    sign - ComputeDOG_Kernel + GPU_SIFT_MODIFIED ComputeKEY,
    ProgramCU.cu:599-653, 852-853). Both personalities share every other
    stage of this kernel, exactly as the reference's pipeline does.

    prepadded=(H, W): gauss_oct is already the edge-padded detect input
    the conv chain emits with detect_pad=True (conv.octave_chain_pallas:
    (B, L, >=rows_needed, Wp) planes whose row t / col c hold the
    clamped level image at (t - 2, c - 2), geometry from
    conv.detect_geometry) - the jnp.pad HBM round-trip between the two
    kernels is skipped and the DMA reads planes p_lo..p_lo+NP in place.
    Kernel-path (H, W >= 192) only.
    """
    from ..keypoint import KeypointMaps

    assert detector in ("hessian", "dog"), detector
    is_hessian = detector == "hessian"
    batched = gauss_oct.ndim == 4
    if not batched:
        gauss_oct = gauss_oct[None]
    if prepadded is not None:
        B, L = gauss_oct.shape[:2]
        H, W = prepadded
    else:
        B, L, H, W = gauss_oct.shape
    norms = [float(n) for n in norms]
    key_levels = [int(k) for k in key_levels]
    NK = len(key_levels)
    thr0 = (0.8 if subpixel else 1.0) * threshold
    te = (edge_threshold + 1.0) ** 2 / edge_threshold

    if compressed:
        assert canvas is not None, "compressed mode requires canvas mode"
        assert (W << 2) < 0xFFFF, "compressed keys need W <= 16383"

    if H < 192 or W < 192:
        assert canvas is None, "canvas mode requires the kernel path"
        assert prepadded is None, "prepadded input needs the kernel path"
        # small octaves: per-call fixed costs beat the fusion win - use the
        # XLA path (identical reference math)
        from .. import hessian as hops
        from ..keypoint import detect_keypoints_level

        def one(g):
            if is_hessian:
                resp, grad, rot = hops.hessian_response_and_gradient(
                    g, norms, grad_levels=key_levels)
            else:
                resp, grad, rot = hops.dog_response_and_gradient(g)
            maps = [detect_keypoints_level(
                resp[kl - 1], resp[kl], resp[kl + 1], g[kl],
                threshold=threshold, edge_threshold=edge_threshold,
                subpixel=subpixel, hessian=is_hessian,
                darkness_adaption=darkness_adaption) for kl in key_levels]
            if not is_hessian:
                # DoG gradients come from gauss[1:]; realign so grad[kl]
                # is the key level's gradient (same as pyramid._detect_octave)
                grad = jnp.concatenate([grad[:1], grad], axis=0)
                rot = jnp.concatenate([rot[:1], rot], axis=0)
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *maps)
            grad_k = jnp.stack([grad[kl] for kl in key_levels])
            rot_k = jnp.stack([rot[kl] for kl in key_levels])
            return stacked, grad_k, rot_k

        if not batched:
            return one(gauss_oct[0])
        return jax.vmap(one)(gauss_oct)

    # row block: 8 outputs x NK levels stream per program and the
    # double-buffered output blocks must fit VMEM. The Mosaic vmem stack
    # holds ~50 live (BRD, W) temporaries for the unrolled key-level
    # loop (observed 26.9 MB at BRD=32, W=2048), so the block size
    # adapts: as large as fits under the 16 MB scoped limit (fewer
    # programs = less fixed DMA-issue/sequencing cost and a smaller
    # halo-recompute fraction), halving for wide octaves. The geometry
    # lives in conv.detect_geometry so the conv chain can emit this
    # kernel's padded input layout directly (prepadded mode).
    from .conv import detect_geometry
    BRD, nblk, BRH, Wp, rows_needed = detect_geometry(H, W)
    Wc = (W + 127) // 128 * 128   # canvas write width (lane-aligned)
    p_lo = key_levels[0] - 1
    # Gaussian planes spanned by all 3x3x3 tests: DoG response kl+1 reads
    # gauss[kl+2], one plane past the Hessian span
    NP = key_levels[-1] + (2 if is_hessian else 3) - p_lo

    if prepadded is not None:
        assert gauss_oct.shape[-1] == Wp, (gauss_oct.shape, Wp)
        assert gauss_oct.shape[-2] >= rows_needed, \
            (gauss_oct.shape, rows_needed)
        gp = gauss_oct
        plane0 = p_lo
    else:
        # edge-pad (2 px left/top; bottom/right up to the aligned extents)
        bot = nblk * BRD + BRH - (H + 2)
        gp = jnp.pad(gauss_oct[:, p_lo:p_lo + NP],
                     ((0, 0), (0, 0), (2, max(bot, 2)), (2, Wp - W - 2)),
                     mode="edge")
        plane0 = 0

    create_canvas = False
    cdt = jnp.float32
    if canvas is not None:
        gradc, rotc, plane_ids, dros, dcos, P = canvas
        cdt = gradc.dtype   # canvas dtype (f32 or bf16 storage)
        create_canvas = not isinstance(gradc, jnp.ndarray)
        plane_ids = [int(v) for v in plane_ids]
        dros = [int(v) for v in dros]
        dcos = [int(v) for v in dcos]

    def kernel(g_hbm, *refs):
        if compressed:
            if not create_canvas:
                refs = refs[2:]
            (key_ref, p1_ref, p2_ref, gc_ref, rc_ref, gbuf, gscr, rscr,
             sem, csem) = refs
        elif canvas is None:
            (valid_ref, resp_ref, dx_ref, dy_ref, ds_ref, type_ref,
             grad_ref, rot_ref, gbuf, sem) = refs
        elif create_canvas:
            (valid_ref, resp_ref, dx_ref, dy_ref, ds_ref,
             type_ref, gc_ref, rc_ref, gbuf, gscr, rscr, sem,
             csem) = refs
        else:
            (_gc_in, _rc_in, valid_ref, resp_ref, dx_ref, dy_ref, ds_ref,
             type_ref, gc_ref, rc_ref, gbuf, gscr, rscr, sem,
             csem) = refs
        b = pl.program_id(0)
        blk = pl.program_id(1)
        row0 = pl.multiple_of(blk * BRD, 8)
        cp = pltpu.make_async_copy(
            g_hbm.at[b, pl.ds(plane0, NP), pl.ds(row0, BRH), pl.ds(0, Wp)],
            gbuf, sem)
        cp.start()
        cp.wait()

        g = gbuf[:, :, :]

        # absolute coordinates of output row j / col c
        rows_idx = row0 + jax.lax.broadcasted_iota(jnp.int32, (BRD, W), 0)
        cols_idx = jax.lax.broadcasted_iota(jnp.int32, (BRD, W), 1)
        interior = (rows_idx > 0) & (rows_idx < H - 1) \
            & (cols_idx > 0) & (cols_idx < W - 1)

        # responses: gauss buffer row t = global row row0 + t - 2. Each
        # plane's response is computed ONCE and shared by the adjacent key
        # levels (the per-level kernel recomputed 9 instead of NP).
        def resp_at(pi):
            # (BRH-2, W+2) response of plane pi: [i, c] = response at
            # global (row0 + i - 1, c - 1)
            gl = g[pi]
            c = gl[1:-1, 1:-1]
            lxx = gl[1:-1, :-2] - 2.0 * c + gl[1:-1, 2:]
            lyy = gl[:-2, 1:-1] - 2.0 * c + gl[2:, 1:-1]
            lxy = (gl[:-2, 2:] - gl[:-2, :-2] + gl[2:, :-2] - gl[2:, 2:]) \
                * 0.25
            return (lxx * lyy - lxy * lxy) * norms[p_lo + pi]

        def dog_at(pi):
            # DoG response index p_lo + pi = gauss[p_lo+pi+1] - gauss[p_lo+pi]
            # (ops/hessian.dog_response_and_gradient convention)
            return g[pi + 1][1:-1, 1:-1] - g[pi][1:-1, 1:-1]

        if is_hessian:
            resps = [resp_at(i) for i in range(NP)]
        else:
            resps = [dog_at(i) for i in range(NP - 1)]

        def crop(a, di, dj):
            # a indexed like resp; value at (output row j + di, col cc + dj)
            return a[1 + di: 1 + di + BRD, 1 + dj: 1 + dj + W]

        # separable 3x3 pooling partials, computed ONCE per plane and
        # shared by the adjacent key levels' 3x3x3 tests (the naive form
        # re-reduced 18 cross-plane neighbours per level: ~74 more
        # (BRD, W) VPU ops per octave program). ctmax[i, j] = column
        # triple max of row i; full3 = 3-row max of ctmax = the plane's
        # whole 3x3 max at each output cell.
        ctmax, ctmin, full3max, full3min = {}, {}, {}, {}
        for pi in set(kl + d - p_lo for kl in key_levels for d in (-1, 0, 1)):
            a = resps[pi]    # lane-padded width; cols [0, W+2) are real
            ct_max = jnp.maximum(jnp.maximum(a[:, :W], a[:, 1:W + 1]),
                                 a[:, 2:W + 2])     # (BRH-2, W)
            ct_min = jnp.minimum(jnp.minimum(a[:, :W], a[:, 1:W + 1]),
                                 a[:, 2:W + 2])
            ctmax[pi] = ct_max
            ctmin[pi] = ct_min
            full3max[pi] = jnp.maximum(
                jnp.maximum(ct_max[:-2, :], ct_max[1:-1, :]), ct_max[2:, :])
            full3min[pi] = jnp.minimum(
                jnp.minimum(ct_min[:-2, :], ct_min[1:-1, :]), ct_min[2:, :])

        for li, kl in enumerate(key_levels):
            prv = resps[kl - 1 - p_lo]
            cur = resps[kl - p_lo]
            nxt = resps[kl + 1 - p_lo]
            pc = kl - p_lo

            v = crop(cur, 0, 0)
            left = crop(cur, 0, -1)
            right = crop(cur, 0, 1)
            up = crop(cur, -1, 0)
            down = crop(cur, 1, 0)
            tl = crop(cur, -1, -1)
            tr = crop(cur, -1, 1)
            bl = crop(cur, 1, -1)
            br = crop(cur, 1, 1)

            # in-plane rest = the 6 cells above/below the center row
            # = the column-triple pools of the rows directly above/below
            topbot_max = jnp.maximum(ctmax[pc][:-2, :][:BRD],
                                     ctmax[pc][2:, :][:BRD])
            topbot_min = jnp.minimum(ctmin[pc][:-2, :][:BRD],
                                     ctmin[pc][2:, :][:BRD])
            rest_max = jnp.maximum(topbot_max,
                                   jnp.maximum(full3max[pc - 1][:BRD],
                                               full3max[pc + 1][:BRD]))
            rest_min = jnp.minimum(topbot_min,
                                   jnp.minimum(full3min[pc - 1][:BRD],
                                               full3min[pc + 1][:BRD]))

            lr_max = jnp.maximum(left, right)
            lr_min = jnp.minimum(left, right)
            is_max = (v > lr_max) & (v >= rest_max)
            is_min = (v < lr_min) & (v <= rest_min)
            if is_hessian:
                # Hessian extrema must be sign-consistent
                # (ProgramCU.cu:663-677)
                is_max &= v >= 0
                is_min &= v <= 0

            gl = g[kl - p_lo]  # the key level's Gaussian plane
            if darkness_adaption:
                gc = gl[2:2 + BRD, 2:2 + W]
                thr_map = threshold * jnp.minimum(2.0 * gc + 0.1, 1.0)
            else:
                thr_map = threshold
            extremum = (jnp.abs(v) > 0.8 * thr_map if subpixel
                        else jnp.abs(v) > thr_map) & (is_max | is_min)

            fx = 0.5 * (right - left)
            fy = 0.5 * (down - up)
            vx2 = 2.0 * v
            fxx = left + right - vx2
            fyy = up + down - vx2
            fxy = 0.25 * (br + tl - bl - tr)
            det2 = fxx * fyy - fxy * fxy
            tr2 = (fxx + fyy) ** 2
            extremum &= (det2 > 0) & (tr2 <= te * det2)

            if subpixel:
                cn = crop(nxt, 0, 0)
                cp_ = crop(prv, 0, 0)
                fs = 0.5 * (cn - cp_)
                fss = cn + cp_ - vx2
                fxs = 0.25 * (crop(nxt, 0, 1) + crop(prv, 0, -1)
                              - crop(nxt, 0, -1) - crop(prv, 0, 1))
                fys = 0.25 * (crop(nxt, 1, 0) + crop(prv, -1, 0)
                              - crop(nxt, -1, 0) - crop(prv, 1, 0))
                ok, dx, dy, dssub = _solve3(
                    (fxx, fxy, fxs, -fx), (fxy, fyy, fys, -fy),
                    (fxs, fys, fss, -fs))
                refined = v + 0.5 * (dx * fx + dy * fy + dssub * fs)
                response = jnp.where(ok, refined, v)
                # boolean algebra instead of where(ok, ..., True): literal
                # bool branches make i8 selects Mosaic can't mask-truncate
                passed = (jnp.abs(response) > thr_map) \
                    & (jnp.abs(dssub) < 1.0) & (jnp.abs(dx) < 1.0) \
                    & (jnp.abs(dy) < 1.0)
                offset_ok = jnp.logical_not(ok) | passed
                extremum &= offset_ok
            else:
                dx = jnp.zeros_like(v)
                dy = jnp.zeros_like(v)
                dssub = jnp.zeros_like(v)
                response = v

            valid = extremum & interior

            if is_hessian:
                gc = gl[2:2 + BRD, 2:2 + W]
                gleft = gl[2:2 + BRD, 1:1 + W]
                gright = gl[2:2 + BRD, 3:3 + W]
                g_lxx = gleft - 2.0 * gc + gright
                # int32 constants: weak-typed literals make i8 selects,
                # which Mosaic cannot truncate masks for
                blob = jnp.where(g_lxx > 0, jnp.int32(TYPE_DARK_BLOB),
                                 jnp.int32(TYPE_BRIGHT_BLOB))
                ftype = jnp.where(response < 0, jnp.int32(TYPE_SADDLE),
                                  blob)
            else:
                # DoG personality: maxima bright, minima dark
                # (GPU_SIFT_MODIFIED branch, ProgramCU.cu:852-853)
                ftype = jnp.where(is_max, jnp.int32(TYPE_BRIGHT_BLOB),
                                  jnp.int32(TYPE_DARK_BLOB))
            ftype = jnp.where(valid, ftype, jnp.int32(TYPE_NONE))

            if compressed:
                # compaction inputs, written directly: u16 sort key plus
                # the two packed payload planes (s16 fixed-point offsets,
                # in-kernel f16 response quantization - same encoding as
                # ops.compaction._pack_payload, which tests pin)
                keyv = jnp.where(valid, (cols_idx << 2) | ftype,
                                 jnp.int32(W << 2))
                key_ref[0, li, :, :] = keyv.astype(jnp.uint16)
                q14 = lambda a: jnp.round(a * 16384.0).astype(jnp.int32)
                p1_ref[0, li, :, :] = (q14(dx) << 16) | (q14(dy) & 0xFFFF)
                p2_ref[0, li, :, :] = (_f16_bits(response) << 16) \
                    | (q14(dssub) & 0xFFFF)
            else:
                # (fp16 response quantization happens outside the kernel
                # in this mode)
                valid_ref[0, li, :, :] = valid.astype(jnp.int32)
                resp_ref[0, li, :, :] = jnp.where(valid, response, 0.0)
                dx_ref[0, li, :, :] = dx
                dy_ref[0, li, :, :] = dy
                ds_ref[0, li, :, :] = dssub
                type_ref[0, li, :, :] = ftype

            # gradient/rotation of the Gaussian at this key level. Canvas
            # mode computes at the full lane-aligned write width Wc >= W:
            # cols [W, Wc) read edge-padded Gaussian data, so the scratch
            # (and hence the canvas margin it DMAs to) holds finite junk,
            # never uninitialized VMEM - NaN there would poison descriptor
            # windows that reach the margin (patch.py margin contract)
            GW = W if canvas is None else Wc
            gup = gl[1:1 + BRD, 2:2 + GW]
            gdown = gl[3:3 + BRD, 2:2 + GW]
            dxg = gl[2:2 + BRD, 3:3 + GW] - gl[2:2 + BRD, 1:1 + GW]
            dyg = gdown - gup
            mag = 0.5 * jnp.sqrt(dxg * dxg + dyg * dyg)
            rotv = jnp.where(mag == 0.0, 0.0, _atan2(dyg, dxg))
            if canvas is None:
                grad_ref[0, li, :, :] = mag
                rot_ref[0, li, :, :] = rotv
            else:
                gscr[li, :, :] = mag.astype(cdt)
                rscr[li, :, :] = rotv.astype(cdt)

        if canvas is not None:
            # one DMA per level/map straight into the canvas cell (started
            # together, waited together so they overlap)
            cps = []
            for li in range(NK):
                pb = b * P + plane_ids[li]
                r0 = pl.multiple_of(dros[li] + row0, 8)
                for j, (scr, ref) in enumerate(((gscr, gc_ref),
                                                (rscr, rc_ref))):
                    cp = pltpu.make_async_copy(
                        scr.at[li],
                        ref.at[pb, pl.ds(r0, BRD), pl.ds(dcos[li], Wc)],
                        csem.at[li, j])
                    cp.start()
                    cps.append(cp)
            for cp in cps:
                cp.wait()

        _ = sem  # silence unused in interpret mode

    blockspec = pl.BlockSpec((1, NK, BRD, W), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM)
    map_dts = (jnp.int32, jnp.float32, jnp.float32, jnp.float32,
               jnp.float32, jnp.int32)
    if canvas is None:
        outs = pl.pallas_call(
            kernel,
            grid=(B, nblk),
            out_shape=tuple(
                jax.ShapeDtypeStruct((B, NK, H, W), dt)
                for dt in map_dts + (jnp.float32, jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=tuple(blockspec for _ in range(8)),
            scratch_shapes=[
                pltpu.VMEM((NP, BRH, Wp), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(gp)
        validk, respk, dxk, dyk, dsk, typek = outs[:6]
        gradk, rotk = outs[6], outs[7]
    else:
        ops = ((gp,) if create_canvas else (gp, gradc, rotc))
        cm_dts = ((jnp.uint16, jnp.int32, jnp.int32) if compressed
                  else map_dts)
        nmaps = len(cm_dts)
        outs = pl.pallas_call(
            kernel,
            grid=(B, nblk),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((B, NK, H, W), dt) for dt in cm_dts]
                + [jax.ShapeDtypeStruct(gradc.shape, gradc.dtype),
                   jax.ShapeDtypeStruct(rotc.shape, rotc.dtype)]),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(ops),
            out_specs=tuple([blockspec] * nmaps
                            + [pl.BlockSpec(memory_space=pl.ANY)] * 2),
            scratch_shapes=[
                pltpu.VMEM((NP, BRH, Wp), jnp.float32),
                pltpu.VMEM((NK, BRD, Wc), cdt),
                pltpu.VMEM((NK, BRD, Wc), cdt),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((NK, 2)),
            ],
            input_output_aliases=({} if create_canvas else
                                  {1: nmaps, 2: nmaps + 1}),
            interpret=interpret,
        )(*ops)
        if compressed:
            key, p1, p2 = outs[:3]
            gradk, rotk = outs[3], outs[4]
            if not batched:
                return (key[0], p1[0], p2[0]), gradk, rotk
            return (key, p1, p2), gradk, rotk
        validk, respk, dxk, dyk, dsk, typek = outs[:6]
        gradk, rotk = outs[6], outs[7]   # the canvases, threaded through
    # reference stores responses as packed half floats (ProgramCU.cu:865)
    respk = respk.astype(jnp.float16).astype(jnp.float32)
    maps = KeypointMaps(valid=validk.astype(jnp.bool_), response=respk,
                        dx=dxk, dy=dyk, ds=dsk, ftype=typek)
    if not batched:
        maps = KeypointMaps(*(a[0] for a in maps))
        if canvas is None:
            return maps, gradk[0], rotk[0]
        return maps, gradk, rotk
    return maps, gradk, rotk
