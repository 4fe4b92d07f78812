"""Pallas separable Gaussian convolution.

XLA lowers single-channel f32 convolutions poorly on TPU (~3-4 ms for a
5-level 640x480 octave vs ~50 us of raw bandwidth). This kernel tiles the
image into row blocks; each program DMAs its block plus the vertical halo
from the edge-padded image in HBM, then runs both separable passes on the
VPU (horizontal = lane-sliced weighted adds, vertical = sublane-sliced) -
one HBM read + one write per pixel.

Boundary semantics match the reference's clamp-to-edge
(ProgramCU.cu:117-231): the caller-visible function edge-pads with XLA
(one cheap copy) before launching the kernel. Taps are compile-time
constants (one cached compile per filter width, like the reference's
template-per-width kernels, ProgramCU.cu:485-512).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BR = 128  # output rows per program (multiple of 8)


def detect_geometry(H: int, W: int):
    """The detect kernel's row blocking + padded input geometry for an
    (H, W) octave - shared with the conv chain so it can emit the
    detect kernel's edge-padded input layout directly (detect_pad mode
    below). Must stay in lockstep with ops/pallas/detect.py.

    Returns (BRD, nblk, BRH, Wp, rows_needed): the detect kernel DMAs
    row blocks [blk*BRD, blk*BRD + BRH) and columns [0, Wp) of a buffer
    whose row t / col c hold the edge-clamped image at (t - 2, c - 2);
    rows_needed = (nblk-1)*BRD + BRH is the last program's reach.
    """
    BRD = 64
    while BRD > 8 and 55 * BRD * W * 4 > 13 * 1024 * 1024:
        BRD //= 2
    nblk = pl.cdiv(H, BRD)
    BRH = BRD + 8
    Wc = (W + 127) // 128 * 128
    Wp = (max(W, Wc) + 2 + 2 + 127) // 128 * 128
    return BRD, nblk, BRH, Wp, (nblk - 1) * BRD + BRH


def octave_chain_pallas(base: jnp.ndarray,
                        taps_list: Sequence[Sequence[float]],
                        interpret: bool = False,
                        detect_pad: bool = False):
    """Whole-octave Gaussian chain in ONE kernel: level l+1 = blur(level l).

    base: (H, W) or (B, H, W) float32 already blurred to level 0.
    taps_list: per-transition tap vectors (empty/None = identity).
    Returns (1 + len(taps_list), H, W) with plane 0 = base (a leading B
    dim carries through: (B, L, H, W)); batches share one kernel with a
    (B, row-blocks) grid, so program size stays flat in B.

    The reference runs FilterImage per level, each a full HBM round-trip
    (PyramidCU.cpp:1542-1548); here each program DMAs one row block of the
    base (plus the cumulative halo R = sum of radii) and carries the whole
    chain through VMEM, writing every level's block - HBM traffic drops
    from ~4 reads+writes per level (pad copy + conv) to one read + L
    writes total. Boundary semantics stay per-level clamp-to-edge: after
    computing each level the kernel re-clamps the out-of-image border of
    its canvas (statically for columns, via masked row-reductions for the
    dynamic row edges), so results equal the chained blur_pallas calls
    bit-for-bit.

    detect_pad=True: instead of the tight (B, L, H, W) stack, emit the
    DETECT kernel's edge-padded input layout directly - row t / col c of
    each plane hold the edge-clamped level image at (t - 2, c - 2),
    shaped (B, L, hp + 8, Wp) per detect_geometry. This deletes the
    jnp.pad(mode="edge") HBM round-trip between the two kernels (~0.9
    ms/batch at B=16) and the hp != h crop copy: the conv canvas already
    maintains clamp-to-edge borders per level, so the padded block is
    just a wider slice of it, emitted AFTER the level's border re-clamp.
    Adjacent programs overlap by 8 output rows with bit-identical values
    (both compute the same tap sums from the same input rows). Returns
    (out, True) on the padded layout, or (out, False) when this shape
    can't take the kernel path (caller falls back to the pad op).
    """
    taps_list = [tuple(float(t) for t in tp) if tp else () for tp in taps_list]
    radii = [len(tp) // 2 for tp in taps_list]
    R = sum(radii)
    L = 1 + len(taps_list)
    batched = base.ndim == 3
    if not batched:
        base = base[None]
    B, h, w = base.shape

    def _fallback_unpadded():
        if h < 32 or w < 32 or R == 0 or interpret:
            from ..gaussian import conv1d_clamped
            levels = [base]
            for tp in taps_list:
                x = levels[-1]
                if tp:
                    x = conv1d_clamped(x, tp, axis=2)
                    x = conv1d_clamped(x, tp, axis=1)
                levels.append(x)
            out = jnp.stack(levels, axis=1)
        else:
            x = base
            levels = [x]
            for tp in taps_list:
                if tp:
                    x = blur_pallas(x, tp)
                levels.append(x)
            out = jnp.stack(levels, axis=1)
        out = out if batched else out[0]
        return (out, False) if detect_pad else out

    if h < 32 or w < 32 or R == 0:
        return _fallback_unpadded()

    # output width padded to the lane tiling: VMEM->HBM DMA slices must be
    # 128-aligned along the last dim (cropped after the call when wo > w)
    wo = (w + 127) // 128 * 128
    if detect_pad:
        # emit geometry: rows [row0, row0 + BR + 8) (8 overlap), cols
        # [0, Wp) of the detect-padded layout; the canvas needs 2 extra
        # border rows/cols on each side plus the 8-row overlap, so the
        # halo budget grows from 2R to 2*(R+4) + 2
        _, _, _, Wp_d, rows_needed = detect_geometry(h, w)
        R2 = R + 4
        emit_rows = None  # per-block rows, set to BR + 8 below
        wemit = Wp_d
        halo = (2 * R2 + 2 + 7) // 8 * 8
        wp = (wemit + 2 + 2 * R2 + 127) // 128 * 128
    else:
        R2 = R
        wemit = wo
        halo = (2 * R + 7) // 8 * 8
        wp = (wo + 2 * R + 127) // 128 * 128

    # block rows: tile h exactly when h is a multiple of 8 (nblk * BR ==
    # hp == h), so the post-kernel crop is a no-op for the common shapes.
    # The Mosaic vmem stack holds MANY live (brh, wp) canvas temporaries
    # for the unrolled chain, and the 16 MB scoped-vmem limit counts the
    # kernel's declared scratch (buf + acc) on top of that stack (raising
    # the limit via CompilerParams sends the compile into tens of
    # minutes). Estimator calibrated against Mosaic's own number at the
    # one shape that overflowed (640x480 B=16 detect_pad, br0=128:
    # brh=224, wp=896, Mosaic reported 16.10 MB = stack ~17 canvas
    # temporaries + buf 0.77 MB + acc 2.39 MB), with a real margin:
    # detect_pad shapes must fit 13 MB (~80% of the limit) or drop a
    # block size. The unpadded chain's coefficients (15, 15.5 MB) are
    # chosen to reproduce every blocking that compiled AND ran across
    # rounds 3-4 (640@128, 1024@64, 2048@16) while still counting the
    # declared scratch.
    def _choose_br(coeff, cap_b, pad_mode):
        halo_m = (2 * (R + 4) + 2 + 7) // 8 * 8 if pad_mode \
            else (2 * R + 7) // 8 * 8
        wo_m = (w + 127) // 128 * 128
        if pad_mode:
            wemit_m = (max(w, wo_m) + 2 + 2 + 127) // 128 * 128
            wp_m = (wemit_m + 2 + 2 * (R + 4) + 127) // 128 * 128
        else:
            wemit_m = wo_m
            wp_m = (wo_m + 2 * R + 127) // 128 * 128
        for b0 in (128, 64, 32, 16):
            brh0 = b0 + halo_m
            emit0 = (b0 + 8) if pad_mode else b0
            est = (coeff * brh0 * wp_m       # Mosaic stack (live temps)
                   + brh0 * wp_m             # declared scratch: buf
                   + L * emit0 * wemit_m) * 4  # declared scratch: acc
            if est <= cap_b:
                return b0
        return 0

    if detect_pad:
        br0 = _choose_br(17, 13 * 1024 * 1024, True)
        # detect_pad only saves the inter-kernel jnp.pad (~0.27 ms/batch
        # at B=16); a shrunken row block costs more than that in halo
        # recompute (measured: oct0 640x480 detect_pad@64 = 2.21 ms vs
        # unpadded@128 + pad = 1.37 + 0.27 ms). Prefer the unpadded
        # chain whenever it sustains a larger block.
        if br0 == 0 or br0 < _choose_br(15, int(15.5 * 1024 * 1024), False):
            return octave_chain_pallas(
                base if batched else base[0],
                taps_list, interpret=interpret, detect_pad=False), False
    else:
        br0 = _choose_br(15, int(15.5 * 1024 * 1024), False)
        if br0 == 0:
            return _fallback_unpadded()
    nblk = pl.cdiv(h, br0)
    if detect_pad:
        # full br0-multiple tiling (not the tight re-fit below): the
        # output must cover the detect grid's reach, and
        # ceil_{br0}(h) + 8 >= ceil_{BRD}(h) + 8 = rows_needed whenever
        # br0 >= BRD (the adaptive loops keep br0 >= BRD for every
        # shape both kernels accept; the runtime gate catches the rest)
        BR = br0
    else:
        # tile h exactly when possible so the post-kernel crop is a no-op
        BR = (pl.cdiv(h, nblk) + 7) // 8 * 8
    hp = nblk * BR
    brh = BR + halo

    if detect_pad:
        emit_rows = BR + 8
        if hp + 8 < rows_needed:
            # the detect grid reaches past this blocking's coverage
            # (possible when the adaptive row blocks diverge at extreme
            # widths) - let the caller pad the old way
            return _fallback_unpadded()
    else:
        emit_rows = BR

    bot = hp + brh - (h + R2)
    xp = jnp.pad(base, ((0, 0), (R2, max(bot, R2)), (R2, wp - w - R2)),
                 mode="edge")

    def kernel(xp_hbm, out_hbm, buf, acc, sem_in, sem_out):
        # the output stays in HBM (memory_space=ANY) and each level block
        # is DMA'd out explicitly: with a VMEM-blocked out_spec, XLA's
        # memory-space assignment pins the WHOLE (B, L, h, w) result into
        # scoped VMEM whenever it fits under the 16 MB limit - at
        # 1024x768 (15.7 MB + overhead) that OOMs the compile
        b = pl.program_id(0)
        blk = pl.program_id(1)
        row0 = pl.multiple_of(blk * BR, 8)
        cp = pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(row0, brh), pl.ds(0, wp)], buf, sem_in)
        cp.start()
        cp.wait()

        def emit(l, block):
            acc[l, :, :] = block
            cpo = pltpu.make_async_copy(
                acc.at[l],
                out_hbm.at[b, l, pl.ds(row0, emit_rows), pl.ds(0, wemit)],
                sem_out.at[l])
            cpo.start()
            return cpo

        def clamp(cur, coff):
            # re-clamp the canvas borders to this level's own edge values
            # (per-level clamp-to-edge, ProgramCU.cu:117-231). Columns:
            # static offsets. Rows: the image edge lands at a block-
            # dependent canvas row, so extract it with a masked reduction.
            rows_l, cols_l = cur.shape
            colio = jax.lax.broadcasted_iota(jnp.int32, (rows_l, cols_l), 1)
            rowio = jax.lax.broadcasted_iota(jnp.int32, (rows_l, cols_l), 0)
            cur = jnp.where(colio < coff, cur[:, coff:coff + 1], cur)
            cur = jnp.where(colio > coff + w - 1,
                            cur[:, coff + w - 1:coff + w], cur)
            top_idx = coff - row0          # canvas row of image row 0
            bot_idx = h - 1 - row0 + coff  # canvas row of image row h-1
            edge_top = jnp.sum(jnp.where(rowio == top_idx, cur, 0.0),
                               axis=0, keepdims=True)
            cur = jnp.where(rowio < top_idx, edge_top, cur)
            edge_bot = jnp.sum(jnp.where(rowio == bot_idx, cur, 0.0),
                               axis=0, keepdims=True)
            cur = jnp.where(rowio > bot_idx, edge_bot, cur)
            return cur

        def emit_slice(l, cur, coff):
            # unpadded: the (BR, wo) data block; detect_pad: the
            # (BR + 8, Wp) window whose [0, 0] is image (row0 - 2, -2) -
            # border values come from the canvas's re-clamped edges, so
            # they equal jnp.pad(..., mode="edge") bit-for-bit
            if detect_pad:
                return emit(l, cur[coff - 2:coff - 2 + emit_rows,
                                   coff - 2:coff - 2 + wemit])
            return emit(l, cur[coff:coff + BR, coff:coff + wo])

        # canvas invariant: cur[i, j] = level image at
        # (row0 - R2 + cum + i, j - R2 + cum) where cum = sum of used radii
        copies = []
        cur = buf[:, :]
        cum = 0
        for l, tp in enumerate(taps_list):
            coff = R2 - cum
            r = len(tp) // 2
            # the blur below needs clamped borders anyway; in detect_pad
            # mode the emit's +-2 border rows/cols need them too (level 0
            # is pre-clamped by the xp edge-pad)
            if l > 0 and (r > 0 or detect_pad):
                cur = clamp(cur, coff)
            copies.append(emit_slice(l, cur, coff))

            if r == 0:
                continue
            rows_l, cols_l = cur.shape
            if l == 0:
                cur = clamp(cur, coff)  # no-op values-wise; keeps the
                # exact op order of the pre-detect_pad kernel
            hres = tp[0] * cur[:, 0:cols_l - 2 * r]
            for k in range(1, len(tp)):
                hres = hres + tp[k] * cur[:, k:k + cols_l - 2 * r]
            nxt = tp[0] * hres[0:rows_l - 2 * r, :]
            for k in range(1, len(tp)):
                nxt = nxt + tp[k] * hres[k:k + rows_l - 2 * r, :]
            cur = nxt
            cum += r

        coff = R2 - cum
        if detect_pad:
            cur = clamp(cur, coff)
        copies.append(emit_slice(L - 1, cur, coff))
        for cpo in copies:
            cpo.wait()

    out_rows = hp + 8 if detect_pad else hp
    out = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        out_shape=jax.ShapeDtypeStruct((B, L, out_rows, wemit), jnp.float32),
        # HBM, not ANY: at >=2048-wide shapes XLA's memory-space assignment
        # promotes ANY operands into scoped VMEM next to the scratch and
        # blows the 16 MB scoped-vmem limit (compile-time OOM); the kernel
        # stages its own DMAs, so pin both sides to HBM
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((brh, wp), jnp.float32),
            pltpu.VMEM((L, emit_rows, wemit), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((L,)),
        ],
        interpret=interpret,
    )(xp)
    if detect_pad:
        return (out if batched else out[0]), True
    out = out if (hp == h and wo == w) else out[:, :, :h, :w]
    return out if batched else out[0]


def blur_pallas(x: jnp.ndarray, taps: Sequence[float]) -> jnp.ndarray:
    """Separable blur of (H, W) or (B, H, W) float32, clamp-to-edge.

    A leading batch dim rides the grid ((B, row-blocks)) - one compiled
    kernel regardless of B."""
    taps = tuple(float(t) for t in taps)
    r = len(taps) // 2
    batched = x.ndim == 3
    if not batched:
        x = x[None]
    B, h, w = x.shape

    if h < 16 or w < 16:
        from ..gaussian import conv1d_clamped
        x = conv1d_clamped(x, taps, axis=2)
        out = conv1d_clamped(x, taps, axis=1)
        return out if batched else out[0]

    nblk = pl.cdiv(h, _BR)
    # rows a program must read: block + vertical halo, rounded to sublanes
    brh = _BR + (2 * r + 7) // 8 * 8
    # padded width: horizontal halo + lane alignment
    wp = (w + 2 * r + 127) // 128 * 128

    # edge-pad: r on top/left; bottom/right get enough for the last block's
    # aligned DMA (extra area is edge-replicated, never used by outputs)
    bot = (nblk * _BR + brh) - (h + r)
    xp = jnp.pad(x, ((0, 0), (r, max(bot, r)), (r, wp - w - r)), mode="edge")

    def kernel(xp_hbm, out_ref, buf, sem):
        b = pl.program_id(0)
        blk = pl.program_id(1)
        row0 = pl.multiple_of(blk * _BR, 8)
        cp = pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(row0, brh), pl.ds(0, wp)], buf, sem)
        cp.start()
        cp.wait()

        xv = buf[:, :]
        hres = taps[0] * xv[:, 0:w]
        for k in range(1, len(taps)):
            hres = hres + taps[k] * xv[:, k:k + w]
        out = taps[0] * hres[0:_BR, :]
        for k in range(1, len(taps)):
            out = out + taps[k] * hres[k:k + _BR, :]
        out_ref[0, :, :] = out

    out = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, _BR, w), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((brh, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp)
    return out if batched else out[0]


def downsample2_pallas(x: jnp.ndarray,
                       interpret: bool = False,
                       src_offset=None) -> jnp.ndarray:
    """Exact decimation by 2 (keep even rows/cols) for (B, H, W) f32.

    XLA's lowerings of this are all relayout-bound on TPU (strided conv
    1.03 ms, [::2, ::2] slice 0.48 ms for a (16, 480, 640) batch -
    ~30x the raw bandwidth). Here each program DMAs a row block and
    decimates with two 0/1 selection dot_generals on the MXU (exact:
    every output sums exactly one input element), writing ~bandwidth-
    bound blocks. Rows/cols beyond the input read as zero via the
    selection bounds, so odd sizes ceil-decimate like x[::2, ::2].

    src_offset=(row_off, col_off, h, w): x is a PADDED plane (e.g. the
    detect_pad layout the conv chain emits) whose image pixel (i, j)
    lives at x[row_off + i, col_off + j]; decimate the (h, w) image.
    The offsets fold into the 0/1 selection matrices for free - no
    relayout slice of the padded plane is ever materialized.
    """
    batched = x.ndim == 3
    if not batched:
        x = x[None]
    if src_offset is not None:
        row_off, col_off, h, w = (int(v) for v in src_offset)
        if x.shape[-2] < ((h + 127) // 128 * 128) + ((row_off + 7) // 8 * 8) \
                or x.shape[-1] < (col_off + w + 127) // 128 * 128 \
                or h < 16 or w < 256 or row_off >= 8:
            # geometry the offset kernel can't cover: materialize the
            # cropped image (one relayout copy) and decimate normally
            x = x[:, row_off:row_off + h, col_off:col_off + w]
            src_offset = None
            row_off = col_off = 0
    else:
        row_off = col_off = 0
    if src_offset is None:
        B, h, w = x.shape
    else:
        B = x.shape[0]
    ho = (h + 1) // 2
    wo2 = (w + 1) // 2
    if h < 16 or w < 256:
        out = x[:, ::2, ::2]
        return out if batched else out[0]

    BRI = 128                                 # input rows per program
    nblk = pl.cdiv(h, BRI)
    hin = nblk * BRI
    wi = (col_off + w + 127) // 128 * 128
    wop = ((wo2 + 127) // 128 * 128)
    hop = nblk * (BRI // 2)

    if src_offset is None and (hin != h or wi != w):
        # zero-pad to the block grid (pad rows/cols decimate into the
        # cropped region only)
        x = jnp.pad(x, ((0, 0), (0, hin - h), (0, wi - w)))
    hcl = BRI + ((row_off + 7) // 8 * 8)

    def kernel(x_hbm, out_hbm, buf, acc, sem_in, sem_out):
        b = pl.program_id(0)
        blk = pl.program_id(1)
        row0 = pl.multiple_of(blk * BRI, 8)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(row0, hcl), pl.ds(0, wi)],
            buf.at[pl.ds(0, hcl)], sem_in)
        cp.start()
        cp.wait()

        # row selection: Sr[i, j] = [j == 2i + row_off] (64, hcl); col
        # selection: Sc[j, k] = [j == 2k + col_off] (wi, wop). 0/1 f32
        # dots select exactly one element per output - bit-exact vs the
        # strided slice, and a padded-source offset folds in for free.
        io_r = jax.lax.broadcasted_iota(jnp.int32, (BRI // 2, hcl), 0)
        io_c = jax.lax.broadcasted_iota(jnp.int32, (BRI // 2, hcl), 1)
        Sr = (io_c == 2 * io_r + row_off).astype(jnp.float32)
        jo_r = jax.lax.broadcasted_iota(jnp.int32, (wi, wop), 0)
        jo_c = jax.lax.broadcasted_iota(jnp.int32, (wi, wop), 1)
        Sc = (jo_r == 2 * jo_c + col_off).astype(jnp.float32)

        # HIGHEST: the default MXU path rounds the operands through
        # bf16, which breaks the exact-selection property on hardware
        # (measured: 230 -> 223 features on 640-1.jpg)
        rows = jax.lax.dot_general(
            Sr, buf[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # (BRI/2, wi)
        acc[:, :] = jax.lax.dot_general(
            rows, Sc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # (BRI/2, wop)

        cpo = pltpu.make_async_copy(
            acc,
            out_hbm.at[b, pl.ds(pl.multiple_of(blk * (BRI // 2), 8),
                                BRI // 2), pl.ds(0, wop)],
            sem_out)
        cpo.start()
        cpo.wait()

    out = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        out_shape=jax.ShapeDtypeStruct((B, hop, wop), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((hcl, wi), jnp.float32),
            pltpu.VMEM((BRI // 2, wop), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x)
    out = out[:, :ho, :wo2]
    return out if batched else out[0]
