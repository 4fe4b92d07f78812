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


def blur_pallas(x: jnp.ndarray, taps: Sequence[float]) -> jnp.ndarray:
    """Separable blur of (H, W) float32 with clamp-to-edge boundaries."""
    taps = tuple(float(t) for t in taps)
    r = len(taps) // 2
    h, w = x.shape

    if h < 16 or w < 16:
        from ..gaussian import conv1d_clamped
        x = conv1d_clamped(x, taps, axis=1)
        return conv1d_clamped(x, taps, axis=0)

    nblk = pl.cdiv(h, _BR)
    # rows a program must read: block + vertical halo, rounded to sublanes
    brh = _BR + (2 * r + 7) // 8 * 8
    # padded width: horizontal halo + lane alignment
    wp = (w + 2 * r + 127) // 128 * 128

    # edge-pad: r on top/left; bottom/right get enough for the last block's
    # aligned DMA (extra area is edge-replicated, never used by outputs)
    bot = (nblk * _BR + brh) - (h + r)
    xp = jnp.pad(x, ((r, max(bot, r)), (r, wp - w - r)), mode="edge")

    def kernel(xp_hbm, out_ref, buf, sem):
        blk = pl.program_id(0)
        row0 = pl.multiple_of(blk * _BR, 8)
        cp = pltpu.make_async_copy(
            xp_hbm.at[pl.ds(row0, brh), pl.ds(0, wp)], buf, sem)
        cp.start()
        cp.wait()

        xv = buf[:, :]
        hres = taps[0] * xv[:, 0:w]
        for k in range(1, len(taps)):
            hres = hres + taps[k] * xv[:, k:k + w]
        out = taps[0] * hres[0:_BR, :]
        for k in range(1, len(taps)):
            out = out + taps[k] * hres[k:k + _BR, :]
        out_ref[:, :] = out

    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_BR, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((brh, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp)
