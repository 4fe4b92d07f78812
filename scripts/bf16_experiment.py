"""bf16 pyramid-storage experiment (VERDICT round-2 item 6).

Hypothesis: storing the Gaussian pyramid in bfloat16 halves HBM traffic
(2x effective DMA bandwidth) for the pyramid-build and detect stages.
This script measures the octave-chain kernel - the stage with the
highest HBM-traffic share - in three configurations on the real TPU:

  f32:       production kernel (f32 in HBM, f32 compute)
  bf16-io:   bf16 in HBM, upcast to f32 in VMEM, f32 compute, bf16 out
  and reports per-call wall time + max abs error vs f32.

The end-to-end ceiling is computable from the stage share: BUILD_PYRAMID
is ~0.4 ms/frame of a ~3.0 ms/frame pipeline that is dispatch-bound
(STATUS roofline: total HBM traffic ~11 MB/frame = ~15 us at v5e
bandwidth), so even a 2x stage win moves end-to-end <10%. The measured
numbers below decide accept/reject for STATUS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hessgpu_tpu.config import SiftConfig
from hessgpu_tpu.ops.pallas.conv import octave_chain_pallas

B, H, W = 16, 480, 640
ITERS = 30


def octave_chain_bf16(base, taps_list):
    """bf16-storage variant of octave_chain_pallas: bf16 in HBM both ways,
    f32 arithmetic in VMEM."""
    taps_list = [tuple(float(t) for t in tp) if tp else () for tp in taps_list]
    radii = [len(tp) // 2 for tp in taps_list]
    R = sum(radii)
    L = 1 + len(taps_list)
    Bn, h, w = base.shape

    BR = min(128, (h + 7) // 8 * 8)
    nblk = pl.cdiv(h, BR)
    brh = BR + (2 * R + 15) // 16 * 16   # bf16 sublane quantum = 16
    wp = (w + 2 * R + 127) // 128 * 128
    bot = nblk * BR + brh - (h + R)
    xp = jnp.pad(base.astype(jnp.bfloat16),
                 ((0, 0), (R, max(bot, R)), (R, wp - w - R)), mode="edge")

    def kernel(xp_hbm, out_ref, buf, sem):
        b = pl.program_id(0)
        blk = pl.program_id(1)
        row0 = pl.multiple_of(blk * BR, 8)
        cp = pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(row0, brh), pl.ds(0, wp)], buf, sem)
        cp.start()
        cp.wait()

        cur = buf[:, :].astype(jnp.float32)
        cum = 0
        for l, tp in enumerate(taps_list):
            coff = R - cum
            out_ref[0, l, :, :] = cur[coff:coff + BR, coff:coff + w].astype(
                jnp.bfloat16)
            r = len(tp) // 2
            if r == 0:
                continue
            rows_l, cols_l = cur.shape
            colio = jax.lax.broadcasted_iota(jnp.int32, (rows_l, cols_l), 1)
            rowio = jax.lax.broadcasted_iota(jnp.int32, (rows_l, cols_l), 0)
            cur = jnp.where(colio < coff, cur[:, coff:coff + 1], cur)
            cur = jnp.where(colio > coff + w - 1,
                            cur[:, coff + w - 1:coff + w], cur)
            top_idx = coff - row0
            bot_idx = h - 1 - row0 + coff
            edge_top = jnp.sum(jnp.where(rowio == top_idx, cur, 0.0),
                               axis=0, keepdims=True)
            cur = jnp.where(rowio < top_idx, edge_top, cur)
            edge_bot = jnp.sum(jnp.where(rowio == bot_idx, cur, 0.0),
                               axis=0, keepdims=True)
            cur = jnp.where(rowio > bot_idx, edge_bot, cur)
            hres = tp[0] * cur[:, 0:cols_l - 2 * r]
            for k in range(1, len(tp)):
                hres = hres + tp[k] * cur[:, k:k + cols_l - 2 * r]
            nxt = tp[0] * hres[0:rows_l - 2 * r, :]
            for k in range(1, len(tp)):
                nxt = nxt + tp[k] * hres[k:k + rows_l - 2 * r, :]
            cur = nxt
            cum += r

        coff = R - cum
        out_ref[0, L - 1, :, :] = cur[coff:coff + BR,
                                      coff:coff + w].astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(Bn, nblk),
        out_shape=jax.ShapeDtypeStruct((Bn, L, h, w), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, L, BR, w), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((brh, wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3, out


def main():
    from hessgpu_tpu.params import gaussian_taps

    print("device:", jax.devices()[0])
    cfg = SiftConfig()
    p = cfg.scale_params()
    taps_list = [
        gaussian_taps(s, p.filter_width_factor) if s > 0 else ()
        for s in p.incremental_sigmas()
    ]
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((B, H, W), np.float32))

    f32_fn = jax.jit(lambda x: octave_chain_pallas(x, taps_list))
    bf16_fn = jax.jit(lambda x: octave_chain_bf16(x, taps_list))

    t_f32, out_f32 = timeit(f32_fn, base)
    t_bf16, out_bf16 = timeit(bf16_fn, base)
    err = float(jnp.max(jnp.abs(out_f32 - out_bf16.astype(jnp.float32))))

    print(f"octave chain (B={B}, {H}x{W}, L={1 + len(taps_list)}):")
    print(f"  f32     : {t_f32:.3f} ms/call  ({t_f32 / B * 1000:.1f} us/frame)")
    print(f"  bf16-io : {t_bf16:.3f} ms/call  ({t_bf16 / B * 1000:.1f} us/frame)")
    print(f"  speedup : {t_f32 / t_bf16:.2f}x   max|err| vs f32: {err:.2e}"
          f"  (image range [0,1])")


if __name__ == "__main__":
    main()
