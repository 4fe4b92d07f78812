"""Spatially sharded filtering: images split across chips with halo exchange.

The reference caps its working dimension at 3200 px and downsamples anything
larger (GlobalUtil.cpp:82, PyramidCU.cpp:153-191). The TPU-native answer to
"image larger than one chip" is row-sharding the image across the mesh and
exchanging convolution halos with ppermute - structurally the same
communication pattern as ring attention (SURVEY.md section 5.7).

All collectives ride ICI inside a slice; the stencil math is identical to
the single-chip ops so results match bit-for-bit up to edge handling.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import gaussian_taps


def _exchange_halo(block: jnp.ndarray, halo: int, axis_name: str):
    """Fetch `halo` edge rows from both ring neighbours.

    block: (Hs, W) this device's row shard. Returns (top_halo, bot_halo)
    each (halo, W): rows that belong logically above/below this shard.
    Edge devices receive the wrapped-around rows but replace them with edge
    replication (matching the single-chip clamp-to-edge semantics).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # my bottom rows -> next device's top halo
    down = [(i, (i + 1) % n) for i in range(n)]
    up = [(i, (i - 1) % n) for i in range(n)]

    top_halo = jax.lax.ppermute(block[-halo:], axis_name, down)
    bot_halo = jax.lax.ppermute(block[:halo], axis_name, up)

    # clamp-to-edge at the global borders
    first_rep = jnp.repeat(block[:1], halo, axis=0)
    last_rep = jnp.repeat(block[-1:], halo, axis=0)
    top_halo = jnp.where(idx == 0, first_rep, top_halo)
    bot_halo = jnp.where(idx == n - 1, last_rep, bot_halo)
    return top_halo, bot_halo


def _blur_block(block, taps, axis_name):
    """Separable blur of a row shard with halo exchange for the vertical
    pass (the horizontal pass is shard-local)."""
    taps_arr = jnp.asarray(np.asarray(taps, np.float32))
    r = len(taps) // 2

    # horizontal: local, clamp-to-edge
    xp = jnp.pad(block, ((0, 0), (r, r)), mode="edge")
    out = jnp.zeros_like(block)
    for i in range(len(taps)):
        out = out + taps_arr[i] * jax.lax.dynamic_slice_in_dim(
            xp, i, block.shape[1], axis=1)

    # vertical: exchange halos, then valid conv
    top, bot = _exchange_halo(out, r, axis_name)
    ext = jnp.concatenate([top, out, bot], axis=0)
    res = jnp.zeros_like(block)
    for i in range(len(taps)):
        res = res + taps_arr[i] * jax.lax.dynamic_slice_in_dim(
            ext, i, block.shape[0], axis=0)
    return res


def sharded_blur(img: jnp.ndarray, sigma: float, mesh: Mesh,
                 filter_width_factor: float = 4.0) -> jnp.ndarray:
    """Gaussian blur of a row-sharded image over a 1-D mesh.

    img: (H, W) with H divisible by the mesh size.
    """
    taps = gaussian_taps(sigma, filter_width_factor)
    axis = mesh.axis_names[0]

    fn = jax.shard_map(
        functools.partial(_blur_block, taps=tuple(taps), axis_name=axis),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
    )
    sharding = NamedSharding(mesh, P(axis, None))
    return fn(jax.device_put(img, sharding))


def sharded_hessian_response(img: jnp.ndarray, sigmas: Sequence[float],
                             norms: Sequence[float], mesh: Mesh,
                             filter_width_factor: float = 4.0):
    """Row-sharded scale-space responses for one octave of a huge image.

    Builds the Gaussian chain and the det-of-Hessian response with all
    stencils exchanging 1-row halos. Returns (levels+1, H, W) gauss stack
    and (levels+1, H, W) responses, sharded over rows.
    """
    axis = mesh.axis_names[0]
    taps_list = tuple(tuple(gaussian_taps(s, filter_width_factor))
                      for s in sigmas)

    def block_fn(block):
        levels = [block]
        for taps in taps_list:
            levels.append(_blur_block(levels[-1], taps, axis))
        stack = jnp.stack(levels)

        # 3x3 stencil with 1-row halo
        top, bot = _exchange_halo(
            stack.reshape(-1, stack.shape[-1]), 1, axis_name=axis)
        # exchange per level: do it level-wise to keep rows aligned
        resps = []
        for li in range(stack.shape[0]):
            lv = stack[li]
            t, b = _exchange_halo(lv, 1, axis)
            ext = jnp.concatenate([t, lv, b], axis=0)
            xp = jnp.pad(ext, ((0, 0), (1, 1)), mode="edge")
            c = xp[1:-1, 1:-1]
            lxx = xp[1:-1, :-2] - 2 * c + xp[1:-1, 2:]
            lyy = xp[:-2, 1:-1] - 2 * c + xp[2:, 1:-1]
            lxy = 0.25 * (xp[:-2, :-2] + xp[2:, 2:] - xp[2:, :-2] - xp[:-2, 2:])
            resps.append((lxx * lyy - lxy * lxy) * norms[li])
        return stack, jnp.stack(resps)

    fn = jax.shard_map(block_fn, mesh=mesh,
                       in_specs=P(axis, None),
                       out_specs=(P(None, axis, None), P(None, axis, None)))
    sharding = NamedSharding(mesh, P(axis, None))
    return fn(jax.device_put(img, sharding))
