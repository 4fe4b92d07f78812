"""Stream compaction with static shapes.

TPU-native replacement for the reference's atomic list generation
(GFL_*/ListGen_Kernel, ProgramCU.cu:922-1217): a dense boolean keypoint map
is compacted into a fixed-capacity list of coordinates. Where CUDA uses warp
ballots + atomicAdd (nondeterministic block order), we use an exclusive
prefix-sum scatter - deterministic raster order, identical membership.

Capacity policy mirrors the reference: per-level cap
min(0.5% of pixels, 4096) (PyramidCU.cpp:443-451, GlobalUtil.cpp:67-68);
overflowing keypoints are dropped in raster order (the reference drops by
atomic arrival order instead - membership may differ only when a level
overflows its cap).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp


class FeatureList(NamedTuple):
    """Fixed-capacity SoA keypoint list for one level (or a concatenation).

    Replaces the reference's packed float4 feature textures
    (ProgramCU.cu:1562-1604) with plain arrays.
    """
    x: jnp.ndarray         # f32 (K,) column + 0.5 + dx (level pixel coords)
    y: jnp.ndarray         # f32 (K,) row + 0.5 + dy
    sigma: jnp.ndarray     # f32 (K,) scale in level coords
    theta: jnp.ndarray     # f32 (K,) orientation (device frame, radians)
    response: jnp.ndarray  # f32 (K,)
    ftype: jnp.ndarray     # i32 (K,)
    valid: jnp.ndarray     # bool (K,)

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def compact_mask(valid: jnp.ndarray, values: Sequence[jnp.ndarray], capacity: int):
    """Scatter elements where valid into fixed-size arrays (raster order).

    valid: bool (...,) mask, flattened internally.
    values: arrays shaped like valid, gathered alongside.
    Returns (count, [compacted values...], compacted_valid) where each output
    has shape (capacity,).

    One scatter compacts the source indices; the payload fields then follow
    with small (capacity,)-sized gathers - TPU scatters are expensive, so
    scatter once, not once per field.
    """
    vflat = valid.reshape(-1)
    n = vflat.shape[0]
    pos = jnp.cumsum(vflat.astype(jnp.int32)) - 1
    idx = jnp.where(vflat, pos, capacity)  # out-of-range -> dropped
    idx = jnp.minimum(idx, capacity)       # overflow also dropped

    count = jnp.minimum(jnp.sum(vflat.astype(jnp.int32)), capacity)
    src = jnp.zeros((capacity,), jnp.int32)
    src = src.at[idx].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    outs = [val.reshape(-1)[src] for val in values]
    slot_valid = jnp.arange(capacity) < count
    outs = [jnp.where(slot_valid, o, jnp.zeros_like(o)) for o in outs]
    return count, outs, slot_valid


def compact_indices(valid: jnp.ndarray, capacity: int):
    """Like compact_mask but returns the source-index table so callers can
    gather arbitrary payloads (including 2-D ones) themselves.

    Returns (src (capacity,) i32 indices into the flattened input,
    slot_valid (capacity,) bool, count)."""
    vflat = valid.reshape(-1)
    n = vflat.shape[0]
    pos = jnp.cumsum(vflat.astype(jnp.int32)) - 1
    idx = jnp.where(vflat, pos, capacity)
    idx = jnp.minimum(idx, capacity)
    count = jnp.minimum(jnp.sum(vflat.astype(jnp.int32)), capacity)
    src = jnp.zeros((capacity,), jnp.int32)
    src = src.at[idx].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    slot_valid = jnp.arange(capacity) < count
    return src, slot_valid, count


def compact_level_keypoints(maps, sigma: float, sigma_step: float, capacity: int) -> FeatureList:
    """Dense KeypointMaps -> fixed-capacity FeatureList for one level.

    Coordinates follow the reference convention: x = col + 0.5 + dx
    (ComputeOrientation_Kernel, ProgramCU.cu:1281-1298), scale =
    level_sigma * sigma_step**ds.
    """
    h, w = maps.valid.shape
    rows = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32).reshape(-1, 1), (h, w))
    cols = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32).reshape(1, -1), (h, w))
    x = cols + 0.5 + maps.dx
    y = rows + 0.5 + maps.dy

    count, (xo, yo, ro, to, dso), slot_valid = compact_mask(
        maps.valid, [x, y, maps.response, maps.ftype, maps.ds], capacity
    )
    return FeatureList(
        x=xo, y=yo,
        sigma=jnp.where(slot_valid, sigma * jnp.power(sigma_step, dso), 0.0),
        theta=jnp.zeros((capacity,), jnp.float32),
        response=ro, ftype=to, valid=slot_valid,
    )
