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

import jax
import jax.numpy as jnp

# Per-row candidate cap for the dense two-stage compaction below. The
# global per-level cap is <= 0.5% of pixels (GlobalUtil.cpp:67-68) and the
# 3x3 NMS spaces detections >= 2 px apart, so > 64 detections in a single
# pixel row of one level is far past saturation.
_ROW_CAP = 64


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


def _dense_compact_indices(valid2d: jnp.ndarray, capacity: int):
    """Raster-order compaction of a dense (H, W) mask without a scatter.

    XLA lowers the straightforward cumsum+scatter to a serial per-update
    loop on TPU (~1.4 ms per 640x480 level map - it dominated the whole
    pipeline); two batched top_k passes keep everything on the vector
    units:
      1. per row, the first _ROW_CAP valid columns (keys decrease with
         column, so top-k = leftmost);
      2. over the (H * _ROW_CAP) candidates, the first `capacity` in
         raster order (keys decrease with flat index).
    Membership equals the scatter path exactly unless a single row holds
    > _ROW_CAP detections (then overflow drops right-of-row instead of
    end-of-raster - both beyond the reference's 0.5%-of-pixels saturation).

    Returns (src flat indices (capacity,), slot_valid, count).
    """
    h, w = valid2d.shape
    n = h * w
    kpr = min(w, _ROW_CAP)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    keys = jnp.where(valid2d, w - col, 0)
    topv, _ = jax.lax.top_k(keys, kpr)                  # (H, kpr)
    cand_valid = topv > 0
    cand_col = jnp.where(cand_valid, w - topv, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, kpr), 0)
    flat = row * w + cand_col

    k2 = min(capacity, h * kpr)
    keys2 = jnp.where(cand_valid, n - flat, 0).reshape(-1)
    top2, _ = jax.lax.top_k(keys2, k2)                  # (k2,)
    src = jnp.where(top2 > 0, n - top2, 0)
    if k2 < capacity:
        src = jnp.pad(src, (0, capacity - k2))
    count = jnp.minimum(jnp.sum(cand_valid.astype(jnp.int32)), capacity)
    slot_valid = jnp.arange(capacity) < count
    return src, slot_valid, count


def compact_mask(valid: jnp.ndarray, values: Sequence[jnp.ndarray], capacity: int):
    """Compact elements where valid into fixed-size arrays (raster order).

    valid: bool (...,) mask, flattened internally.
    values: arrays shaped like valid, gathered alongside.
    Returns (count, [compacted values...], compacted_valid) where each output
    has shape (capacity,).
    """
    src, slot_valid, count = compact_indices(valid, capacity)
    outs = [val.reshape(-1)[src] for val in values]
    outs = [jnp.where(slot_valid, o, jnp.zeros_like(o)) for o in outs]
    return count, outs, slot_valid


def compact_indices(valid: jnp.ndarray, capacity: int):
    """First-`capacity` valid flat indices, in index order.

    One lax.top_k over keys that decrease with flat index (so top-k =
    leftmost valid): XLA lowers the alternative cumsum+scatter to a serial
    per-update loop on TPU, while top_k stays on the vector units.

    Returns (src (capacity,) i32 indices into the flattened input,
    slot_valid (capacity,) bool, count)."""
    vflat = valid.reshape(-1)
    n = vflat.shape[0]
    keys = jnp.where(vflat, n - jnp.arange(n, dtype=jnp.int32), 0)
    k = min(capacity, n)
    top, _ = jax.lax.top_k(keys, k)
    src = jnp.where(top > 0, n - top, 0)
    if k < capacity:
        src = jnp.pad(src, (0, capacity - k))
    count = jnp.minimum(jnp.sum(vflat.astype(jnp.int32)), capacity)
    slot_valid = jnp.arange(capacity) < count
    return src, slot_valid, count


def compact_octave_keypoints(maps, sigmas, sigma_step: float,
                             capacity: int) -> FeatureList:
    """Dense KeypointMaps for ALL key levels of one octave -> one blocked
    FeatureList with (NK, capacity) leaves (row k = key level k).

    Same per-level result as compact_level_keypoints, but everything
    batches over the level dimension - one top_k / gather / where call on
    (NK, ...) operands instead of NK each. The dozens of tiny per-level
    ops the split version emitted were pure dispatch overhead on TPU.
    """
    if isinstance(maps, list):
        # legacy per-level list -> stacked leaves (KeypointMaps itself is
        # a NamedTuple, so only a plain list means "per level")
        maps = jax.tree.map(lambda *xs: jnp.stack(xs), *maps)
    valid3 = maps.valid                                  # (NK, H, W)
    nk, h, w = valid3.shape
    n = h * w

    kpr = min(w, _ROW_CAP)
    col = jax.lax.broadcasted_iota(jnp.int32, (nk, h, w), 2)
    keys = jnp.where(valid3, w - col, 0)
    topv, _ = jax.lax.top_k(keys, kpr)                   # (NK, H, kpr)
    cand_valid = topv > 0
    cand_col = jnp.where(cand_valid, w - topv, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (nk, h, kpr), 1)
    flat = row * w + cand_col

    k2 = min(capacity, h * kpr)
    keys2 = jnp.where(cand_valid, n - flat, 0).reshape(nk, -1)
    top2, _ = jax.lax.top_k(keys2, k2)                   # (NK, k2)
    src = jnp.where(top2 > 0, n - top2, 0)
    if k2 < capacity:
        src = jnp.pad(src, ((0, 0), (0, capacity - k2)))
    count = jnp.minimum(
        jnp.sum(cand_valid.astype(jnp.int32), axis=(1, 2)), capacity)
    sv = jnp.arange(capacity)[None, :] < count[:, None]  # (NK, cap)

    rows_f = jnp.arange(h, dtype=jnp.float32).reshape(1, -1, 1)
    cols_f = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, -1)
    take = lambda a: jnp.take_along_axis(a.reshape(nk, -1), src, axis=1)
    x = take(cols_f + 0.5 + maps.dx)
    y = take(rows_f + 0.5 + maps.dy)
    r = take(maps.response)
    t = take(maps.ftype)
    ds = take(maps.ds)
    sig = jnp.asarray(sigmas, jnp.float32)[:, None] \
        * jnp.power(sigma_step, ds)
    return FeatureList(
        x=jnp.where(sv, x, 0.0), y=jnp.where(sv, y, 0.0),
        sigma=jnp.where(sv, sig, 0.0),
        theta=jnp.zeros((nk, capacity), jnp.float32),
        response=jnp.where(sv, r, 0.0),
        ftype=jnp.where(sv, t, jnp.zeros_like(t)),
        valid=sv,
    )


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

    src, slot_valid, count = _dense_compact_indices(maps.valid, capacity)
    outs = [val.reshape(-1)[src] for val in
            (x, y, maps.response, maps.ftype, maps.ds)]
    xo, yo, ro, to, dso = [
        jnp.where(slot_valid, o, jnp.zeros_like(o)) for o in outs]
    return FeatureList(
        x=xo, y=yo,
        sigma=jnp.where(slot_valid, sigma * jnp.power(sigma_step, dso), 0.0),
        theta=jnp.zeros((capacity,), jnp.float32),
        response=ro, ftype=to, valid=slot_valid,
    )
