"""Feature table: the SoA keypoint/descriptor container.

Replaces the reference's packed fixed-point float4 keypoint encoding
(config.h:65-103, ProgramCU.cu:1562-1604) and the host SiftKeypoint ABI
(SiftGPU.h:108-122: x, y, s, o, response, level:u16, type:u16) with plain
arrays + a validity mask. Capacities are static so everything jits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class FeatureTable(NamedTuple):
    """Fixed-capacity feature set in *image* coordinates."""
    x: jnp.ndarray          # f32 (N,)
    y: jnp.ndarray          # f32 (N,)
    sigma: jnp.ndarray      # f32 (N,) scale in input-image units
    theta: jnp.ndarray      # f32 (N,) orientation, image frame (mirrored)
    response: jnp.ndarray   # f32 (N,)
    level: jnp.ndarray      # i32 (N,) flattened (octave * s + key_level - 1)
    ftype: jnp.ndarray      # i32 (N,) 0 dark blob / 1 bright blob / 2 saddle
    valid: jnp.ndarray      # bool (N,)
    desc: jnp.ndarray       # f32 (N, 128) (or (N, 64) half-SIFT); zeros if absent

    @property
    def capacity(self) -> int:
        return int(self.x.shape[-1])

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def to_numpy_trimmed(table: FeatureTable):
    """Device table -> compact NumPy dict (host-side, trims to valid count).

    Valid slots are guaranteed to be a per-level prefix by construction, but
    the final concatenated table interleaves levels, so filter by mask.
    """
    valid = np.asarray(table.valid)
    out = {}
    for name in ("x", "y", "sigma", "theta", "response", "level", "ftype"):
        out[name] = np.asarray(getattr(table, name))[valid]
    out["desc"] = np.asarray(table.desc)[valid]
    return out


def keypoint_buffer(feats: dict) -> np.ndarray:
    """Pack the reference SiftKeypoint host buffer: 6 floats per keypoint
    (x, y, s, o, response, level<<16|type reinterpreted) - SiftGPU.h:108-122.

    The last item stores level and type as two u16s in one float's bits.
    """
    n = feats["x"].shape[0]
    buf = np.zeros((n, 6), dtype=np.float32)
    buf[:, 0] = feats["x"]
    buf[:, 1] = feats["y"]
    buf[:, 2] = feats["sigma"]
    buf[:, 3] = feats["theta"]
    buf[:, 4] = feats["response"]
    packed = (feats["level"].astype(np.uint32) & 0xFFFF) | (
        (feats["ftype"].astype(np.uint32) & 0xFFFF) << 16)
    buf[:, 5] = packed.view(np.float32) if packed.dtype == np.uint32 else 0
    return buf
