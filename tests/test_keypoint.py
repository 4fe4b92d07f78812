"""Hessian response + keypoint test vs. NumPy reference implementations."""

import numpy as np
import jax.numpy as jnp

from hessgpu_tpu.ops.hessian import hessian_response_and_gradient
from hessgpu_tpu.ops.keypoint import (TYPE_BRIGHT_BLOB, TYPE_DARK_BLOB,
                                      TYPE_SADDLE, detect_keypoints_level)


def np_hessian_response(g, norm):
    """Direct per-pixel stencil (reference ProgramCU.cu:522-562)."""
    h, w = g.shape
    gp = np.pad(g, 1, mode="edge")
    out = np.zeros_like(g)
    grad = np.zeros_like(g)
    rot = np.zeros_like(g)
    for r in range(h):
        for c in range(w):
            v11, v12, v13 = gp[r, c], gp[r, c + 1], gp[r, c + 2]
            v21, v22, v23 = gp[r + 1, c], gp[r + 1, c + 1], gp[r + 1, c + 2]
            v31, v32, v33 = gp[r + 2, c], gp[r + 2, c + 1], gp[r + 2, c + 2]
            lxx = v21 - 2 * v22 + v23
            lyy = v12 - 2 * v22 + v32
            lxy = (v13 - v11 + v31 - v33) * 0.25
            out[r, c] = (lxx * lyy - lxy * lxy) * norm
            dx = v23 - v21
            dy = v32 - v12
            grad[r, c] = 0.5 * np.sqrt(dx * dx + dy * dy)
            rot[r, c] = 0.0 if grad[r, c] == 0 else np.arctan2(dy, dx)
    return out, grad, rot


def test_hessian_response_matches_numpy(rng):
    g = rng.rand(3, 20, 24).astype(np.float32)
    norms = [1.0, 2.5, 0.7]
    resp, grad, rot = hessian_response_and_gradient(jnp.asarray(g), norms)
    for l in range(3):
        want, wgrad, wrot = np_hessian_response(g[l], norms[l])
        np.testing.assert_allclose(np.asarray(resp[l]), want, atol=1e-5)
        np.testing.assert_allclose(np.asarray(grad[l]), wgrad, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rot[l]), wrot, atol=1e-5)


def _single_blob_volume(h=32, w=32, sign=1.0):
    """Response volume with one clean extremum at (16, 16) in the middle
    level, plus a Gaussian image whose Lxx sign sets the blob type."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bump = np.exp(-((yy - 16) ** 2 + (xx - 16) ** 2) / 8.0)
    vol = np.stack([0.5 * bump, 1.0 * bump, 0.6 * bump]) * sign
    return vol


def test_detects_single_maximum():
    vol = _single_blob_volume()
    gauss = -_single_blob_volume()[1]  # dark blob: Lxx of gaussian > 0
    m = detect_keypoints_level(
        jnp.asarray(vol[0]), jnp.asarray(vol[1]), jnp.asarray(vol[2]),
        jnp.asarray(gauss), threshold=0.01, edge_threshold=10.0,
        subpixel=True, hessian=True)
    valid = np.asarray(m.valid)
    assert valid.sum() == 1
    r, c = np.argwhere(valid)[0]
    assert (r, c) == (16, 16)
    assert np.asarray(m.ftype)[r, c] == TYPE_DARK_BLOB
    # center is symmetric: offsets ~ 0
    assert abs(np.asarray(m.dx)[r, c]) < 1e-3
    assert abs(np.asarray(m.dy)[r, c]) < 1e-3


def test_detects_minimum_as_saddle():
    vol = _single_blob_volume(sign=-1.0)
    gauss = _single_blob_volume()[1]
    m = detect_keypoints_level(
        jnp.asarray(vol[0]), jnp.asarray(vol[1]), jnp.asarray(vol[2]),
        jnp.asarray(gauss), threshold=0.01, edge_threshold=10.0,
        subpixel=True, hessian=True)
    valid = np.asarray(m.valid)
    assert valid.sum() == 1
    r, c = np.argwhere(valid)[0]
    # negative response -> saddle point (reference ProgramCU.cu:839-842)
    assert np.asarray(m.ftype)[r, c] == TYPE_SADDLE
    assert np.asarray(m.response)[r, c] < 0


def test_sign_inconsistent_extrema_rejected():
    """Hessian personality: a local maximum with negative response is not a
    keypoint (READ_CMP_DOG_DATA response<0 test, ProgramCU.cu:663-678)."""
    vol = _single_blob_volume() - 2.0  # max at center but all values < 0
    gauss = _single_blob_volume()[1]
    m = detect_keypoints_level(
        jnp.asarray(vol[0]), jnp.asarray(vol[1]), jnp.asarray(vol[2]),
        jnp.asarray(gauss), threshold=0.01, edge_threshold=10.0,
        subpixel=False, hessian=True)
    assert np.asarray(m.valid).sum() == 0
    # the DoG personality accepts it
    m2 = detect_keypoints_level(
        jnp.asarray(vol[0]), jnp.asarray(vol[1]), jnp.asarray(vol[2]),
        jnp.asarray(gauss), threshold=0.01, edge_threshold=10.0,
        subpixel=False, hessian=False)
    assert np.asarray(m2.valid).sum() == 1


def test_threshold_rejects():
    vol = _single_blob_volume() * 0.001
    gauss = _single_blob_volume()[1]
    m = detect_keypoints_level(
        jnp.asarray(vol[0]), jnp.asarray(vol[1]), jnp.asarray(vol[2]),
        jnp.asarray(gauss), threshold=0.01, edge_threshold=10.0,
        subpixel=True, hessian=True)
    assert np.asarray(m.valid).sum() == 0


def test_edge_rejection():
    """A ridge (edge-like response) must be rejected by the trace/det test."""
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ridge = np.exp(-((yy - 16) ** 2) / 4.0)  # constant along x
    # break x-translation symmetry slightly so there is a unique max
    ridge = ridge * (1.0 + 0.001 * np.exp(-((xx - 16) ** 2) / 100.0))
    vol = np.stack([0.5 * ridge, ridge, 0.6 * ridge])
    m = detect_keypoints_level(
        jnp.asarray(vol[0]), jnp.asarray(vol[1]), jnp.asarray(vol[2]),
        jnp.asarray(vol[1]), threshold=0.01, edge_threshold=10.0,
        subpixel=False, hessian=True)
    assert np.asarray(m.valid).sum() == 0


def test_subpixel_offset_recovers_shift():
    """Extremum shifted a fraction off-grid -> dx/dy recover the shift."""
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = 16.3, 15.8
    bump = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 10.0)
    vol = np.stack([0.6 * bump, bump, 0.6 * bump])
    m = detect_keypoints_level(
        jnp.asarray(vol[0]), jnp.asarray(vol[1]), jnp.asarray(vol[2]),
        jnp.asarray(-vol[1]), threshold=0.01, edge_threshold=10.0,
        subpixel=True, hessian=True)
    valid = np.asarray(m.valid)
    assert valid.sum() == 1
    r, c = np.argwhere(valid)[0]
    assert abs(c + np.asarray(m.dx)[r, c] - cx) < 0.05
    assert abs(r + np.asarray(m.dy)[r, c] - cy) < 0.05


def test_borders_never_fire():
    vol = np.ones((3, 16, 16), np.float32)
    vol[1] += 1.0  # middle level dominates everywhere
    m = detect_keypoints_level(
        jnp.asarray(vol[0]), jnp.asarray(vol[1]), jnp.asarray(vol[2]),
        jnp.asarray(vol[1]), threshold=0.01, edge_threshold=10.0,
        subpixel=False, hessian=True)
    v = np.asarray(m.valid)
    assert not v[0, :].any() and not v[-1, :].any()
    assert not v[:, 0].any() and not v[:, -1].any()
