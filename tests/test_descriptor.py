"""Descriptor vs. a direct NumPy port of the kernel semantics
(reference ComputeDescriptor_Kernel, ProgramCU.cu:1650-1804)."""

import numpy as np
import jax.numpy as jnp

from hessgpu_tpu.ops.descriptor import (compute_descriptors,
                                        descriptor_window_size,
                                        normalize_descriptors)

PI = np.pi


def np_descriptor(kx, ky, sigma, theta, grad, rot, window_factor=3.0):
    """Scalar per-cell loops exactly like the CUDA kernel."""
    h, w = grad.shape
    spt = abs(sigma * window_factor)
    c, s = np.cos(theta), np.sin(theta)
    anglef = theta - 2 * PI if theta > PI else theta
    cspt, sspt = c * spt, s * spt
    crspt, srspt = c / spt, s / spt
    desc = np.zeros((4, 4, 8), np.float64)
    bsz = abs(cspt) + abs(sspt)
    for iy in range(4):
        for ix in range(4):
            ox, oy = ix - 1.5, iy - 1.5
            ptx = cspt * ox - sspt * oy + kx
            pty = cspt * oy + sspt * ox + ky
            xmin = max(1.5, np.floor(ptx - bsz) + 0.5)
            ymin = max(1.5, np.floor(pty - bsz) + 0.5)
            xmax = min(w - 1.5, np.floor(ptx + bsz) + 0.5)
            ymax = min(h - 1.5, np.floor(pty + bsz) + 0.5)
            des = np.zeros(9)
            y = ymin
            while y <= ymax:
                x = xmin
                while x <= xmax:
                    dx = x - ptx
                    dy = y - pty
                    nx = crspt * dx + srspt * dy
                    ny = crspt * dy - srspt * dx
                    if abs(nx) < 1.0 and abs(ny) < 1.0:
                        mag = grad[int(y), int(x)]
                        ang = rot[int(y), int(x)]
                        dnx = nx + ox
                        dny = ny + oy
                        ww = np.exp(-0.125 * (dnx * dnx + dny * dny))
                        wx = 1.0 - abs(nx)
                        wy = 1.0 - abs(ny)
                        weight = ww * wx * wy * mag
                        th = (anglef - ang) * (4.0 / PI)
                        if th < 0:
                            th += 8.0
                        fo = int(np.floor(th))
                        w1 = fo + 1.0 - th
                        w2 = th - fo
                        des[fo] += w1 * weight
                        des[fo + 1] += w2 * weight
                    x += 1.0
                y += 1.0
            des[0] += des[8]
            desc[iy, ix] = des[:8]
    return desc.reshape(128)


def test_descriptor_matches_numpy(rng):
    h = w = 96
    grad = rng.rand(h, w).astype(np.float32)
    rot = ((rng.rand(h, w).astype(np.float32) * 2 - 1) * PI)
    cases = [
        (48.3, 47.6, 2.0, 0.0),
        (40.1, 52.9, 2.5, 1.1),
        (50.0, 44.0, 1.7, 4.9),   # theta > pi branch
        (30.0, 30.0, 3.1, 2.2),
    ]
    kx = np.array([c[0] for c in cases], np.float32)
    ky = np.array([c[1] for c in cases], np.float32)
    ks = np.array([c[2] for c in cases], np.float32)
    kt = np.array([c[3] for c in cases], np.float32)
    wsize = descriptor_window_size(float(ks.max()))
    got = np.asarray(compute_descriptors(
        jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(ks), jnp.asarray(kt),
        jnp.ones(4, bool), jnp.asarray(grad), jnp.asarray(rot),
        wsize=wsize, normalize=False))
    for i, (x, y, s, t) in enumerate(cases):
        want = np_descriptor(x, y, s, t, grad, rot)
        np.testing.assert_allclose(got[i], want, atol=2e-4,
                                   err_msg=f"case {i}")


def test_descriptor_near_border(rng):
    """Keypoints whose support hits the image border must match the
    clamped-window reference behavior."""
    h = w = 64
    grad = rng.rand(h, w).astype(np.float32)
    rot = ((rng.rand(h, w).astype(np.float32) * 2 - 1) * PI)
    cases = [(5.0, 6.0, 2.0, 0.5), (60.0, 58.0, 2.0, 3.0)]
    kx = np.array([c[0] for c in cases], np.float32)
    ky = np.array([c[1] for c in cases], np.float32)
    ks = np.array([c[2] for c in cases], np.float32)
    kt = np.array([c[3] for c in cases], np.float32)
    wsize = min(descriptor_window_size(2.0), h, w)
    got = np.asarray(compute_descriptors(
        jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(ks), jnp.asarray(kt),
        jnp.ones(2, bool), jnp.asarray(grad), jnp.asarray(rot),
        wsize=wsize, normalize=False))
    for i, (x, y, s, t) in enumerate(cases):
        want = np_descriptor(x, y, s, t, grad, rot)
        np.testing.assert_allclose(got[i], want, atol=2e-4)


def test_normalization():
    d = np.abs(np.random.RandomState(0).randn(5, 128)).astype(np.float32)
    out = np.asarray(normalize_descriptors(jnp.asarray(d)))
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # reference semantics: clamp at 0.2 then renormalize
    n1 = d / np.linalg.norm(d, axis=1, keepdims=True)
    cl = np.minimum(n1, 0.2)
    want = cl / np.linalg.norm(cl, axis=1, keepdims=True)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_half_sift_folding(rng):
    h = w = 64
    grad = rng.rand(h, w).astype(np.float32)
    rot = ((rng.rand(h, w).astype(np.float32) * 2 - 1) * PI)
    kx = jnp.asarray([32.0])
    ky = jnp.asarray([32.0])
    ks = jnp.asarray([2.0])
    kt = jnp.asarray([0.3])
    wsize = descriptor_window_size(2.0)
    full = np.asarray(compute_descriptors(
        kx, ky, ks, kt, jnp.ones(1, bool), jnp.asarray(grad),
        jnp.asarray(rot), wsize=wsize, normalize=False))
    half = np.asarray(compute_descriptors(
        kx, ky, ks, kt, jnp.ones(1, bool), jnp.asarray(grad),
        jnp.asarray(rot), wsize=wsize, normalize=False, half_sift=True))
    want = (full.reshape(16, 8)[:, :4] + full.reshape(16, 8)[:, 4:]).reshape(64)
    np.testing.assert_allclose(half[0], want, atol=1e-5)
