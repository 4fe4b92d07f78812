"""Rect (unrotated rectangle) descriptor vs NumPy reference semantics
(ComputeDescriptorRECT_Kernel, ProgramCU.cu:1811-1948)."""

import numpy as np
import jax.numpy as jnp

from hessgpu_tpu.ops.descriptor import compute_descriptors_rect

PI = np.pi


def np_rect_descriptor(kx, ky, rw, rh, grad, rot):
    h, w = grad.shape
    sptx = rw * 0.25
    spty = rh * 0.25
    desc = np.zeros((4, 4, 8))
    for iy in range(4):
        for ix in range(4):
            ptx = sptx * (ix + 0.5) + kx
            pty = spty * (iy + 0.5) + ky
            xmin = max(1.5, np.floor(ptx - sptx) + 0.5)
            ymin = max(1.5, np.floor(pty - spty) + 0.5)
            xmax = min(w - 1.5, np.floor(ptx + sptx) + 0.5)
            ymax = min(h - 1.5, np.floor(pty + spty) + 0.5)
            des = np.zeros(9)
            y = ymin
            while y <= ymax:
                x = xmin
                while x <= xmax:
                    nx = (x - ptx) / sptx
                    ny = (y - pty) / spty
                    if abs(nx) < 1 and abs(ny) < 1:
                        mag = grad[int(y), int(x)]
                        ang = rot[int(y), int(x)]
                        weight = (1 - abs(nx)) * (1 - abs(ny)) * mag
                        th = (-ang) * 4.0 / PI
                        if th < 0:
                            th += 8.0
                        fo = int(np.floor(th))
                        des[fo] += (fo + 1 - th) * weight
                        des[fo + 1] += (th - fo) * weight
                    x += 1.0
                y += 1.0
            des[0] += des[8]
            desc[iy, ix] = des[:8]
    return desc.reshape(128)


def test_rect_descriptor_matches_numpy(rng):
    h = w = 96
    grad = rng.rand(h, w).astype(np.float32)
    rot = ((rng.rand(h, w) * 2 - 1) * PI).astype(np.float32)
    cases = [(20.0, 25.0, 24.0, 16.0), (50.5, 40.25, 12.0, 12.0)]
    kx = np.array([c[0] for c in cases], np.float32)
    ky = np.array([c[1] for c in cases], np.float32)
    rws = np.array([c[2] for c in cases], np.float32)
    rhs = np.array([c[3] for c in cases], np.float32)
    got = np.asarray(compute_descriptors_rect(
        jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(rws), jnp.asarray(rhs),
        jnp.ones(2, bool), jnp.asarray(grad), jnp.asarray(rot),
        wsize=41, normalize=False))
    for i, (x, y, rw_, rh_) in enumerate(cases):
        want = np_rect_descriptor(x, y, rw_, rh_, grad, rot)
        np.testing.assert_allclose(got[i], want, atol=2e-4, err_msg=f"{i}")


def test_describe_rectangles_service(gray_small):
    from hessgpu_tpu import SiftConfig
    from hessgpu_tpu.describe import describe_rectangles
    rects = np.array([
        [40.0, 50.0, 24.0, 24.0],
        [100.0, 60.0, 48.0, 36.0],
        [20.0, 100.0, 16.0, 16.0],
    ], np.float32)
    out = describe_rectangles(gray_small, rects, SiftConfig())
    assert out["desc"].shape == (3, 128)
    norms = np.linalg.norm(out["desc"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
