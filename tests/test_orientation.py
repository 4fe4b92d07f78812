"""Orientation histogram vs. a direct NumPy port of the kernel semantics
(reference ComputeOrientation_Kernel, ProgramCU.cu:1324-1489)."""

import numpy as np
import jax.numpy as jnp

from hessgpu_tpu.ops.orientation import compute_orientations

TWO_PI = 2.0 * np.pi
BPR = 36.0 / TWO_PI


def np_orientation_hist(kx, ky, sigma, grad, rot,
                        gaussian_factor=1.5, window_factor=2.0):
    """Semantics-level NumPy reference: scalar loops like the CUDA kernel."""
    h, w = grad.shape
    gsigma = sigma * gaussian_factor
    win = abs(sigma) * gaussian_factor * window_factor
    dist_threshold = win * win + 0.5
    factor = -0.5 / (gsigma * gsigma)
    xmin = max(1.5, np.floor(kx - win) + 0.5)
    ymin = max(1.5, np.floor(ky - win) + 0.5)
    xmax = min(w - 1.5, np.floor(kx + win) + 0.5)
    ymax = min(h - 1.5, np.floor(ky + win) + 0.5)
    votes = np.zeros(36)
    y = ymin
    while y <= ymax:
        x = xmin
        while x <= xmax:
            dx = x - kx
            dy = y - ky
            sq = dx * dx + dy * dy
            if sq < dist_threshold:
                g = grad[int(y), int(x)]
                r = rot[int(y), int(x)]
                o = int(np.floor(r * BPR))
                if o < 0:
                    o += 36
                votes[o % 36] += g * np.exp(sq * factor)
            x += 1.0
        y += 1.0
    return votes


def np_smooth6(votes):
    v = votes.copy()
    for _ in range(6):
        v = (np.roll(v, 1) + v + np.roll(v, -1)) / 3.0
    return v


def np_single_peak(votes):
    imax = int(np.argmax(votes))
    vmax = votes[imax]
    pre = votes[(imax - 1) % 36]
    nxt = votes[(imax + 1) % 36]
    off = 0.5 * (nxt - pre) / (vmax + vmax - nxt - pre)
    return (imax + 0.5 + off) / BPR


def _random_grad_field(rng, h=64, w=64):
    grad = rng.rand(h, w).astype(np.float32)
    rot = (rng.rand(h, w).astype(np.float32) * 2 - 1) * np.pi
    return grad, rot


def test_single_orientation_matches_numpy(rng):
    grad, rot = _random_grad_field(rng)
    kxs = np.array([20.3, 40.7, 12.1], np.float32)
    kys = np.array([25.8, 30.2, 50.9], np.float32)
    sig = np.array([2.0, 3.1, 1.7], np.float32)
    valid = np.ones(3, bool)

    res = compute_orientations(
        jnp.asarray(kxs), jnp.asarray(kys), jnp.asarray(sig),
        jnp.asarray(valid), jnp.asarray(grad), jnp.asarray(rot),
        wsize=31, single=True)
    for i in range(3):
        votes = np_orientation_hist(kxs[i], kys[i], sig[i], grad, rot)
        want = np_single_peak(np_smooth6(votes))
        got = float(res.thetas[i, 0])
        assert abs(got - want) < 1e-3, (i, got, want)


def test_multi_orientation_quantization(rng):
    """Multi path returns 8-bit-quantized peaks sorted by vote."""
    grad, rot = _random_grad_field(rng)
    kx, ky, sig = 32.2, 31.7, 2.5
    res = compute_orientations(
        jnp.asarray([kx]), jnp.asarray([ky]), jnp.asarray([sig]),
        jnp.asarray([True]), jnp.asarray(grad), jnp.asarray(rot),
        wsize=31, num_orientations=2)
    votes = np_smooth6(np_orientation_hist(kx, ky, sig, grad, rot))
    vmax = votes.max()
    # collect reference peaks
    peaks = []
    for i in range(36):
        pre, nxt = votes[(i - 1) % 36], votes[(i + 1) % 36]
        if votes[i] > 0.8 * vmax and votes[i] > pre and votes[i] > nxt:
            di = 0.5 * (nxt - pre) / (votes[i] * 2 - nxt - pre)
            frac = (i + di + 0.5) / 36.0
            if frac < 0:
                frac += 1.0
            peaks.append((votes[i], np.floor(frac * 255.0) * TWO_PI / 255.0))
    peaks.sort(key=lambda t: -t[0])
    got_valid = np.asarray(res.valid[0])
    got_thetas = np.asarray(res.thetas[0])
    assert got_valid.sum() == min(len(peaks), 4)
    for i, (_, th) in enumerate(peaks[:4]):
        assert abs(got_thetas[i] - th) < 1e-5


def test_dominant_gradient_direction():
    """A field with uniform gradient direction yields that orientation."""
    h = w = 64
    grad = np.ones((h, w), np.float32)
    angle = 0.7
    rot = np.full((h, w), angle, np.float32)
    res = compute_orientations(
        jnp.asarray([32.5]), jnp.asarray([32.5]), jnp.asarray([2.0]),
        jnp.asarray([True]), jnp.asarray(grad), jnp.asarray(rot),
        wsize=31, single=True)
    # peak should be within one bin (10 deg) of the true angle
    assert abs(float(res.thetas[0, 0]) - angle) < TWO_PI / 36


def test_invalid_keypoints_masked(rng):
    grad, rot = _random_grad_field(rng)
    res = compute_orientations(
        jnp.asarray([20.0, 30.0]), jnp.asarray([20.0, 30.0]),
        jnp.asarray([2.0, 2.0]), jnp.asarray([True, False]),
        jnp.asarray(grad), jnp.asarray(rot), wsize=31, num_orientations=2)
    assert not np.asarray(res.valid[1]).any()
