"""Gaussian filtering vs. NumPy reference implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from hessgpu_tpu.params import (ScaleSpaceParams, gaussian_filter_width,
                                gaussian_taps)
from hessgpu_tpu.ops.gaussian import (blur, build_octave_chain,
                                      build_octave_direct, conv1d_clamped)


def np_conv1d_clamped(x, taps, axis):
    """NumPy reference: clamp-to-edge 1-D correlation."""
    r = len(taps) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = np.pad(x, pad, mode="edge")
    out = np.zeros_like(x)
    for i, t in enumerate(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + x.shape[axis])
        out += t * xp[tuple(sl)]
    return out


def test_filter_width_matches_reference():
    # reference: width = 2*ceil(4*sigma - 0.5)+1 clamped to [5, 33]
    assert gaussian_filter_width(0.5) == 5
    assert gaussian_filter_width(1.6) == 13
    assert gaussian_filter_width(10.0) == 33
    # width is always odd
    for s in np.linspace(0.2, 12.0, 50):
        w = gaussian_filter_width(float(s))
        assert w % 2 == 1 and 5 <= w <= 33


def test_taps_normalized():
    for sigma in (0.8, 1.226, 1.6, 2.0, 3.2, 5.0):
        taps = gaussian_taps(sigma)
        assert abs(sum(taps) - 1.0) < 1e-6
        # symmetric
        np.testing.assert_allclose(taps, taps[::-1], rtol=1e-12)


def test_conv1d_matches_numpy(rng):
    x = rng.rand(37, 53).astype(np.float32)
    taps = gaussian_taps(1.6)
    for axis in (0, 1):
        got = np.asarray(conv1d_clamped(jnp.asarray(x), taps, axis=axis))
        want = np_conv1d_clamped(x, taps, axis=axis)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_blur_separable(rng):
    x = rng.rand(64, 48).astype(np.float32)
    got = np.asarray(blur(jnp.asarray(x), 1.6))
    taps = gaussian_taps(1.6)
    want = np_conv1d_clamped(np_conv1d_clamped(x, taps, 1), taps, 0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_octave_chain_shapes(rng):
    p = ScaleSpaceParams()
    x = rng.rand(32, 40).astype(np.float32)
    stack = build_octave_chain(jnp.asarray(x), p)
    assert stack.shape == (p.num_levels, 32, 40)
    # level 0 is the unmodified base
    np.testing.assert_array_equal(np.asarray(stack[0]), x)
    # blur monotonically smooths: variance decreases with level
    vars_ = [float(jnp.var(stack[i])) for i in range(p.num_levels)]
    assert all(vars_[i] >= vars_[i + 1] for i in range(len(vars_) - 1))


def test_direct_close_to_chain(rng):
    """Direct-from-base mode approximates the chained schedule."""
    p = ScaleSpaceParams()
    x = rng.rand(64, 64).astype(np.float32)
    chain = np.asarray(build_octave_chain(jnp.asarray(x), p))
    direct = np.asarray(build_octave_direct(jnp.asarray(x), p))
    # white noise is the worst case for truncation differences; real images
    # are far closer. Bound the noise case loosely and the mean tightly.
    assert np.max(np.abs(chain - direct)) < 0.15
    d = np.abs(chain - direct)[:, 8:-8, 8:-8]
    assert d.mean() < 5e-3


def test_sigma_schedule_reference_values():
    """Hessian personality schedule (reference SiftGPU.cpp:499-556)."""
    p = ScaleSpaceParams()
    assert p.level_min == 0 and p.level_max == 4 and p.num_levels == 5
    assert abs(p.base_sigma - 1.6) < 1e-6
    # incremental sigmas: dsigma0 * k^i with dsigma0 = 1.6*sqrt(k^2-1)
    k = 2 ** (1 / 3)
    d0 = 1.6 * np.sqrt(k * k - 1)
    incs = p.incremental_sigmas()
    for i, s in enumerate(incs):
        assert abs(s - d0 * k ** i) < 1e-6
    # initial blur for octave 0: sqrt(1.6^2 - 0.5^2)
    assert abs(p.initial_blur_sigma(0) - np.sqrt(1.6 ** 2 - 0.25)) < 1e-6
    # no restart blur needed for the default layout
    assert p.octave_restart_sigma() == 0.0
    # level sigma
    assert abs(p.level_sigma(3) - 3.2) < 1e-6
