"""Pallas per-keypoint kernels vs the jnp reference implementations
(interpret mode on CPU; the same comparison runs compiled on real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hessgpu_tpu.ops.descriptor import (compute_descriptors,
                                        descriptor_window_size)
from hessgpu_tpu.ops.orientation import compute_orientations
from hessgpu_tpu.ops.pallas.patch import (build_padded_stack,
                                          descriptor_pallas,
                                          orientation_pallas)


@pytest.fixture(scope="module")
def scene(rng=None):
    rng = np.random.RandomState(7)
    levels = [(64, 96), (64, 96), (32, 48)]
    grads = [jnp.asarray(rng.rand(*s).astype(np.float32)) for s in levels]
    rots = [jnp.asarray(((rng.rand(*s) * 2 - 1) * np.pi).astype(np.float32))
            for s in levels]
    # keypoints spread across levels, including some near borders
    kx = np.array([30.2, 80.1, 5.5, 20.7, 40.0, 10.0], np.float32)
    ky = np.array([30.7, 50.3, 6.1, 25.2, 20.0, 28.0], np.float32)
    ks = np.array([2.0, 2.5, 1.8, 3.1, 2.2, 2.0], np.float32)
    kt = np.array([0.3, 1.2, 5.9, 2.2, 0.0, 4.0], np.float32)
    lid = np.array([0, 0, 1, 1, 2, 2], np.int32)
    valid = np.array([1, 1, 1, 1, 1, 0], bool)
    return grads, rots, kx, ky, ks, kt, lid, valid


def test_descriptor_pallas_matches_reference(scene):
    grads, rots, kx, ky, ks, kt, lid, valid = scene
    wsize = descriptor_window_size(float(ks.max()))
    pad = (wsize - 1) // 2 + 1
    ps = build_padded_stack(grads, rots, pad)

    got = np.asarray(descriptor_pallas(
        jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(ks), jnp.asarray(kt),
        jnp.asarray(valid), jnp.asarray(lid), ps,
        wsize=wsize, pad=pad, interpret=True))

    # reference: per-level jnp implementation. Invalid slots are
    # UNSPECIFIED (the kernel skips their stores; callers mask with
    # `where(valid, desc, 0)`), so only valid slots are compared.
    for i in range(len(kx)):
        if not valid[i]:
            continue
        want = np.asarray(compute_descriptors(
            jnp.asarray(kx[i:i + 1]), jnp.asarray(ky[i:i + 1]),
            jnp.asarray(ks[i:i + 1]), jnp.asarray(kt[i:i + 1]),
            jnp.ones(1, bool), grads[lid[i]], rots[lid[i]],
            wsize=min(wsize, *grads[lid[i]].shape), normalize=False))[0]
        np.testing.assert_allclose(got[i], want, atol=2e-3,
                                   err_msg=f"keypoint {i}")


def test_orientation_pallas_matches_reference(scene):
    grads, rots, kx, ky, ks, kt, lid, valid = scene
    wsize = 2 * int(np.ceil(ks.max() * 1.5 * 2.0 + 1)) + 1
    pad = (wsize - 1) // 2 + 1
    ps = build_padded_stack(grads, rots, pad)

    for cap in (2, 4):  # -m cap must agree between jnp and Pallas paths
        thetas, ovalid = orientation_pallas(
            jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(ks),
            jnp.asarray(valid), jnp.asarray(lid), ps,
            wsize=wsize, pad=pad, max_peaks=cap, interpret=True)
        thetas, ovalid = np.asarray(thetas), np.asarray(ovalid)

        for i in range(len(kx)):
            want = compute_orientations(
                jnp.asarray(kx[i:i + 1]), jnp.asarray(ky[i:i + 1]),
                jnp.asarray(ks[i:i + 1]), jnp.ones(1, bool),
                grads[lid[i]], rots[lid[i]],
                wsize=min(wsize, *grads[lid[i]].shape),
                num_orientations=cap)
            wth = np.asarray(want.thetas[0])
            wv = np.asarray(want.valid[0])
            if not valid[i]:
                assert not ovalid[i].any()
                continue
            assert ovalid[i].sum() <= cap
            np.testing.assert_array_equal(ovalid[i], wv,
                                          err_msg=f"kp {i} cap {cap}")
            np.testing.assert_allclose(thetas[i][wv], wth[wv], atol=1e-4,
                                       err_msg=f"kp {i} cap {cap}")


def test_orientation_pallas_single_mode(scene):
    grads, rots, kx, ky, ks, kt, lid, valid = scene
    wsize = 2 * int(np.ceil(ks.max() * 1.5 * 2.0 + 1)) + 1
    pad = (wsize - 1) // 2 + 1
    ps = build_padded_stack(grads, rots, pad)
    thetas, ovalid = orientation_pallas(
        jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(ks),
        jnp.asarray(valid), jnp.asarray(lid), ps,
        wsize=wsize, pad=pad, single=True, interpret=True)
    thetas, ovalid = np.asarray(thetas), np.asarray(ovalid)
    for i in range(len(kx)):
        if not valid[i]:
            continue
        want = compute_orientations(
            jnp.asarray(kx[i:i + 1]), jnp.asarray(ky[i:i + 1]),
            jnp.asarray(ks[i:i + 1]), jnp.ones(1, bool),
            grads[lid[i]], rots[lid[i]],
            wsize=min(wsize, *grads[lid[i]].shape), single=True)
        np.testing.assert_allclose(thetas[i, 0], float(want.thetas[0, 0]),
                                   atol=1e-4, err_msg=f"kp {i}")


def test_descriptor_mxu_matches_vpu(scene):
    """mxu=True (one dot_general per keypoint) vs the VPU reduction path:
    same taps up to f32 summation order."""
    grads, rots, kx, ky, ks, kt, lid, valid = scene
    wsize = descriptor_window_size(float(ks.max()))
    pad = (wsize - 1) // 2 + 1
    ps = build_padded_stack(grads, rots, pad)
    tab = (jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(ks),
           jnp.asarray(kt), jnp.asarray(valid), jnp.asarray(lid))
    d0 = descriptor_pallas(*tab, ps, wsize=wsize, pad=pad, interpret=True)
    d1 = descriptor_pallas(*tab, ps, wsize=wsize, pad=pad, mxu=True,
                           interpret=True)
    # Invalid-slot rows are unspecified (stale scratch bytes when compiled
    # on real hardware) — only valid rows carry the contract.
    v = np.asarray(valid).astype(bool)
    np.testing.assert_allclose(np.asarray(d1)[v], np.asarray(d0)[v],
                               rtol=1e-5, atol=1e-5)


def test_descriptor_pallas_bf16_stack(scene):
    """bf16 canvas storage (cfg.canvas_bf16): the kernel must equal the
    jnp reference computed on identically bf16-quantized grad/rot maps -
    storage quantization is the ONLY difference, math stays f32."""
    grads, rots, kx, ky, ks, kt, lid, valid = scene
    wsize = descriptor_window_size(float(ks.max()))
    pad = (wsize - 1) // 2 + 1
    ps = build_padded_stack(grads, rots, pad, dtype=jnp.bfloat16)
    assert ps.grad.dtype == jnp.bfloat16

    got = np.asarray(descriptor_pallas(
        jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(ks), jnp.asarray(kt),
        jnp.asarray(valid), jnp.asarray(lid), ps,
        wsize=wsize, pad=pad, interpret=True))

    q = lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
    for i in range(len(kx)):
        if not valid[i]:
            continue
        want = np.asarray(compute_descriptors(
            jnp.asarray(kx[i:i + 1]), jnp.asarray(ky[i:i + 1]),
            jnp.asarray(ks[i:i + 1]), jnp.asarray(kt[i:i + 1]),
            jnp.ones(1, bool), q(grads[lid[i]]), q(rots[lid[i]]),
            wsize=min(wsize, *grads[lid[i]].shape), normalize=False))[0]
        np.testing.assert_allclose(got[i], want, atol=2e-3,
                                   err_msg=f"keypoint {i}")


def test_orientation_pallas_bf16_stack(scene):
    grads, rots, kx, ky, ks, kt, lid, valid = scene
    wsize = 2 * int(np.ceil(ks.max() * 1.5 * 2.0 + 1)) + 1
    pad = (wsize - 1) // 2 + 1
    ps = build_padded_stack(grads, rots, pad, dtype=jnp.bfloat16)
    thetas, ovalid = orientation_pallas(
        jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(ks),
        jnp.asarray(valid), jnp.asarray(lid), ps,
        wsize=wsize, pad=pad, single=True, interpret=True)
    q = lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
    for i in range(len(kx)):
        if not valid[i]:
            continue
        want = compute_orientations(
            jnp.asarray(kx[i:i + 1]), jnp.asarray(ky[i:i + 1]),
            jnp.asarray(ks[i:i + 1]), jnp.ones(1, bool),
            q(grads[lid[i]]), q(rots[lid[i]]),
            wsize=min(wsize, *grads[lid[i]].shape), single=True)
        np.testing.assert_allclose(
            np.asarray(thetas)[i, 0], float(want.thetas[0, 0]),
            atol=1e-4, err_msg=f"kp {i}")
