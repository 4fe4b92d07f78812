"""Fused Pallas detection kernel vs the jnp reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hessgpu_tpu.ops.hessian import hessian_response_and_gradient
from hessgpu_tpu.ops.keypoint import detect_keypoints_level
from hessgpu_tpu.ops.pallas.detect import detect_octave_pallas
from hessgpu_tpu.params import ScaleSpaceParams
from hessgpu_tpu.ops.gaussian import build_octave_chain


@pytest.fixture(scope="module")
def octave():
    rng = np.random.RandomState(3)
    import jax
    base = jnp.asarray(rng.rand(160, 200).astype(np.float32))
    p = ScaleSpaceParams()
    return build_octave_chain(base, p), p


@pytest.mark.parametrize("subpixel", [True, False])
def test_fused_detect_matches_reference(octave, subpixel):
    gauss, p = octave
    norms = [(p.level_sigma(l) ** 4) for l in range(p.num_levels)]
    maps_p, grad_p, rot_p = detect_octave_pallas(
        gauss, norms, p.key_levels, threshold=p.threshold,
        edge_threshold=p.edge_threshold, subpixel=subpixel, interpret=True)

    resp, grad, rot = hessian_response_and_gradient(
        gauss, norms, grad_levels=p.key_levels)
    import jax
    for i, kl in enumerate(p.key_levels):
        want = detect_keypoints_level(
            resp[kl - 1], resp[kl], resp[kl + 1], gauss[kl],
            threshold=p.threshold, edge_threshold=p.edge_threshold,
            subpixel=subpixel, hessian=True)
        got = jax.tree.map(lambda a: a[i], maps_p)
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(want.valid),
                                      err_msg=f"level {kl}")
        v = np.asarray(want.valid)
        np.testing.assert_allclose(np.asarray(got.response)[v],
                                   np.asarray(want.response)[v], atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.dx)[v],
                                   np.asarray(want.dx)[v], atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.ds)[v],
                                   np.asarray(want.ds)[v], atol=1e-4)
        np.testing.assert_array_equal(np.asarray(got.ftype)[v],
                                      np.asarray(want.ftype)[v])
        np.testing.assert_allclose(np.asarray(grad_p[i]),
                                   np.asarray(grad[kl]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(rot_p[i]),
                                   np.asarray(rot[kl]), atol=1e-5)
