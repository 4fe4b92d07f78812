"""The conv chain's detect_pad handoff: octave_chain_pallas emits the
detect kernel's edge-padded input layout directly (no jnp.pad HBM round
trip between the kernels), the MXU downsample reads the padded plane via
selection-matrix offsets, and detect_octave_pallas(prepadded=) consumes
the layout in place - all pinned bit-identical to the separate-pad path
in interpret mode. Reference: the pad between BuildPyramid and
ComputeKEY is implicit texture clamping in the reference
(ProgramCU.cu:117-231, 663-677); here it is a real HBM buffer, so
emitting it once from the conv kernel deletes a copy pass.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from hessgpu_tpu.ops.pallas.conv import (detect_geometry,
                                         downsample2_pallas,
                                         octave_chain_pallas)
from hessgpu_tpu.ops.pallas.detect import detect_octave_pallas

pytestmark = pytest.mark.smoke

H, W = 200, 260
TAPS = [(0.25, 0.5, 0.25), (0.1, 0.2, 0.4, 0.2, 0.1), (),
        (0.25, 0.5, 0.25)]


def _chain_pair():
    rng = np.random.default_rng(7)
    base = jnp.asarray(rng.random((H, W)), jnp.float32)
    ref = octave_chain_pallas(base, TAPS, interpret=True)
    pad, ok = octave_chain_pallas(base, TAPS, interpret=True,
                                  detect_pad=True)
    assert ok
    return ref, pad


def test_padded_layout_matches_edge_pad():
    ref, pad = _chain_pair()
    _, _, _, Wp, rows_needed = detect_geometry(H, W)
    assert pad.shape[-1] == Wp and pad.shape[-2] >= rows_needed
    expect = jnp.pad(ref, ((0, 0), (2, pad.shape[-2] - H - 2),
                           (2, Wp - W - 2)), mode="edge")
    np.testing.assert_array_equal(np.asarray(pad), np.asarray(expect))


def test_offset_downsample_matches_slice():
    ref, pad = _chain_pair()
    got = downsample2_pallas(pad[0], interpret=True,
                             src_offset=(2, 2, H, W))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(ref[0])[::2, ::2])


def test_prepadded_detect_matches_plain():
    ref, pad = _chain_pair()
    norms = [1.0] * ref.shape[0]
    kw = dict(threshold=1e-4, edge_threshold=10.0, interpret=True)
    m0, g0, r0 = detect_octave_pallas(ref, norms, [1, 2], **kw)
    m1, g1, r1 = detect_octave_pallas(pad, norms, [1, 2],
                                      prepadded=(H, W), **kw)
    assert int(np.asarray(m0.valid).sum()) > 0
    for a, b in [(m0.valid, m1.valid), (m0.response, m1.response),
                 (m0.dx, m1.dx), (m0.ftype, m1.ftype), (g0, g1), (r0, r1)]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prepadded_compressed_canvas_matches():
    """prepadded composes with the pipeline's real mode: canvas +
    compressed outputs (what run_pipeline_batched launches)."""
    import jax

    from hessgpu_tpu.ops.pallas.patch import PackingPlan

    ref, pad = _chain_pair()
    norms = [1.0] * ref.shape[0]
    pplan = PackingPlan([(H, W), (H, W)], 48)
    cshape = jax.ShapeDtypeStruct(
        (pplan.num_planes, pplan.Hp, pplan.Wp), jnp.float32)
    canvas = (cshape, cshape, [pplan.plane_of[i] for i in (0, 1)],
              [pplan.dro[i] for i in (0, 1)],
              [pplan.dco[i] for i in (0, 1)], pplan.num_planes)
    kw = dict(threshold=1e-4, edge_threshold=10.0, interpret=True,
              compressed=True)
    (k0, p10, p20), gc0, rc0 = detect_octave_pallas(
        ref, norms, [1, 2], canvas=canvas, **kw)
    (k1, p11, p21), gc1, rc1 = detect_octave_pallas(
        pad, norms, [1, 2], canvas=canvas, prepadded=(H, W), **kw)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(p10), np.asarray(p11))
    np.testing.assert_array_equal(np.asarray(p20), np.asarray(p21))
    # canvas DATA cells match (margins are garbage by contract)
    for ca, cb in ((gc0, gc1), (rc0, rc1)):
        for li in range(2):
            pi, ro, co = pplan.plane_of[li], pplan.dro[li], pplan.dco[li]
            np.testing.assert_array_equal(
                np.asarray(ca[pi, ro:ro + H, co:co + W]),
                np.asarray(cb[pi, ro:ro + H, co:co + W]))


def test_batched_detect_pad():
    rng = np.random.default_rng(3)
    base = jnp.asarray(rng.random((2, H, W)), jnp.float32)
    ref = octave_chain_pallas(base, TAPS, interpret=True)
    pad, ok = octave_chain_pallas(base, TAPS, interpret=True,
                                  detect_pad=True)
    assert ok and pad.shape[0] == 2
    _, _, _, Wp, _ = detect_geometry(H, W)
    expect = jnp.pad(ref, ((0, 0), (0, 0), (2, pad.shape[-2] - H - 2),
                           (2, Wp - W - 2)), mode="edge")
    np.testing.assert_array_equal(np.asarray(pad), np.asarray(expect))
