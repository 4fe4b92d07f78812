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


@pytest.mark.parametrize("subpixel", [True, False])
def test_fused_detect_dog_matches_reference(subpixel):
    """detector="dog" shares the kernel; parity vs the XLA DoG path
    (response = gauss[l+1]-gauss[l], plain NMS, bright/dark typing)."""
    import jax
    from hessgpu_tpu.ops.hessian import dog_response_and_gradient

    rng = np.random.RandomState(13)
    p = ScaleSpaceParams(detector="dog")
    # blurred noise almost never yields 3D scale-space extrema (adjacent
    # DoG levels are too correlated); use a field of random-scale blobs,
    # the structure DoG is built to detect
    yy, xx = np.mgrid[0:200, 0:256].astype(np.float32)
    base_np = np.zeros((200, 256), np.float32)
    for _ in range(80):
        cy, cx = rng.uniform(8, 192), rng.uniform(8, 248)
        s = rng.uniform(1.5, 6.0)
        a = rng.choice([-1.0, 1.0]) * rng.uniform(0.4, 1.0)
        base_np += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                              / (2 * s * s))
    base = jnp.asarray(base_np * 0.5 + 0.5)
    gauss = build_octave_chain(base, p)
    assert gauss.shape[0] == p.num_levels
    norms = [1.0] * p.num_levels
    thr = p.threshold
    maps_p, grad_p, rot_p = detect_octave_pallas(
        gauss, norms, p.key_levels, threshold=thr,
        edge_threshold=p.edge_threshold, subpixel=subpixel,
        detector="dog", interpret=True)

    resp, grad, rot = dog_response_and_gradient(gauss)
    # realign: grad[i] belongs to gauss[i+1] (pyramid._detect_octave)
    grad = jnp.concatenate([grad[:1], grad], axis=0)
    rot = jnp.concatenate([rot[:1], rot], axis=0)
    for i, kl in enumerate(p.key_levels):
        want = detect_keypoints_level(
            resp[kl - 1], resp[kl], resp[kl + 1], gauss[kl],
            threshold=thr, edge_threshold=p.edge_threshold,
            subpixel=subpixel, hessian=False)
        got = jax.tree.map(lambda a: a[i], maps_p)
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(want.valid),
                                      err_msg=f"level {kl}")
        v = np.asarray(want.valid)
        assert v.sum() > 5, f"level {kl} found no keypoints"
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


@pytest.fixture(scope="module")
def octave_big():
    rng = np.random.RandomState(5)
    base = jnp.asarray(rng.rand(200, 256).astype(np.float32))
    p = ScaleSpaceParams()
    return build_octave_chain(base, p), p


def test_canvas_mode_matches_plain(octave_big):
    """canvas=(...) writes each level's grad/rot into its PackedStack cell
    (plus masked margin junk); the cells must equal the plain outputs."""
    from hessgpu_tpu.ops.pallas.patch import PackingPlan

    gauss, p = octave_big
    norms = [(p.level_sigma(l) ** 4) for l in range(p.num_levels)]
    kw = dict(threshold=p.threshold, edge_threshold=p.edge_threshold,
              subpixel=True, interpret=True)
    maps0, grad0, rot0 = detect_octave_pallas(gauss, norms, p.key_levels,
                                              **kw)

    h, w = gauss.shape[-2:]
    nk = len(p.key_levels)
    pplan = PackingPlan([(h, w)] * nk, pad=24)
    gradc = jnp.zeros((pplan.num_planes, pplan.Hp, pplan.Wp), jnp.float32)
    rotc = jnp.zeros_like(gradc)
    maps1, gradc, rotc = detect_octave_pallas(
        gauss, norms, p.key_levels,
        canvas=(gradc, rotc, pplan.plane_of, pplan.dro, pplan.dco,
                pplan.num_planes), **kw)

    for f in maps0._fields:
        np.testing.assert_array_equal(np.asarray(getattr(maps1, f)),
                                      np.asarray(getattr(maps0, f)),
                                      err_msg=f"map field {f}")
    for li in range(nk):
        pi, ro, co = pplan.plane_of[li], pplan.dro[li], pplan.dco[li]
        np.testing.assert_array_equal(
            np.asarray(gradc[pi, ro:ro + h, co:co + w]),
            np.asarray(grad0[li]), err_msg=f"grad cell level {li}")
        np.testing.assert_array_equal(
            np.asarray(rotc[pi, ro:ro + h, co:co + w]),
            np.asarray(rot0[li]), err_msg=f"rot cell level {li}")


def test_canvas_mode_batched(octave_big):
    from hessgpu_tpu.ops.pallas.patch import PackingPlan

    gauss, p = octave_big
    norms = [(p.level_sigma(l) ** 4) for l in range(p.num_levels)]
    B = 2
    gb = jnp.stack([gauss, gauss[:, ::-1, :]])
    h, w = gauss.shape[-2:]
    nk = len(p.key_levels)
    kw = dict(threshold=p.threshold, edge_threshold=p.edge_threshold,
              subpixel=True, interpret=True)
    pplan = PackingPlan([(h, w)] * nk, pad=24)
    P = pplan.num_planes
    gradc = jnp.zeros((B * P, pplan.Hp, pplan.Wp), jnp.float32)
    rotc = jnp.zeros_like(gradc)
    maps1, gradc, rotc = detect_octave_pallas(
        gb, norms, p.key_levels,
        canvas=(gradc, rotc, pplan.plane_of, pplan.dro, pplan.dco, P),
        **kw)
    for b in range(B):
        maps0, grad0, rot0 = detect_octave_pallas(gb[b], norms,
                                                  p.key_levels, **kw)
        for li in range(nk):
            pi = b * P + pplan.plane_of[li]
            ro, co = pplan.dro[li], pplan.dco[li]
            np.testing.assert_array_equal(
                np.asarray(gradc[pi, ro:ro + h, co:co + w]),
                np.asarray(grad0[li]), err_msg=f"b{b} grad level {li}")
        np.testing.assert_array_equal(np.asarray(maps1.valid[b]),
                                      np.asarray(maps0.valid))


def test_canvas_mode_nonaligned_width():
    """W not a multiple of 128 (here 320 -> write width 384): the canvas
    margin cols [w, Wc) receive computed-on-padded-data junk, which must
    be FINITE (NaN would poison descriptor windows reaching the margin),
    and the data region must still match the plain kernel outputs."""
    from hessgpu_tpu.ops.pallas.patch import PackingPlan

    rng = np.random.RandomState(7)
    base = jnp.asarray(rng.rand(192, 320).astype(np.float32))
    p = ScaleSpaceParams()
    gauss = build_octave_chain(base, p)
    norms = [(p.level_sigma(l) ** 4) for l in range(p.num_levels)]
    kw = dict(threshold=p.threshold, edge_threshold=p.edge_threshold,
              subpixel=True, interpret=True)
    maps0, grad0, rot0 = detect_octave_pallas(gauss, norms, p.key_levels,
                                              **kw)

    h, w = gauss.shape[-2:]
    nk = len(p.key_levels)
    pplan = PackingPlan([(h, w)] * nk, pad=24)
    gradc = jnp.zeros((pplan.num_planes, pplan.Hp, pplan.Wp), jnp.float32)
    rotc = jnp.zeros_like(gradc)
    maps1, gradc, rotc = detect_octave_pallas(
        gauss, norms, p.key_levels,
        canvas=(gradc, rotc, pplan.plane_of, pplan.dro, pplan.dco,
                pplan.num_planes), **kw)

    wc = (w + 127) // 128 * 128
    assert wc > w
    for li in range(nk):
        pi, ro, co = pplan.plane_of[li], pplan.dro[li], pplan.dco[li]
        np.testing.assert_array_equal(
            np.asarray(gradc[pi, ro:ro + h, co:co + w]),
            np.asarray(grad0[li]), err_msg=f"grad cell level {li}")
        np.testing.assert_array_equal(
            np.asarray(rotc[pi, ro:ro + h, co:co + w]),
            np.asarray(rot0[li]), err_msg=f"rot cell level {li}")
        # written margin columns: junk allowed, non-finite not
        assert np.isfinite(
            np.asarray(gradc[pi, ro:ro + h, co + w:co + wc])).all()
        assert np.isfinite(
            np.asarray(rotc[pi, ro:ro + h, co + w:co + wc])).all()
    for f in maps0._fields:
        np.testing.assert_array_equal(np.asarray(getattr(maps1, f)),
                                      np.asarray(getattr(maps0, f)),
                                      err_msg=f"map field {f}")

def test_compressed_mode_matches_maps_compaction(octave_big):
    """compressed=True emits the u16 sort key + packed payload planes from
    the kernel; compact_octave_compressed on them must produce a
    bit-identical FeatureList to compact_octave_keypoints on the maps."""
    from hessgpu_tpu.ops.compaction import (compact_octave_compressed,
                                            compact_octave_keypoints)
    from hessgpu_tpu.ops.pallas.patch import PackingPlan

    gauss, p = octave_big
    norms = [(p.level_sigma(l) ** 4) for l in range(p.num_levels)]
    kw = dict(threshold=p.threshold, edge_threshold=p.edge_threshold,
              subpixel=True, interpret=True)
    h, w = gauss.shape[-2:]
    nk = len(p.key_levels)
    pplan = PackingPlan([(h, w)] * nk, pad=24)
    cshape = (pplan.num_planes, pplan.Hp, pplan.Wp)
    canvas = lambda: (jnp.zeros(cshape, jnp.float32),
                      jnp.zeros(cshape, jnp.float32),
                      pplan.plane_of, pplan.dro, pplan.dco,
                      pplan.num_planes)

    maps0, _, _ = detect_octave_pallas(gauss, norms, p.key_levels,
                                       canvas=canvas(), **kw)
    (key, p1, p2), gradc1, rotc1 = detect_octave_pallas(
        gauss, norms, p.key_levels, canvas=canvas(), compressed=True, **kw)

    assert key.dtype == jnp.uint16
    sigmas = [p.key_level_sigma(kl) for kl in p.key_levels]
    fl0 = compact_octave_keypoints(maps0, sigmas, p.sigmak, 256)
    fl1 = compact_octave_compressed(key, p1, p2, sigmas, p.sigmak, 256)
    assert int(fl0.count().sum()) > 10
    for f in fl0._fields:
        np.testing.assert_array_equal(np.asarray(getattr(fl1, f)),
                                      np.asarray(getattr(fl0, f)),
                                      err_msg=f"field {f}")

    # canvas cells still written correctly in compressed mode
    maps_plain, grad0, rot0 = detect_octave_pallas(gauss, norms,
                                                   p.key_levels, **kw)
    for li in range(nk):
        pi, ro, co = pplan.plane_of[li], pplan.dro[li], pplan.dco[li]
        np.testing.assert_array_equal(
            np.asarray(gradc1[pi, ro:ro + h, co:co + w]),
            np.asarray(grad0[li]), err_msg=f"grad cell level {li}")


def test_compressed_mode_odd_width():
    """Odd W exercises the sentinel pad before pair-min."""
    from hessgpu_tpu.ops.compaction import (compact_octave_compressed,
                                            compact_octave_keypoints)
    from hessgpu_tpu.ops.pallas.patch import PackingPlan

    rng = np.random.RandomState(11)
    base = jnp.asarray(rng.rand(192, 257).astype(np.float32))
    p = ScaleSpaceParams()
    gauss = build_octave_chain(base, p)
    norms = [(p.level_sigma(l) ** 4) for l in range(p.num_levels)]
    kw = dict(threshold=p.threshold, edge_threshold=p.edge_threshold,
              subpixel=True, interpret=True)
    h, w = gauss.shape[-2:]
    nk = len(p.key_levels)
    pplan = PackingPlan([(h, w)] * nk, pad=24)
    cshape = (pplan.num_planes, pplan.Hp, pplan.Wp)
    canvas = lambda: (jnp.zeros(cshape, jnp.float32),
                      jnp.zeros(cshape, jnp.float32),
                      pplan.plane_of, pplan.dro, pplan.dco,
                      pplan.num_planes)
    maps0, _, _ = detect_octave_pallas(gauss, norms, p.key_levels,
                                       canvas=canvas(), **kw)
    (key, p1, p2), _, _ = detect_octave_pallas(
        gauss, norms, p.key_levels, canvas=canvas(), compressed=True, **kw)
    sigmas = [p.key_level_sigma(kl) for kl in p.key_levels]
    fl0 = compact_octave_keypoints(maps0, sigmas, p.sigmak, 128)
    fl1 = compact_octave_compressed(key, p1, p2, sigmas, p.sigmak, 128)
    for f in fl0._fields:
        np.testing.assert_array_equal(np.asarray(getattr(fl1, f)),
                                      np.asarray(getattr(fl0, f)),
                                      err_msg=f"field {f}")
