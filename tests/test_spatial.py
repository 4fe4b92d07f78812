"""Spatially sharded (halo-exchange) filtering on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hessgpu_tpu.ops.gaussian import blur
from hessgpu_tpu.parallel.batch import data_parallel_mesh
from hessgpu_tpu.parallel.spatial import sharded_blur, sharded_hessian_response
from hessgpu_tpu.ops.hessian import hessian_response_and_gradient


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return data_parallel_mesh(8)


def test_sharded_blur_matches_single_chip(mesh, rng):
    img = rng.rand(128, 96).astype(np.float32)
    want = np.asarray(blur(jnp.asarray(img), 1.6))
    got = np.asarray(sharded_blur(jnp.asarray(img), 1.6, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_blur_wide_kernel(mesh, rng):
    """Halo width > shard height exercises multi-row exchange."""
    img = rng.rand(64, 64).astype(np.float32)  # 8 rows/shard, 33-tap filter
    want = np.asarray(blur(jnp.asarray(img), 2.0))
    got = np.asarray(sharded_blur(jnp.asarray(img), 2.0, mesh))
    # halo of 8+ rows spans >1 neighbour: the ring exchange only reaches the
    # adjacent device, so expect exactness only when halo fits in one shard.
    from hessgpu_tpu.params import gaussian_taps
    r = len(gaussian_taps(2.0)) // 2
    if r <= 8:
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_hessian_matches(mesh, rng):
    img = rng.rand(128, 96).astype(np.float32)
    sigmas = [1.2, 1.5]
    norms = [1.0, 2.0, 3.0]
    gauss_s, resp_s = sharded_hessian_response(
        jnp.asarray(img), sigmas, norms, mesh)

    # single-chip reference
    levels = [jnp.asarray(img)]
    for s in sigmas:
        levels.append(blur(levels[-1], s))
    stack = jnp.stack(levels)
    resp, _, _ = hessian_response_and_gradient(stack, norms)

    np.testing.assert_allclose(np.asarray(gauss_s), np.asarray(stack),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(resp_s), np.asarray(resp),
                               atol=1e-4)


# ---------------------------------------------------------------------------
# end-to-end sharded detection
# ---------------------------------------------------------------------------

def _kp_rows(res):
    """Valid keypoints as a row-sorted (N, 5) array [x, y, sigma, resp, type]."""
    v = np.asarray(res["valid"]).ravel()
    cols = [np.asarray(res[k]).ravel()[v].astype(np.float64)
            for k in ("x", "y", "sigma", "response", "ftype")]
    arr = np.stack(cols, 1)
    return arr[np.lexsort((arr[:, 2], arr[:, 1], arr[:, 0]))]


def _smooth_image(rng, h, w):
    img = rng.rand(h, w).astype(np.float32)
    return np.asarray(blur(jnp.asarray(img), 2.0))


def test_sharded_detect_matches_pipeline_one_octave(mesh, rng):
    """8-way sharded detection == the single-chip pipeline, octave 0."""
    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.ops.compaction import compact_level_keypoints
    from hessgpu_tpu.parallel.spatial import sharded_detect_keypoints
    from hessgpu_tpu.pyramid import _build_pyramid, _detect_octave, make_plan

    cfg = SiftConfig()
    cfg.num_octaves = 1
    # low enough that blurred noise yields real detections, high enough
    # that densities stay below the per-shard caps
    cfg.threshold = 0.001
    img = _smooth_image(rng, 256, 320)

    got = _kp_rows(sharded_detect_keypoints(jnp.asarray(img), cfg, mesh))

    p = cfg.scale_params()
    plan = make_plan(256, 320, cfg)
    oct0 = _build_pyramid(jnp.asarray(img), plan, cfg)[0]
    maps, _, _ = _detect_octave(oct0, plan, cfg)
    rows = []
    for li, kl in enumerate(p.key_levels):
        maps_li = jax.tree.map(lambda a: a[li], maps)
        fl = compact_level_keypoints(maps_li, p.key_level_sigma(kl),
                                     p.sigmak, plan.level_caps[li])
        v = np.asarray(fl.valid)
        rows.append(np.stack([
            np.asarray(fl.x)[v], np.asarray(fl.y)[v],
            np.asarray(fl.sigma)[v], np.asarray(fl.response)[v],
            np.asarray(fl.ftype)[v].astype(np.float32)], 1))
    want = np.concatenate(rows).astype(np.float64)
    want[:, 0] = want[:, 0] - 0.5 + 0.5   # oss == 1: level == image frame
    want = want[np.lexsort((want[:, 2], want[:, 1], want[:, 0]))]

    assert got.shape == want.shape, (got.shape, want.shape)
    # agreement is ULP-level: same XLA conv/stencil reductions on
    # both paths; rtol covers the odd 1-ulp difference at the
    # block boundaries of large coordinates
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_sharded_describe_matches_pipeline(mesh, rng):
    """A taller-than-maxd image (H=3328 > the reference's 3200 ceiling,
    GlobalUtil.cpp:82) sharded over 8 devices yields the FULL
    FeatureTable - x/y/sigma/theta/descriptors - equal to the
    single-chip pipeline."""
    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.parallel.spatial import sharded_detect_and_describe
    from hessgpu_tpu.pyramid import detect_and_describe

    cfg = SiftConfig()
    cfg.threshold = 0.001    # blurred noise: enough real detections
    cfg.max_level_features = 512
    img = _smooth_image(rng, 3328, 256)

    res = sharded_detect_and_describe(jnp.asarray(img), cfg, mesh)
    v = np.asarray(res.valid)
    got = np.stack([np.asarray(a)[v].astype(np.float64)
                    for a in (res.x, res.y, res.sigma, res.theta)], 1)
    gdesc = np.asarray(res.desc)[v]
    order = np.lexsort((got[:, 3], got[:, 2], got[:, 1], got[:, 0]))
    got, gdesc = got[order], gdesc[order]

    table, _ = detect_and_describe(np.asarray(img), cfg)
    wv = np.asarray(table.valid)
    want = np.stack([np.asarray(a)[wv].astype(np.float64)
                     for a in (table.x, table.y, table.sigma,
                               table.theta)], 1)
    wdesc = np.asarray(table.desc)[wv]
    worder = np.lexsort((want[:, 3], want[:, 2], want[:, 1], want[:, 0]))
    want, wdesc = want[worder], wdesc[worder]

    assert len(want) > 30, "degenerate test: almost no keypoints"
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(gdesc, wdesc, atol=1e-5)


def test_sharded_topk_matches_pipeline(mesh, rng):
    """-topk applies ACROSS shards before orientation/descriptor work and
    the result matches the single-chip pipeline row for row."""
    from hessgpu_tpu.config import TRUNCATE_TOP_K, SiftConfig
    from hessgpu_tpu.parallel.spatial import sharded_detect_and_describe
    from hessgpu_tpu.pyramid import detect_and_describe

    cfg = SiftConfig()
    cfg.threshold = 0.001
    cfg.max_level_features = 256
    cfg.truncate_method = TRUNCATE_TOP_K
    cfg.feature_count_threshold = 40
    img = _smooth_image(rng, 512, 192)

    res = sharded_detect_and_describe(jnp.asarray(img), cfg, mesh)
    v = np.asarray(res.valid)
    table, _ = detect_and_describe(np.asarray(img), cfg)
    wv = np.asarray(table.valid)

    assert v.sum() == wv.sum()
    assert 0 < v.sum() <= 40 * 4   # 40 keypoints, <= 4 orientations each
    # row-for-row: same membership AND same order as the single-chip table
    for a, b in ((res.x, table.x), (res.y, table.y),
                 (res.sigma, table.sigma), (res.theta, table.theta),
                 (res.response, table.response), (res.ftype, table.ftype)):
        np.testing.assert_allclose(np.asarray(a)[v].astype(np.float64),
                                   np.asarray(b)[wv].astype(np.float64),
                                   rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.desc)[v],
                               np.asarray(table.desc)[wv], atol=1e-5)


def test_sharded_patch_kernels_match_jnp(mesh, rng):
    """The Pallas patch-kernel path over band+halo canvases (the TPU
    default) equals the jnp helper path, interpret mode, 8 shards."""
    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.parallel.spatial import sharded_detect_and_describe

    cfg = SiftConfig()
    cfg.threshold = 0.001
    cfg.max_level_features = 64
    # f32 canvas: this test pins kernel-vs-jnp math at tight tolerances;
    # bf16 STORAGE quantization (the TPU default) is covered separately
    # by tests/test_pallas_patch.py::test_*_bf16_stack
    cfg.canvas_bf16 = False
    img = _smooth_image(rng, 512, 128)

    a = sharded_detect_and_describe(jnp.asarray(img), cfg, mesh,
                                    use_pallas=False)
    b = sharded_detect_and_describe(jnp.asarray(img), cfg, mesh,
                                    use_pallas=True)
    va, vb = np.asarray(a.valid), np.asarray(b.valid)
    assert va.sum() > 20
    np.testing.assert_array_equal(va, vb)
    for fa, fb in ((a.x, b.x), (a.y, b.y), (a.sigma, b.sigma),
                   (a.theta, b.theta), (a.response, b.response)):
        np.testing.assert_allclose(np.asarray(fa)[va], np.asarray(fb)[vb],
                                   rtol=1e-6, atol=1e-5)
    # MXU f32 accumulation differs from the VPU sum order by ~1e-6 rel
    np.testing.assert_allclose(np.asarray(a.desc)[va],
                               np.asarray(b.desc)[vb], atol=2e-4)


def test_sharded_detect_multi_octave_matches_one_device(mesh, rng):
    """Multi-octave (sharded octave 0 + replicated small octaves): the
    8-device result equals the 1-device run of the same code path."""
    from hessgpu_tpu.config import SiftConfig
    from hessgpu_tpu.parallel.spatial import sharded_detect_keypoints
    from hessgpu_tpu.parallel.distributed import device_mesh

    cfg = SiftConfig()
    cfg.threshold = 0.001  # see test above
    img = _smooth_image(rng, 256, 320)  # octave 0 sharded, 1+ replicated

    got = _kp_rows(sharded_detect_keypoints(jnp.asarray(img), cfg, mesh))
    mesh1 = device_mesh("rows", 1)
    want = _kp_rows(sharded_detect_keypoints(jnp.asarray(img), cfg, mesh1))
    assert len(want) > 20, "degenerate test: almost no keypoints"
    assert got.shape == want.shape, (got.shape, want.shape)
    # agreement is ULP-level: same XLA conv/stencil reductions on
    # both paths; rtol covers the odd 1-ulp difference at the
    # block boundaries of large coordinates
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
