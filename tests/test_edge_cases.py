"""Edge cases: odd sizes, tiny images, dtypes, parser flags."""

import numpy as np
import pytest

from hessgpu_tpu import HessianSift, SiftConfig
from hessgpu_tpu.config import (TRUNCATE_KEEP_HIGHEST_LEVELS,
                                TRUNCATE_KEEP_LOWEST_LEVELS, TRUNCATE_TOP_K)


def test_odd_image_dimensions(gray_small):
    img = gray_small[:157, :193]  # odd dims -> floor-halved octaves
    feats = HessianSift(SiftConfig()).run(img)
    assert feats["x"].shape[0] > 0
    assert (feats["x"] <= 193).all() and (feats["y"] <= 157).all()


def test_tiny_image():
    rngl = np.random.RandomState(0)
    img = rngl.rand(48, 64).astype(np.float32)
    feats = HessianSift(SiftConfig()).run(img)  # must not crash
    assert feats["x"].shape[0] >= 0


def test_uint8_grayscale_input(gray_small):
    u8 = (gray_small * 255).astype(np.uint8)
    f1 = HessianSift(SiftConfig()).run(u8)
    f2 = HessianSift(SiftConfig()).run(gray_small)
    # u8 quantization moves a few weak detections; the bulk agree
    n1, n2 = f1["x"].shape[0], f2["x"].shape[0]
    assert abs(n1 - n2) < 0.2 * max(n1, n2) + 5


def test_rgb_input(image_640):
    feats = HessianSift(SiftConfig(num_octaves=2)).run(
        image_640[:128, :160])
    assert feats["x"].shape[0] >= 0


def test_flat_image_finds_nothing():
    img = np.full((64, 96), 0.5, np.float32)
    feats = HessianSift(SiftConfig()).run(img)
    assert feats["x"].shape[0] == 0


def test_parser_full_flag_surface():
    cfg = SiftConfig.parse_args(
        "-t 0.01 -e 5 -d 4 -fo 1 -no 3 -f 3.5 -w 3 -dw 2.5 -m 3 -s 1 "
        "-ofix -loweo -maxd 1600 -mind 32 -b -half -sd -unn -v 2 -da "
        "-cuda 0 -pack -tight -exit".split())
    assert cfg.threshold == 0.01
    assert cfg.edge_threshold == 5
    assert cfg.num_scales == 4
    assert cfg.first_octave == 1
    assert cfg.num_octaves == 3
    assert cfg.filter_width_factor == 3.5
    assert cfg.orientation_window_factor == 3
    assert cfg.descriptor_window_factor == 2.5
    assert cfg.max_orientations == 3
    assert cfg.subpixel and cfg.fixed_orientation and cfg.lowe_origin
    assert cfg.max_dim == 1600 and cfg.min_dim == 32
    assert cfg.binary_sift == 1 and cfg.half_sift
    assert not cfg.compute_descriptors and not cfg.normalized_sift
    assert cfg.verbose == 2 and cfg.darkness_adaption


def test_parser_prealloc_and_tight():
    """-p WxH / -tight map to jit-cache prewarm / per-size eviction
    hints (reference AllocatePyramid / TightPyramid, SiftGPU.h:186-190)."""
    cfg = SiftConfig.parse_args("-p 640x480 -tight".split())
    assert cfg.prealloc_size == (480, 640)
    assert cfg.tight_pyramid
    assert SiftConfig.parse_args(["-p", "garbage"]).prealloc_size is None

    # tight mode: consecutive sizes still produce correct results
    sift = HessianSift(SiftConfig.parse_args(["-tight"]))
    rng = np.random.RandomState(0)
    for shape in ((64, 96), (96, 64), (64, 96)):
        feats = sift.run(rng.rand(*shape).astype(np.float32))
        assert "x" in feats


def test_parser_truncation_flags():
    assert SiftConfig.parse_args(["-topk", "100"]).truncate_method \
        == TRUNCATE_TOP_K
    assert SiftConfig.parse_args(["-tc2", "100"]).truncate_method \
        == TRUNCATE_KEEP_LOWEST_LEVELS
    for f in ("-tc", "-tc1", "-tc3"):
        cfg = SiftConfig.parse_args([f, "50"])
        assert cfg.truncate_method == TRUNCATE_KEEP_HIGHEST_LEVELS
        assert cfg.feature_count_threshold == 50


def test_half_sift_pipeline(gray_small):
    feats = HessianSift(SiftConfig(half_sift=True)).run(gray_small)
    assert feats["desc"].shape[1] == 64
    norms = np.linalg.norm(feats["desc"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_no_descriptor_mode(gray_small):
    feats = HessianSift(SiftConfig(compute_descriptors=False)).run(gray_small)
    assert feats["x"].shape[0] > 0
    assert (feats["desc"] == 0).all()


def test_fixed_orientation_mode(gray_small):
    feats = HessianSift(SiftConfig(fixed_orientation=True)).run(gray_small)
    assert feats["x"].shape[0] > 0
    # -ofix: all orientations fixed (device theta 0 -> image frame 0)
    assert np.allclose(feats["theta"], 0.0)


def _orientation_counts(feats):
    """Count emitted orientations per distinct (x, y, sigma) location."""
    locs = np.stack([feats["x"], feats["y"], feats["sigma"]], axis=1)
    _, counts = np.unique(np.round(locs, 4), axis=0, return_counts=True)
    return counts


def test_max_orientations_cap_enforced(gray_small):
    """-m <1..4> caps orientations per keypoint (GlobalUtil._MaxOrientation,
    ProgramCU.cu:1424-1489). Round-1 bug: cap was parsed but ignored."""
    by_cap = {}
    for cap in (1, 2, 4):
        feats = HessianSift(SiftConfig(max_orientations=cap)).run(gray_small)
        counts = _orientation_counts(feats)
        assert counts.max() <= cap, (
            f"-m {cap} emitted {counts.max()} orientations for one keypoint")
        by_cap[cap] = feats["x"].shape[0]
    # a lower cap can only shed features
    assert by_cap[1] <= by_cap[2] <= by_cap[4]


def test_fail_soft_sets_flag_and_returns_empty(monkeypatch):
    """Reference failure semantics (_siftgpu_failed): with fail_soft a
    broken run reports failed + empty features instead of raising."""
    from hessgpu_tpu import HessianSift, SiftConfig
    import hessgpu_tpu.detector as det

    cfg = SiftConfig(fail_soft=True)
    sift = HessianSift(cfg)

    def boom(img, c):
        raise RuntimeError("device fell over")

    monkeypatch.setattr(det, "detect_and_describe", boom)
    feats = sift.run(np.zeros((64, 64), np.float32))
    assert sift.failed and "device fell over" in sift.last_error
    assert feats["x"].shape == (0,) and feats["desc"].shape == (0, 128)
    assert sift.feature_num == 0

    # without fail_soft the error propagates and the flag reports it
    sift2 = HessianSift(SiftConfig())
    monkeypatch.setattr(det, "detect_and_describe", boom)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        sift2.run(np.zeros((64, 64), np.float32))


def test_parser_m_optional_value_and_ofix_not():
    """-m without a number means 2 (SiftGPU.cpp:1039-1048 'int mo = 2');
    -ofix-not undoes -ofix (SiftGPU.cpp -ofix/-ofix-not pair)."""
    assert SiftConfig.parse_args(["-m"]).max_orientations == 2
    assert SiftConfig.parse_args(["-m", "-s"]).max_orientations == 2
    assert SiftConfig.parse_args(["-m", "3"]).max_orientations == 3
    assert SiftConfig.parse_args(["-m", "9"]).max_orientations == 4
    cfg = SiftConfig.parse_args(["-ofix", "-ofix-not"])
    assert not cfg.fixed_orientation


def test_odd_dims_builder_matches_plan(gray_small):
    """ADVICE r4 (high): params.octave_shapes floor-halves (reference
    w>>1/h>>1, PyramidCU.cpp:150) while decimation keeps ceil(h/2) rows;
    the builder must crop so every octave array matches the plan exactly
    (canvas geometry, prepadded detect shapes, and offset-downsamples all
    trust plan.octave_shapes since round 4)."""
    import jax.numpy as jnp
    from hessgpu_tpu.pyramid import _build_pyramid, make_plan

    img = gray_small[:157, :193]  # odd dims at every octave
    cfg = SiftConfig()
    plan = make_plan(*img.shape, cfg)
    octs = _build_pyramid(jnp.asarray(img), plan, cfg)
    assert [tuple(o.shape[-2:]) for o in octs] == list(plan.octave_shapes)
    # shapes stay odd through at least one halving (157 -> 78 is even,
    # 193 -> 96 is even; make sure a genuinely odd halving is present)
    assert any(h % 2 or w % 2 for (h, w) in plan.octave_shapes)
