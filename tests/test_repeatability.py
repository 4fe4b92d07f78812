"""Detector repeatability under known warps (coarse, fast subset)."""

import numpy as np
import pytest

from hessgpu_tpu import SiftConfig
from hessgpu_tpu.evaluation import (evaluate_repeatability,
                                    repeatability, rotation_homography,
                                    warp_image)


def test_warp_identity(gray_small):
    H = np.eye(3)
    w = warp_image(gray_small, H)
    np.testing.assert_allclose(w[1:-1, 1:-1], gray_small[1:-1, 1:-1],
                               atol=1e-5)


def test_warp_rotation_roundtrip(gray_small):
    h, w = gray_small.shape
    H = rotation_homography(30, h, w)
    back = warp_image(warp_image(gray_small, H), np.linalg.inv(H))
    # compare the central region (borders get cut by the warp)
    c = gray_small[60:-60, 60:-60]
    b = back[60:-60, 60:-60]
    assert np.abs(c - b).mean() < 0.02


def test_repeatability_identity(gray_small):
    from hessgpu_tpu import HessianSift
    feats = HessianSift(SiftConfig()).run(gray_small)
    r = repeatability(feats, feats, np.eye(3), gray_small.shape)
    assert r == 1.0


def test_repeatability_under_rotation(gray_small):
    """Hessian detector should re-detect most keypoints under a 15-degree
    rotation (the reference's headline quality claim, README.md:8-19)."""
    scores = evaluate_repeatability(gray_small, SiftConfig(),
                                    angles=(15,), scales=(1.0,))
    assert scores["mean"] > 0.5, scores
