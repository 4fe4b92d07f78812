"""DoG (original SIFT) personality end-to-end."""

import numpy as np
import pytest

from hessgpu_tpu import HessianSift, SiftConfig


def test_dog_pipeline_runs(gray_small):
    cfg = SiftConfig(detector="dog")
    feats = HessianSift(cfg).run(gray_small)
    n = feats["x"].shape[0]
    assert n > 10
    norms = np.linalg.norm(feats["desc"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_dog_sigma_schedule():
    """DoG personality: sigma0 = 1.6 * 2^(1/3), level_min = -1
    (reference SiftGPU.cpp:468-504)."""
    p = SiftConfig(detector="dog").scale_params()
    assert p.level_min == -1
    assert abs(p.base_sigma - 1.6 * 2 ** (1.0 / 3)) < 1e-6


def test_dog_and_hessian_find_overlapping_blobs(gray_small):
    """Both detectors should fire on strong blob structure (coarse check)."""
    h = HessianSift(SiftConfig()).run(gray_small)
    d = HessianSift(SiftConfig(detector="dog")).run(gray_small)
    hset = {(round(float(x)), round(float(y))) for x, y in zip(h["x"], h["y"])}
    dset = {(round(float(x)), round(float(y))) for x, y in zip(d["x"], d["y"])}
    inter = len(hset & dset)
    assert inter >= min(len(hset), len(dset)) * 0.1
