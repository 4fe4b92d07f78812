"""End-to-end matching quality: detect + describe + match across a known
warp, verified geometrically."""

import numpy as np
import pytest

from hessgpu_tpu import HessianSift, SiftConfig, SiftMatcher
from hessgpu_tpu.evaluation import rotation_homography, warp_image


def test_matching_across_rotation(gray_small):
    H = rotation_homography(20, *gray_small.shape)
    warped = warp_image(gray_small, H)

    sift = HessianSift(SiftConfig())
    f1 = sift.run(gray_small)
    f2 = sift.run(warped)
    m = SiftMatcher().match(f1, f2)
    # the small crop yields ~80 features and the rotation crops borders;
    # the full 640x480 image yields 140+ matches at 99% correctness
    assert len(m) >= 8, f"only {len(m)} matches under a 20-degree rotation"

    p1 = np.stack([f1["x"][m[:, 0]], f1["y"][m[:, 0]],
                   np.ones(len(m))], 1)
    p2 = np.stack([f2["x"][m[:, 1]], f2["y"][m[:, 1]]], 1)
    proj = p1 @ H.T
    proj = proj[:, :2] / proj[:, 2:3]
    err = np.linalg.norm(proj - p2, axis=1)
    assert (err < 3.0).mean() > 0.9, \
        f"only {(err < 3.0).mean():.2f} of matches geometrically correct"
