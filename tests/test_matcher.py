"""Descriptor matcher: quantization, angular ratio test, mutual best,
guided gating - vs direct NumPy computation."""

import numpy as np
import jax.numpy as jnp

from hessgpu_tpu.matcher import (SiftMatcher, _guided_gate,
                                 quantize_descriptors)


def _unit_desc(rng, n):
    d = np.abs(rng.randn(n, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return d


def test_quantization_reference_formula(rng):
    d = _unit_desc(rng, 4)
    q = quantize_descriptors(d)
    want = np.floor(512 * d + 0.5)
    np.testing.assert_array_equal(q, np.clip(want, 0, 255).astype(np.uint8))


def test_exact_match_found(rng):
    d1 = _unit_desc(rng, 50)
    perm = rng.permutation(50)
    d2 = d1[perm]
    m = SiftMatcher()
    m.set_descriptors(0, d1)
    m.set_descriptors(1, d2)
    matches = m.get_sift_match()
    assert len(matches) == 50
    for i, j in matches:
        assert perm[j] == i


def test_ratio_test_rejects_ambiguous(rng):
    base = _unit_desc(rng, 1)[0]
    # two identical targets -> exact tie, ratio test must reject
    d2 = np.stack([base, base])
    m = SiftMatcher()
    m.set_descriptors(0, base[None])
    m.set_descriptors(1, d2)
    assert len(m.get_sift_match()) == 0
    # a single target matches fine
    m.set_descriptors(1, base[None])
    assert len(m.get_sift_match()) == 1


def test_distmax_rejects_far(rng):
    d1 = _unit_desc(rng, 1)
    d2 = _unit_desc(rng, 1)
    # force nearly orthogonal
    d2[0] = np.roll(d1[0], 64)
    m = SiftMatcher()
    m.set_descriptors(0, d1)
    m.set_descriptors(1, d2)
    dot = float(np.dot(quantize_descriptors(d1)[0].astype(np.int64),
                       quantize_descriptors(d2)[0].astype(np.int64)))
    ang = np.arccos(min(dot / 512.0 ** 2, 1.0))
    got = m.get_sift_match(distmax=ang * 0.9, mutual_best=False)
    assert len(got) == 0
    got = m.get_sift_match(distmax=ang * 1.1, mutual_best=False)
    assert len(got) == 1


def test_mutual_best_intersection(rng):
    # d2[0] is the best target for both rows of d1; mutual-best keeps only
    # the stronger pair
    t = _unit_desc(rng, 1)[0]
    n1 = t + 0.01 * np.abs(rng.randn(128))
    n2 = t + 0.3 * np.abs(rng.randn(128))
    d1 = np.stack([n1 / np.linalg.norm(n1), n2 / np.linalg.norm(n2)])
    far = np.abs(rng.randn(128))
    d2 = np.stack([t, np.roll(t, 64)])
    m = SiftMatcher()
    m.set_descriptors(0, d1.astype(np.float32))
    m.set_descriptors(1, d2.astype(np.float32))
    got = m.get_sift_match(distmax=3.2, ratiomax=1.0, mutual_best=True)
    got = {tuple(p) for p in got.tolist()}
    assert (0, 0) in got
    assert (1, 0) not in got


def test_guided_gate_homography():
    loc1 = np.array([[10.0, 10.0], [50.0, 50.0]], np.float32)
    loc2 = np.array([[12.0, 11.0], [200.0, 200.0]], np.float32)
    H = np.eye(3, dtype=np.float32)
    # F for a pure horizontal translation: epipolar lines y2 == y1
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    gate = np.asarray(_guided_gate(jnp.asarray(loc1), jnp.asarray(loc2),
                                   jnp.asarray(H), 5.0, jnp.asarray(F), 16.0))
    assert gate[0, 0]          # within 5 px and sampson (dy=1) small
    assert not gate[0, 1]      # far
    assert not gate[1, 0]


def test_guided_match_end_to_end(rng):
    d = _unit_desc(rng, 20)
    loc = rng.rand(20, 2).astype(np.float32) * 100
    m = SiftMatcher()
    m.set_descriptors(0, d)
    m.set_descriptors(1, d)
    m.set_feature_location(0, loc)
    m.set_feature_location(1, loc + 1.0)  # shift within hdistmax
    H = np.eye(3, dtype=np.float32)
    # translation epipolar geometry: small sampson error for dy = 1 shifts
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    got = m.get_guided_sift_match(H, F, hdistmax=5.0, fdistmax=100.0)
    assert len(got) == 20
    # tighten the homography gate so nothing passes
    got = m.get_guided_sift_match(H, F, hdistmax=0.5, fdistmax=100.0)
    assert len(got) == 0


def test_guided_match_none_matrices(rng):
    """None H/F skip their gate like the reference (SiftMatch.cpp:663-675):
    identity + 1e20 threshold; both None degrades to plain matching."""
    d = _unit_desc(rng, 16)
    loc = rng.rand(16, 2).astype(np.float32) * 100
    m = SiftMatcher()
    m.set_descriptors(0, d)
    m.set_descriptors(1, d)
    m.set_feature_location(0, loc)
    m.set_feature_location(1, loc + 1.0)
    H = np.eye(3, dtype=np.float32)
    # F=None: only the homography gates
    got = m.get_guided_sift_match(H=H, F=None, hdistmax=5.0)
    assert len(got) == 16
    got = m.get_guided_sift_match(H=H, F=None, hdistmax=0.5)
    assert len(got) == 0
    # H=None: only F gates (translation epipolar geometry)
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    got = m.get_guided_sift_match(H=None, F=F, fdistmax=100.0)
    assert len(got) == 16
    # both None == plain match
    got = m.get_guided_sift_match()
    plain = m.get_sift_match()
    np.testing.assert_array_equal(got, plain)
