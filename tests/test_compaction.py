"""Stream compaction and top-K selection."""

import numpy as np
import jax.numpy as jnp

from hessgpu_tpu.ops.compaction import FeatureList, compact_mask
from hessgpu_tpu.pyramid import _apply_topk


def test_compact_preserves_raster_order(rng):
    mask = rng.rand(16, 20) < 0.1
    vals = np.arange(320, dtype=np.float32).reshape(16, 20)
    count, (out,), slot_valid = compact_mask(
        jnp.asarray(mask), [jnp.asarray(vals)], capacity=64)
    n = int(count)
    assert n == mask.sum()
    want = vals[mask]  # raster order
    np.testing.assert_array_equal(np.asarray(out)[:n], want)
    assert np.asarray(slot_valid).sum() == n


def test_compact_overflow_drops_tail():
    mask = np.ones((4, 4), bool)
    vals = np.arange(16, dtype=np.float32).reshape(4, 4)
    count, (out,), slot_valid = compact_mask(
        jnp.asarray(mask), [jnp.asarray(vals)], capacity=8)
    assert int(count) == 8
    np.testing.assert_array_equal(np.asarray(out), np.arange(8))


def _make_list(responses, cap=None):
    n = len(responses)
    cap = cap or n
    r = np.zeros(cap, np.float32)
    r[:n] = responses
    v = np.zeros(cap, bool)
    v[:n] = True
    z = jnp.zeros(cap, jnp.float32)
    return FeatureList(
        x=jnp.arange(cap, dtype=jnp.float32), y=z,
        sigma=jnp.ones(cap, jnp.float32), theta=z,
        response=jnp.asarray(r), ftype=jnp.zeros(cap, jnp.int32),
        valid=jnp.asarray(v))


def test_topk_selects_largest_abs_response():
    l1 = _make_list([0.5, -0.9, 0.1, 0.3], cap=8)
    l2 = _make_list([0.7, 0.2, -0.6], cap=8)
    out = _apply_topk([l1, l2], k=3)
    # global top-3 by |response|: 0.9 (l1), 0.7 (l2), 0.6 (l2)
    c1, c2 = int(out[0].count()), int(out[1].count())
    assert (c1, c2) == (1, 2)
    # within-level order preserved: l2 keeps x=0 (0.7) then x=2 (0.6)
    assert np.asarray(out[1].x)[:2].tolist() == [0.0, 2.0]
    assert float(out[0].response[0]) == np.float32(-0.9)


def test_topk_tie_break_by_order():
    l1 = _make_list([0.5, 0.5, 0.5, 0.5], cap=8)
    out = _apply_topk([l1], k=2)
    assert int(out[0].count()) == 2
    # first two in global order survive
    assert np.asarray(out[0].x)[:2].tolist() == [0.0, 1.0]


def test_topk_k_larger_than_count():
    l1 = _make_list([0.5, 0.4], cap=8)
    out = _apply_topk([l1], k=100)
    assert int(out[0].count()) == 2
