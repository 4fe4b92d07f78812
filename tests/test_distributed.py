"""Sharded matcher on the virtual 8-device mesh vs the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hessgpu_tpu.matcher import _match_core, quantize_descriptors
from hessgpu_tpu.parallel.distributed import device_mesh, match_sharded


@pytest.fixture(scope="module")
def mesh():
    return device_mesh("batch", 8)


def _descs(rng, n):
    d = np.abs(rng.randn(n, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return quantize_descriptors(d)


@pytest.mark.parametrize("mutual", [False, True])
def test_match_sharded_equals_local(mesh, rng, mutual):
    n1, n2 = 64, 80
    d1 = _descs(rng, n1)
    d2 = _descs(rng, n2)
    # plant some true correspondences
    d2[:32] = d1[:32]

    want = np.asarray(_match_core(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.ones(n1, bool), jnp.ones(n2, bool),
        0.7, 0.8, mutual_best=mutual))
    got = np.asarray(match_sharded(jnp.asarray(d1), jnp.asarray(d2), mesh,
                                   mutual_best=mutual))
    np.testing.assert_array_equal(got, want)
    assert (got[:32] == np.arange(32)).mean() > 0.9


@pytest.mark.parametrize("n1", [61, 7])
def test_match_sharded_pads_uneven_rows(mesh, rng, n1):
    """N1 not divisible by the mesh size: rows are zero-padded internally
    and results still equal the local matcher."""
    d1 = _descs(rng, n1)
    d2 = _descs(rng, 80)
    d2[:5] = d1[:5]
    want = np.asarray(_match_core(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.ones(n1, bool), jnp.ones(80, bool),
        0.7, 0.8, mutual_best=True))
    got = np.asarray(match_sharded(jnp.asarray(d1), jnp.asarray(d2), mesh))
    assert got.shape == (n1,)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_h,use_f", [(True, False), (False, True),
                                         (True, True)])
def test_match_sharded_guided_equals_local(mesh, rng, use_h, use_f):
    """Guided variant == the single-chip guided gate (H / F / both)."""
    from hessgpu_tpu.matcher import _guided_gate

    n1, n2 = 61, 80   # uneven: exercises the loc padding too
    d1 = _descs(rng, n1)
    d2 = _descs(rng, n2)
    d2[:24] = d1[:24]
    loc1 = rng.rand(n1, 2).astype(np.float32) * 400
    loc2 = np.vstack([loc1[:24] * 1.1 + 3.0,
                      rng.rand(n2 - 24, 2).astype(np.float32) * 400])
    H = np.diag([1.1, 1.1, 1.0]).astype(np.float32)
    H[:2, 2] = 3.0
    F = np.asarray(rng.randn(3, 3), np.float32)

    Hj = jnp.asarray(H) if use_h else jnp.eye(3)
    hd = 32.0 if use_h else 1.0e20
    Fj = jnp.asarray(F) if use_f else jnp.eye(3)
    fd = 16.0 if use_f else 1.0e20
    gate = _guided_gate(jnp.asarray(loc1), jnp.asarray(loc2),
                        Hj, hd, Fj, fd)
    want = np.asarray(_match_core(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.ones(n1, bool), jnp.ones(n2, bool),
        0.7, 0.8, mutual_best=True, gate=gate))

    got = np.asarray(match_sharded(
        jnp.asarray(d1), jnp.asarray(d2), mesh,
        loc1=jnp.asarray(loc1), loc2=jnp.asarray(loc2),
        H=H if use_h else None, F=F if use_f else None))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mutual", [True, False])
def test_match_sharded_tiled_equals_untiled(mesh, rng, mutual):
    """Map-scale mode (n2_tile): identical results, N2 not a multiple of
    the tile."""
    n1, n2 = 64, 150
    d1 = _descs(rng, n1)
    d2 = _descs(rng, n2)
    d2[40:72] = d1[:32]
    want = np.asarray(match_sharded(jnp.asarray(d1), jnp.asarray(d2),
                                    mesh, mutual_best=mutual))
    got = np.asarray(match_sharded(jnp.asarray(d1), jnp.asarray(d2),
                                   mesh, mutual_best=mutual, n2_tile=64))
    np.testing.assert_array_equal(got, want)
    assert (got[:32] == 40 + np.arange(32)).mean() > 0.9


def test_match_sharded_tiled_guided(mesh, rng):
    """Tiled + guided: geometric gates apply per tile, padded columns
    stay out of the second-best values."""
    n1, n2 = 48, 90
    d1 = _descs(rng, n1)
    d2 = _descs(rng, n2)
    d2[:48] = d1
    loc1 = rng.rand(n1, 2).astype(np.float32) * 100
    loc2 = np.concatenate([loc1, rng.rand(n2 - n1, 2).astype(np.float32)
                           * 100 + 500])
    H = np.eye(3, dtype=np.float32)
    want = np.asarray(match_sharded(
        jnp.asarray(d1), jnp.asarray(d2), mesh, loc1=loc1, loc2=loc2,
        H=H, hdistmax=8.0))
    got = np.asarray(match_sharded(
        jnp.asarray(d1), jnp.asarray(d2), mesh, loc1=loc1, loc2=loc2,
        H=H, hdistmax=8.0, n2_tile=32))
    np.testing.assert_array_equal(got, want)
    assert (got[:48] == np.arange(48)).mean() > 0.9


@pytest.mark.parametrize("mutual", [True, False])
def test_match_sharded_row_tiled_equals_untiled(mesh, rng, mutual):
    """Map-scale mode with ROW tiling engaged (nloc > n1_tile, non-even
    row-tile split): the nested scans' exact top-2 merges must equal the
    untiled path, including the cross-row-tile column-stat merge."""
    n1, n2 = 632, 100            # nloc=79 -> 5 row tiles of 16, 1 pad row
    d1 = _descs(rng, n1)
    d2 = _descs(rng, n2)
    d2[10:74] = d1[200:264]
    want = np.asarray(match_sharded(jnp.asarray(d1), jnp.asarray(d2),
                                    mesh, mutual_best=mutual))
    got = np.asarray(match_sharded(jnp.asarray(d1), jnp.asarray(d2),
                                   mesh, mutual_best=mutual, n2_tile=16))
    np.testing.assert_array_equal(got, want)
    assert (got[200:264] == 10 + np.arange(64)).mean() > 0.9
