"""Distributed BA over the 8-device mesh vs the single-device solver."""

import numpy as np
import jax.numpy as jnp
import pytest

from hessgpu_tpu.parallel.distributed import device_mesh
from hessgpu_tpu.sfm.ba import bundle_adjust, reprojection_rmse
from hessgpu_tpu.sfm.distributed_ba import bundle_adjust_sharded

from test_ba import _make_problem


@pytest.fixture(scope="module")
def mesh():
    return device_mesh("obs", 8)


def test_sharded_ba_converges(mesh, rng):
    gt, init, prob = _make_problem(rng)
    out, _ = bundle_adjust_sharded(init, prob, mesh, iterations=15)
    rmse = reprojection_rmse(out, prob)
    assert rmse < 0.05, rmse


def test_sharded_matches_local(mesh, rng):
    gt, init, prob = _make_problem(rng)
    out_l, _ = bundle_adjust(init, prob, iterations=12)
    out_s, _ = bundle_adjust_sharded(init, prob, mesh, iterations=12)
    # both converge to the same optimum (exact arithmetic differs: psum
    # reduction order), so compare recovered geometry, not bits
    np.testing.assert_allclose(np.asarray(out_s.t), np.asarray(out_l.t),
                               atol=1e-2)
    rms_l = reprojection_rmse(out_l, prob)
    rms_s = reprojection_rmse(out_s, prob)
    assert abs(rms_l - rms_s) < 0.02, (rms_l, rms_s)
