"""Batched detection and shape bucketing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hessgpu_tpu import HessianSift, SiftConfig
from hessgpu_tpu.parallel.batch import (bucket_images, data_parallel_mesh,
                                        detect_batch)


def test_detect_batch_matches_single(gray_small):
    imgs = np.stack([gray_small, gray_small[::-1].copy()])
    table = detect_batch(imgs, SiftConfig())
    counts = np.asarray(table.count())
    assert counts.shape == (2,)

    single = HessianSift(SiftConfig()).run(imgs[0])
    assert counts[0] == single["x"].shape[0]
    # same features in slot order
    valid0 = np.asarray(table.valid[0])
    np.testing.assert_allclose(np.asarray(table.x[0])[valid0],
                               single["x"], atol=1e-5)


def test_detect_batch_sharded(gray_small):
    mesh = data_parallel_mesh(8)
    imgs = np.stack([np.roll(gray_small, s, axis=1) for s in range(8)])
    table = detect_batch(imgs, SiftConfig(), mesh=mesh)
    counts = np.asarray(table.count())
    assert counts.shape == (8,)
    assert (counts > 0).all()
    # shifting columns shouldn't radically change feature counts
    assert counts.max() < counts.min() * 2 + 50


def test_run_pipeline_batched_equals_single(gray_small):
    """run_pipeline_batched (one program, flat in B) == per-image
    run_pipeline, field for field, including the aux count reports."""
    from hessgpu_tpu.pyramid import (make_plan, run_pipeline,
                                     run_pipeline_batched)

    imgs = np.stack([gray_small, gray_small[::-1].copy(),
                     gray_small[:, ::-1].copy()])
    cfg = SiftConfig()
    plan = make_plan(*gray_small.shape, cfg)
    bt, baux = run_pipeline_batched(jnp.asarray(imgs), plan, cfg)
    for i in range(imgs.shape[0]):
        st, saux = run_pipeline(jnp.asarray(imgs[i]), plan, cfg)
        for f in st._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(bt, f)[i]), np.asarray(getattr(st, f)),
                err_msg=f"field {f}, image {i}")
        np.testing.assert_array_equal(np.asarray(baux["level_counts"][i]),
                                      np.asarray(saux["level_counts"]))
        assert int(baux["pre_count"][i]) == int(saux["pre_count"])


def test_batched_pallas_kernels_equal_single(gray_small):
    """Interpret-mode check that the (B, row-blocks)-gridded conv and
    detect kernels reproduce their single-image variants exactly."""
    from hessgpu_tpu.ops.pallas.conv import octave_chain_pallas
    from hessgpu_tpu.ops.pallas.detect import detect_octave_pallas
    from hessgpu_tpu.params import gaussian_taps

    rng = np.random.RandomState(3)
    taps = [tuple(gaussian_taps(s)) for s in (1.2, 1.4, 1.6, 1.8)]
    octs = []
    for _ in range(2):
        base = rng.rand(192, 256).astype(np.float32)
        octs.append(np.asarray(octave_chain_pallas(
            jnp.asarray(base), taps, interpret=True)))
    batched = np.asarray(octave_chain_pallas(
        jnp.asarray(np.stack([o[0] for o in octs])), taps, interpret=True))
    for i in range(2):
        np.testing.assert_array_equal(batched[i], octs[i])

    norms = [1.0, 2.0, 3.0, 4.0, 5.0]
    kw = dict(threshold=1e-5, edge_threshold=10.0, interpret=True)
    single = [detect_octave_pallas(jnp.asarray(octs[i]), norms, [1, 2, 3],
                                   **kw) for i in range(2)]
    both = detect_octave_pallas(jnp.asarray(np.stack(octs)), norms,
                                [1, 2, 3], **kw)
    total = 0
    for i in range(2):
        for f in single[i][0]._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(both[0], f)[i]),
                np.asarray(getattr(single[i][0], f)),
                err_msg=f"map field {f}")
        total += int(np.asarray(both[0].valid[i]).sum())
        np.testing.assert_array_equal(np.asarray(both[1][i]),
                                      np.asarray(single[i][1]))
        np.testing.assert_array_equal(np.asarray(both[2][i]),
                                      np.asarray(single[i][2]))
    assert total > 10, "degenerate: no detections exercised"


def test_bucket_images():
    imgs = [np.ones((100, 150), np.float32),
            np.ones((240, 320), np.float32),
            np.ones((90, 140), np.float32)]
    out = bucket_images(imgs, buckets=[(120, 160), (240, 320)])
    assert set(out.keys()) == {(120, 160), (240, 320)}
    arr, idxs, shapes = out[(120, 160)]
    assert arr.shape == (2, 120, 160)
    assert sorted(idxs) == [0, 2]
    arr2, idxs2, _ = out[(240, 320)]
    assert idxs2 == [1]
