"""TUM/KITTI sequence harness on synthetic fixture files."""

import os

import numpy as np
import pytest

from hessgpu_tpu.sfm.datasets import (load_kitti_poses, load_tum_sequence,
                                      quat_to_rot)


def test_quat_identity():
    np.testing.assert_allclose(quat_to_rot(0, 0, 0, 1), np.eye(3), atol=1e-12)


def test_quat_z_90():
    R = quat_to_rot(0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4))
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(R, want, atol=1e-12)


def test_tum_loader(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("# comment\n")
        for i in range(5):
            f.write(f"{100.0 + i * 0.1:.4f} rgb/{i}.png\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        for i in range(50):
            t = 100.0 + i * 0.01
            f.write(f"{t:.4f} {i * 0.1:.3f} 0 0 0 0 0 1\n")

    seq = load_tum_sequence(root)
    assert len(seq["image_paths"]) == 5
    assert seq["image_paths"][0].endswith("rgb/0.png")
    assert seq["gt_centers"].shape == (5, 3)
    # associated centers advance with time
    assert (np.diff(seq["gt_centers"][:, 0]) > 0).all()

    seq2 = load_tum_sequence(root, max_frames=2, stride=2)
    assert len(seq2["image_paths"]) == 2


def test_kitti_poses(tmp_path):
    p = str(tmp_path / "poses.txt")
    with open(p, "w") as f:
        for i in range(3):
            m = np.hstack([np.eye(3), [[i], [0], [0]]]).reshape(-1)
            f.write(" ".join(f"{v:.6e}" for v in m) + "\n")
    Rs, ts = load_kitti_poses(p)
    assert Rs.shape == (3, 3, 3)
    np.testing.assert_allclose(ts[:, 0], [0, 1, 2])


def test_sequence_ate_synthetic(tmp_path, gray_small):
    """End-to-end: render a translating crop sequence, run the engine."""
    from PIL import Image
    from hessgpu_tpu.sfm.datasets import evaluate_sequence_ate
    from hessgpu_tpu import SiftConfig

    # synthetic "sequence": shifted crops of a textured image simulate a
    # panning camera; ground truth is a straight line
    paths = []
    big = np.tile(gray_small, (2, 2))
    for i in range(3):
        crop = big[10:150, 10 + 12 * i: 190 + 12 * i]
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray((crop * 255).astype(np.uint8)).save(p)
        paths.append(p)
    gt = np.stack([np.array([i * 1.0, 0, 0]) for i in range(3)])

    out = evaluate_sequence_ate(paths, gt, cfg=SiftConfig(), ba_every=2,
                                min_matches=15)
    # a pure pan is degenerate for two-view geometry; we only require the
    # harness to run end-to-end and register at least the first pair
    assert out["registered"] >= 2 or out["ate"] == float("inf")


def test_synthetic_tum_render_and_reconstruct(tmp_path):
    """North-star stand-in end to end at test scale: render a synthetic
    TUM-layout sequence (sfm/synthetic.py), load it through the TUM
    loader, run detect -> match -> incremental SfM -> distributed BA on
    the 8-device mesh, and check ATE against the exact ground truth."""
    import jax

    from hessgpu_tpu.parallel.batch import data_parallel_mesh
    from hessgpu_tpu.sfm.datasets import (evaluate_sequence_ate,
                                          load_tum_sequence)
    from hessgpu_tpu.sfm.synthetic import write_tum_sequence

    root = str(tmp_path / "synth")
    meta = write_tum_sequence(root, n_frames=8, h=240, w=320)
    seq = load_tum_sequence(root)
    assert len(seq["image_paths"]) == 8
    assert seq["gt_centers"].shape == (8, 3)
    np.testing.assert_allclose(seq["gt_centers"], meta["gt_centers"],
                               atol=1e-5)

    mesh = data_parallel_mesh(8)
    res = evaluate_sequence_ate(
        seq["image_paths"], seq["gt_centers"], K=meta["K"],
        mesh=mesh, min_matches=20, loop_closure=False)
    assert res["registered"] >= 6, res
    # scene spans ~4 units; sub-0.15 ATE means the geometry is real
    assert res["ate"] < 0.15, res
