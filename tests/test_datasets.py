"""TUM / KITTI loaders on synthesized on-disk fixtures.

No datasets ship in this environment, so these tests write tiny sequences
in the real on-disk formats (16-bit depth PNGs, timestamp lists, KITTI
calib/poses) and check parsing, association, scaling, and pose conventions.
"""

import os

import numpy as np
import cv2
import pytest

from cusift_tpu.data import kitti, tum


@pytest.fixture()
def tum_dir(tmp_path, rng):
    d = tmp_path / "rgbd_dataset_freiburg1_tiny"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    rgb_lines, dep_lines = [], []
    for i in range(4):
        t = 100.0 + 0.1 * i
        img = (rng.random((24, 32)) * 255).astype(np.uint8)
        dep = np.full((24, 32), 5000 * (i + 1), np.uint16)   # (i+1) metres
        cv2.imwrite(str(d / "rgb" / f"{t:.4f}.png"), img)
        cv2.imwrite(str(d / "depth" / f"{t + 0.01:.4f}.png"), dep)
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        dep_lines.append(f"{t + 0.01:.4f} depth/{t + 0.01:.4f}.png")
    (d / "rgb.txt").write_text("# ts file\n" + "\n".join(rgb_lines) + "\n")
    (d / "depth.txt").write_text("# ts file\n" + "\n".join(dep_lines) + "\n")
    # identity pose + one translated pose, camera-to-world (tx..qw)
    (d / "groundtruth.txt").write_text(
        "# ts tx ty tz qx qy qz qw\n"
        "100.0 0 0 0 0 0 0 1\n"
        "100.1 1 2 3 0 0 0 1\n")
    return str(d)


def test_tum_loader(tum_dir):
    assert tum.available(tum_dir)
    np.testing.assert_array_equal(tum.intrinsics_for(tum_dir),
                                  tum.INTRINSICS["fr1"])
    frames = list(tum.load_tum(tum_dir))
    assert len(frames) == 4
    f0 = frames[0]
    assert f0.image.shape == (24, 32) and f0.image.dtype == np.float32
    assert 0.0 <= f0.image.min() and f0.image.max() <= 1.0
    # depth scale: stored 5000*(i+1) -> (i+1) metres
    for i, f in enumerate(frames):
        np.testing.assert_allclose(f.depth, float(i + 1), atol=1e-6)
    # stride/max_frames
    assert len(list(tum.load_tum(tum_dir, max_frames=2))) == 2
    assert len(list(tum.load_tum(tum_dir, stride=2))) == 2


def test_tum_groundtruth_inversion(tum_dir):
    rows = tum.load_groundtruth(tum_dir)
    assert len(rows) == 2
    t, r_wc, t_wc = rows[1]
    # cam-to-world translation (1,2,3), identity rotation -> world-to-cam
    np.testing.assert_allclose(r_wc, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(t_wc, [-1, -2, -3], atol=1e-6)


def test_tum_association_rejects_far_stamps():
    a = [(0.0, "a0"), (1.0, "a1")]
    b = [(0.005, "b0"), (5.0, "b1")]
    pairs = tum.associate(a, b)
    assert pairs == [(0, 0)]          # a1 has no partner within 0.02 s


def test_tum_association_unsorted_b():
    """An unsorted depth list must associate the same as a sorted one
    (searchsorted needs explicit sorting + index mapping; ADVICE r1)."""
    a = [(0.0, "a0"), (1.0, "a1"), (2.0, "a2")]
    b_sorted = [(0.004, "b0"), (1.002, "b1"), (2.01, "b2")]
    b_shuffled = [b_sorted[2], b_sorted[0], b_sorted[1]]
    ref = tum.associate(a, b_sorted)
    got = tum.associate(a, b_shuffled)
    # map shuffled indices back: shuffled j -> sorted timestamp
    assert [(i, b_shuffled[j][0]) for i, j in got] == \
           [(i, b_sorted[j][0]) for i, j in ref]


@pytest.fixture()
def kitti_dir(tmp_path, rng):
    d = tmp_path / "sequences" / "00"
    (d / "image_0").mkdir(parents=True)
    for i in range(3):
        img = (rng.random((20, 40)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "image_0" / f"{i:06d}.png"), img)
    (d / "calib.txt").write_text(
        "P0: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0\n"
        "P1: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    poses = tmp_path / "poses"
    poses.mkdir()
    (poses / "00.txt").write_text(
        "1 0 0 0 0 1 0 0 0 0 1 0\n"
        "1 0 0 4 0 1 0 5 0 0 1 6\n")
    return str(d), str(poses / "00.txt")


def test_kitti_loader(kitti_dir):
    seq_dir, pose_file = kitti_dir
    assert kitti.available(seq_dir)
    np.testing.assert_allclose(kitti.load_calib(seq_dir),
                               [700.0, 700.0, 600.0, 180.0])
    imgs = list(kitti.load_images(seq_dir))
    assert len(imgs) == 3 and imgs[0].shape == (20, 40)
    assert len(list(kitti.load_images(seq_dir, max_frames=1))) == 1
    poses = kitti.load_poses(pose_file)
    assert len(poses) == 2
    r_wc, t_wc = poses[1]              # cam-to-world t=(4,5,6), R=I
    np.testing.assert_allclose(r_wc, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(t_wc, [-4, -5, -6], atol=1e-6)
