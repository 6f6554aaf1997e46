"""End-to-end disk -> loader -> SLAM -> ATE on both dataset formats.

VERDICT r4 task 7: `tests/test_datasets.py` proves the loaders parse the
real on-disk formats; these tests close the remaining glue by rendering a
short synthetic sequence, WRITING it to disk in the exact TUM / KITTI
layouts (8-bit PNG images, 16-bit depth at scale 5000, calib/poses
files), and running the full `load_* -> Slam/StereoSlam -> ate_rmse`
chain — so a first real-dataset session starts at "tune", not "debug the
glue".  Everything downstream of the loader is the production path,
including the 8-bit image quantisation a real dataset carries.
"""

import numpy as np
import cv2
import pytest

from cusift_tpu.config import SiftConfig, SlamConfig
from cusift_tpu.data import kitti, tum
from cusift_tpu.data.evaluation import ate_rmse
from cusift_tpu.data.synthetic import (planar_rgbd_sequence,
                                       two_plane_stereo_sequence)
from cusift_tpu.models.slam import Slam
from cusift_tpu.models.stereo import StereoSlam

SIFT = SiftConfig(max_kpts=384, max_kpts_per_octave=256, num_octaves=3)


def _rot_to_quat(r: np.ndarray) -> np.ndarray:
    """[qx, qy, qz, qw] from a rotation matrix (Shepperd's method)."""
    m = np.asarray(r, np.float64)
    tr = np.trace(m)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([(m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
                      (m[1, 0] - m[0, 1]) / s, 0.25 * s])
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(1.0 + m[i, i] - m[j, j] - m[k, k]) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[j] = (m[j, i] + m[i, j]) / s
        q[k] = (m[k, i] + m[i, k]) / s
        q[3] = (m[k, j] - m[j, k]) / s
    return q / np.linalg.norm(q)


@pytest.fixture(scope="module")
def tum_e2e_dir(tmp_path_factory):
    """Renderable 8-frame planar scene written in the real TUM layout.

    The synthetic generator uses the TUM fr1 factory intrinsics
    (data/synthetic.py:DEFAULT_INTR == tum.INTRINSICS['fr1']), so naming
    the directory freiburg1 makes `tum.intrinsics_for` part of the test.
    """
    seq = planar_rgbd_sequence(n_frames=8, h=240, w=320, seed=2,
                               motion_scale=0.6)
    d = tmp_path_factory.mktemp("e2e") / "rgbd_dataset_freiburg1_e2e"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    rgb_lines, dep_lines, gt_lines = [], [], []
    for i in range(8):
        t = 100.0 + float(seq.timestamps[i])
        img8 = np.clip(np.round(seq.images[i] * 255.0), 0, 255)
        dep16 = np.round(seq.depths[i] / tum.DEPTH_SCALE)
        assert dep16.max() < 65536          # plane at ~2 m: fits uint16
        cv2.imwrite(str(d / "rgb" / f"{t:.4f}.png"), img8.astype(np.uint8))
        cv2.imwrite(str(d / "depth" / f"{t + 0.005:.4f}.png"),
                    dep16.astype(np.uint16))
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        dep_lines.append(f"{t + 0.005:.4f} depth/{t + 0.005:.4f}.png")
        # groundtruth.txt carries CAMERA-TO-WORLD (the TUM convention);
        # the generator's poses are world-to-camera
        r_cw = seq.poses_r[i].T
        t_cw = -r_cw @ seq.poses_t[i]
        qx, qy, qz, qw = _rot_to_quat(r_cw)
        gt_lines.append(f"{t:.4f} {t_cw[0]:.6f} {t_cw[1]:.6f} {t_cw[2]:.6f} "
                        f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}")
    (d / "rgb.txt").write_text("# ts file\n" + "\n".join(rgb_lines) + "\n")
    (d / "depth.txt").write_text("# ts file\n" + "\n".join(dep_lines) + "\n")
    (d / "groundtruth.txt").write_text(
        "# ts tx ty tz qx qy qz qw\n" + "\n".join(gt_lines) + "\n")
    return str(d)


@pytest.mark.slow
def test_tum_disk_to_trajectory(tum_e2e_dir):
    """load_tum -> Slam -> ATE vs load_groundtruth, all from disk."""
    d = tum_e2e_dir
    assert tum.available(d)
    intr = tum.intrinsics_for(d)
    frames = list(tum.load_tum(d))
    assert len(frames) == 8
    slam = Slam(intr, sift_cfg=SIFT,
                slam_cfg=SlamConfig(max_keyframes=8, loop_temporal_gap=50))
    recs = slam.run((f.image, f.depth) for f in frames)
    assert sum(r.get("tracked", True) for r in recs) == 8
    rows = tum.load_groundtruth(d)
    assert len(rows) == 8
    gt_r = np.stack([r for _, r, _ in rows])
    gt_t = np.stack([t for _, _, t in rows])
    # 8-bit image + 0.2 mm depth quantisation ride the whole chain; the
    # float-rendered equivalent of this scene tracks at ATE < 0.02
    # (tests/test_slam.py::test_slam_sequence_ate)
    ate = slam.ate(gt_r, gt_t)
    assert ate < 0.05, f"disk-chain ATE {ate:.4f} m"


@pytest.fixture(scope="module")
def kitti_e2e_dir(tmp_path_factory):
    """Renderable 8-frame stereo scene in the real KITTI odometry layout."""
    seq = two_plane_stereo_sequence(n_frames=8, h=240, w=320, seed=4,
                                    motion_scale=0.7, amplitude=2.0,
                                    baseline=0.12)
    root = tmp_path_factory.mktemp("e2e_kitti")
    d = root / "sequences" / "00"
    (d / "image_0").mkdir(parents=True)
    (d / "image_1").mkdir()
    for i in range(8):
        for cam, img in (("image_0", seq.images_l[i]),
                         ("image_1", seq.images_r[i])):
            img8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
            cv2.imwrite(str(d / cam / f"{i:06d}.png"), img8)
    fx, fy, cx, cy = (float(v) for v in seq.intr)
    # P1[0,3] = -fx * baseline (rectified right camera projection)
    (d / "calib.txt").write_text(
        f"P0: {fx} 0.0 {cx} 0.0 0.0 {fy} {cy} 0.0 0.0 0.0 1.0 0.0\n"
        f"P1: {fx} 0.0 {cx} {-fx * seq.baseline} "
        f"0.0 {fy} {cy} 0.0 0.0 0.0 1.0 0.0\n")
    poses = root / "poses"
    poses.mkdir()
    lines = []
    for i in range(8):
        r_cw = seq.poses_r[i].T
        t_cw = -r_cw @ seq.poses_t[i]
        m = np.concatenate([r_cw, t_cw[:, None]], axis=1)
        lines.append(" ".join(f"{v:.9f}" for v in m.reshape(-1)))
    (poses / "00.txt").write_text("\n".join(lines) + "\n")
    return str(d), str(poses / "00.txt")


@pytest.mark.slow
def test_kitti_disk_to_trajectory(kitti_e2e_dir):
    """load_stereo -> StereoSlam -> metric ATE vs load_poses, from disk.

    Metric scale comes from the calib-file baseline alone (no scale
    alignment in the ATE), so this also covers load_baseline's P1
    decoding against a rig the renderer actually used.
    """
    seq_dir, pose_file = kitti_e2e_dir
    assert kitti.stereo_available(seq_dir)
    intr = kitti.load_calib(seq_dir)
    baseline = kitti.load_baseline(seq_dir)
    assert abs(baseline - 0.12) < 1e-6
    slam = StereoSlam(intr, baseline, sift_cfg=SIFT,
                      slam_cfg=SlamConfig(max_keyframes=16,
                                          loop_temporal_gap=50))
    recs = slam.run(kitti.load_stereo(seq_dir))
    assert len(recs) == 8
    assert sum(r.get("tracked", True) for r in recs) == 8
    gt = kitti.load_poses(pose_file)
    gt_r = np.stack([r for r, _ in gt])
    gt_t = np.stack([t for _, t in gt])
    ate = ate_rmse(*slam.trajectory(), gt_r, gt_t)
    assert ate < 0.05, f"metric disk-chain ATE {ate:.4f} m"
