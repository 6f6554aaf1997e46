"""P7 exit test (SURVEY.md §7, BASELINE configs[3]): SLAM ATE on synthetic
RGB-D with ground truth; rigid RGB-D pair alignment; checkpoint/resume."""

import numpy as np
import jax.numpy as jnp
import pytest

from cusift_tpu.config import (MatchConfig, RansacConfig, SiftConfig,
                               SlamConfig)
from cusift_tpu.data.synthetic import planar_rgbd_sequence
from cusift_tpu.models.slam import Slam
from cusift_tpu.models.twoview import align_rgbd_pair

SIFT = SiftConfig(max_kpts=384, max_kpts_per_octave=192, num_octaves=3)
RANSAC = RansacConfig(num_hypotheses=512, inlier_thresh_3d=0.03)


@pytest.fixture(scope="module")
def seq():
    return planar_rgbd_sequence(n_frames=8, h=240, w=320, seed=2,
                                motion_scale=0.6)


def test_rgbd_pair_alignment(seq):
    """Rigid transform between frames 0 and 2 matches ground truth."""
    res = align_rgbd_pair(jnp.asarray(seq.images[0]), jnp.asarray(seq.depths[0]),
                          jnp.asarray(seq.images[2]), jnp.asarray(seq.depths[2]),
                          jnp.asarray(seq.intr), SIFT, MatchConfig(), RANSAC)
    assert bool(res.rigid.ok)
    # ground truth: X_2 = R X_0 + t with (R,t) = T_2 * T_0^-1
    r_true = seq.poses_r[2] @ seq.poses_r[0].T
    t_true = seq.poses_t[2] - r_true @ seq.poses_t[0]
    assert np.abs(np.asarray(res.rigid.r) - r_true).max() < 0.01
    assert np.linalg.norm(np.asarray(res.rigid.t) - t_true) < 0.01


def test_slam_sequence_ate(seq):
    slam = Slam(seq.intr, sift_cfg=SIFT, ransac_cfg=RANSAC,
                slam_cfg=SlamConfig(max_keyframes=16, kf_min_inliers=120,
                                    kf_max_translation=0.12,
                                    kf_max_rotation=0.12,
                                    loop_temporal_gap=3))
    for f in range(len(seq.images)):
        rec = slam.process_frame(seq.images[f], seq.depths[f])
        assert rec["kpts"] > 0
    assert slam.state.n_kf >= 2
    ate = slam.ate(seq.poses_r, seq.poses_t)
    assert ate < 0.02, f"ATE RMSE {ate:.4f} m"


def test_slam_checkpoint_resume(tmp_path, seq):
    slam = Slam(seq.intr, sift_cfg=SIFT, ransac_cfg=RANSAC,
                slam_cfg=SlamConfig(max_keyframes=16))
    for f in range(4):
        slam.process_frame(seq.images[f], seq.depths[f])
    path = str(tmp_path / "ckpt.npz")
    slam.checkpoint(path)

    slam2 = Slam(seq.intr, sift_cfg=SIFT, ransac_cfg=RANSAC,
                 slam_cfg=SlamConfig(max_keyframes=16))
    slam2.restore(path)
    r1, t1 = slam.trajectory()
    r2, t2 = slam2.trajectory()
    np.testing.assert_allclose(t1, t2, atol=1e-7)
    # resumed instance keeps tracking
    rec = slam2.process_frame(seq.images[4], seq.depths[4])
    assert rec["tracked"]


def test_chunked_run_matches_sequential():
    """chunk>1 tracking must stay geometrically consistent (same ATE)."""
    seq = planar_rgbd_sequence(10, 240, 320, motion_scale=0.5, seed=4)

    def build():
        return Slam(seq.intr, sift_cfg=SIFT,
                    slam_cfg=SlamConfig(max_keyframes=16))

    s1 = build()
    s1.run(((seq.images[i], seq.depths[i]) for i in range(10)), chunk=1)
    s3 = build()
    s3.run(((seq.images[i], seq.depths[i]) for i in range(10)), chunk=3)
    ate1 = s1.ate(seq.poses_r, seq.poses_t)
    ate3 = s3.ate(seq.poses_r, seq.poses_t)
    assert len(s3.metrics) == 10
    assert ate1 < 0.05 and ate3 < 0.05, (ate1, ate3)


def test_loop_closure_fires_and_holds_accuracy():
    """Aggressive keyframing on a closed arc must trigger retrieval +
    geometric verification + pose-graph optimisation (and keyframe
    insertion must keep working afterwards — regression: optimised poses
    came back as read-only device views)."""
    seq = planar_rgbd_sequence(24, 240, 320, motion_scale=0.9, seed=5)
    slam = Slam(seq.intr, sift_cfg=SIFT,
                ransac_cfg=RansacConfig(inlier_thresh_3d=0.03),
                slam_cfg=SlamConfig(max_keyframes=32, kf_min_inliers=220,
                                    kf_max_translation=0.06,
                                    kf_max_rotation=0.06,
                                    loop_temporal_gap=4,
                                    loop_min_score=0.05,
                                    loop_min_inliers=25))
    for i in range(24):
        slam.process_frame(seq.images[i], seq.depths[i])
    assert slam.state.n_closures >= 1
    assert slam.state.n_kf >= 10       # keyframes keep inserting post-closure
    assert slam.ate(seq.poses_r, seq.poses_t) < 0.05


def test_relocalisation_after_blackout():
    """Feeding noise frames loses tracking; the next real frame must
    relocalise against the map instead of drifting on a frozen pose."""
    seq = planar_rgbd_sequence(8, 240, 320, motion_scale=0.5, seed=6)
    rs = np.random.default_rng(0)
    slam = Slam(seq.intr, sift_cfg=SIFT,
                slam_cfg=SlamConfig(max_keyframes=16))
    for i in range(4):
        slam.process_frame(seq.images[i], seq.depths[i])
    for _ in range(2):                       # blackout: pure noise frames
        slam.process_frame(rs.random((240, 320)).astype(np.float32) * 0.05,
                           np.zeros((240, 320), np.float32))
    rec = slam.process_frame(seq.images[4], seq.depths[4])
    assert rec["tracked"]
    assert any(m.get("relocalised") for m in slam.metrics) or rec["inliers"] > 0
    # remaining frames track normally and accuracy holds on the real frames
    for i in range(5, 8):
        slam.process_frame(seq.images[i], seq.depths[i])
    assert slam.metrics[-1]["tracked"]
