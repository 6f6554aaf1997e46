"""BASELINE configs[2] exit test: small RGB-D SfM reconstruction."""

import numpy as np
import pytest

from cusift_tpu.config import BAConfig, RansacConfig, SiftConfig
from cusift_tpu.data.evaluation import ate_rmse
from cusift_tpu.data.synthetic import planar_rgbd_sequence
from cusift_tpu.models.sfm import reconstruct_rgbd


@pytest.fixture(scope="module")
def recon():
    seq = planar_rgbd_sequence(n_frames=6, h=240, w=320, seed=4,
                               motion_scale=0.5)
    rec = reconstruct_rgbd(
        seq.images, seq.depths, seq.intr,
        sift_cfg=SiftConfig(max_kpts=384, max_kpts_per_octave=192,
                            num_octaves=3),
        ransac_cfg=RansacConfig(num_hypotheses=512, inlier_thresh_3d=0.03),
        ba_cfg=BAConfig(max_iters=12, cg_iters=30, huber_delta=4.0,
                        num_fixed_poses=2),
        max_tracks=1024)
    return seq, rec


def test_tracks_and_observations(recon):
    _, rec = recon
    # track count is a chaotic statistic (ratio-test flips cascade through
    # the union-find), so assert robust structure only: a healthy track
    # graph and multi-frame coverage
    assert rec.n_tracks > 40
    assert rec.n_obs / rec.n_tracks >= 2.0      # tracks span >= 2 frames


def test_ba_converged(recon):
    _, rec = recon
    assert float(rec.ba.cost) < float(rec.ba.initial_cost)
    assert np.isfinite(rec.points).all()


def test_trajectory_accuracy(recon):
    seq, rec = recon
    ate = ate_rmse(rec.poses_r, rec.poses_t, seq.poses_r, seq.poses_t)
    assert ate < 0.02, f"SfM ATE {ate:.4f} m"


def test_landmarks_on_plane(recon):
    """Synthetic scene is the z=2 world plane; landmarks should lie on it."""
    _, rec = recon
    z = rec.points[:, 2]
    assert np.median(np.abs(z - 2.0)) < 0.05
