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


def test_reconstruct_mono_depth_free():
    """Depth-free incremental SfM (VERDICT r4 task 4): a 10-frame mono
    sequence — no depth input anywhere — recovers the trajectory to ATE
    tolerance (scale-aligned; monocular gauge) and reconstructs the
    two-plane scene's real structure (the far/near depth ratio is a
    gauge-free observable)."""
    from cusift_tpu.data.synthetic import two_plane_sequence
    from cusift_tpu.models.sfm import reconstruct_mono

    seq = two_plane_sequence(10, 240, 320, seed=3, motion_scale=0.8)
    rec = reconstruct_mono(
        seq.images, seq.intr,
        sift_cfg=SiftConfig(max_kpts=384, max_kpts_per_octave=192,
                            num_octaves=3),
        ransac_cfg=RansacConfig(num_hypotheses=512))
    assert rec.n_tracks >= 100, rec.n_tracks
    assert rec.n_obs >= 2 * rec.n_tracks

    ate = ate_rmse(rec.poses_r, rec.poses_t, seq.poses_r, seq.poses_t,
                   with_scale=True)
    path = np.linalg.norm(np.diff(
        -np.einsum("nij,ni->nj", seq.poses_r, seq.poses_t), axis=0),
        axis=-1).sum()
    assert ate < 0.05 * path, (ate, path)

    # structure: reconstructed landmarks sit in front of the init camera,
    # and the scene's two planes (z = 3 and z = 6) appear as a ~2x
    # far/near depth ratio — scale-free, so no gauge alignment needed
    z0 = (rec.points @ rec.poses_r[0].T + rec.poses_t[0])[:, 2]
    z0 = z0[np.abs(z0) > 1e-6]
    assert np.mean(z0 > 0) > 0.95, float(np.mean(z0 > 0))
    z0 = z0[z0 > 0]
    lo = np.median(z0[z0 <= np.median(z0)])
    hi = np.median(z0[z0 > np.median(z0)])
    assert 1.4 < hi / lo < 2.6, (lo, hi)
