"""PnP rescue of essential-matrix failures (VERDICT r4 task 3).

The 1000-frame sub-SNR soak loses a third of its frames to essential
RANSAC failures (vanishing parallax collapses the cheirality majority)
while the MATCHES on those frames are fine — `pair_step` now re-measures
the pose with PnP RANSAC against the reference frame's chain-scaled
triangulated depths before surrendering to constant-velocity carry
(models/odometry.py pair_step, VOConfig.pnp_rescue).
"""

from dataclasses import replace

import numpy as np
import pytest

from cusift_tpu.config import RansacConfig, SiftConfig, VOConfig
from cusift_tpu.data.evaluation import ate_rmse, trajectory_path_length
from cusift_tpu.data.synthetic import two_plane_sequence
from cusift_tpu.models.odometry import MonoVO

SIFT = SiftConfig(max_kpts=384, max_kpts_per_octave=256, num_octaves=3)


def test_pnp_rescue_supplies_pose_when_essential_fails():
    """Deterministic activation: sabotage the ESSENTIAL inlier gate only.

    inlier_thresh_epi=1e-9 makes every essential hypothesis score < 8
    inliers (ok=False on every pair) while inlier_thresh_pnp stays
    normal — so frames after the chain is seeded must be tracked by the
    rescue alone, with poses matching ground truth.
    """
    seq = two_plane_sequence(n_frames=6, h=240, w=320, seed=7,
                             motion_scale=0.8)
    vo = MonoVO(seq.intr, sift_cfg=SIFT)
    for img in seq.images[:3]:          # seed the depth chain normally
        vo.process(img)
    assert vo.stats[-1]["ok"] and not vo.stats[-1]["pnp_ok"]
    vo.ransac_cfg = replace(vo.ransac_cfg, inlier_thresh_epi=1e-9)
    for img in seq.images[3:]:
        vo.process(img)
    rescued = [s for s in vo.stats[2:]]
    assert all(s["ok"] for s in rescued), [s["ok"] for s in rescued]
    assert all(s["pnp_ok"] for s in rescued)
    assert all(s["pnp_inliers"] >= 8 for s in rescued)
    # the rescued poses are geometry, not carry: full-trajectory ATE
    # (scale-aligned, monocular) stays at the healthy-run level
    er, et = vo.trajectory()
    ate = ate_rmse(er, et, seq.poses_r, seq.poses_t, with_scale=True)
    path = trajectory_path_length(seq.poses_r, seq.poses_t)[-1]
    assert ate < 0.05 * path, (ate, path)


def test_pnp_rescue_off_restores_carry_behaviour():
    """pnp_rescue=False: the sabotaged pairs fall back to carry (ok=False)."""
    seq = two_plane_sequence(n_frames=5, h=240, w=320, seed=7,
                             motion_scale=0.8)
    vo = MonoVO(seq.intr, sift_cfg=SIFT,
                vo_cfg=VOConfig(pnp_rescue=False, kf_every=100))
    for img in seq.images[:3]:
        vo.process(img)
    vo.ransac_cfg = replace(vo.ransac_cfg, inlier_thresh_epi=1e-9)
    for img in seq.images[3:]:
        vo.process(img)
    assert not vo.stats[-1]["ok"] and not vo.stats[-1]["pnp_ok"]


def test_pnp_rescue_transfers_depth_chain():
    """Rescued frames keep the chain alive: the pair AFTER a rescued one
    still has depth anchors (scale_common > 0 once essential recovers)."""
    seq = two_plane_sequence(n_frames=8, h=240, w=320, seed=7,
                             motion_scale=0.8)
    vo = MonoVO(seq.intr, sift_cfg=SIFT)
    for img in seq.images[:3]:
        vo.process(img)
    sab = replace(vo.ransac_cfg, inlier_thresh_epi=1e-9)
    healthy = replace(vo.ransac_cfg)
    vo.ransac_cfg = sab
    vo.process(seq.images[3])           # rescued pair
    assert vo.stats[-1]["pnp_ok"]
    vo.ransac_cfg = healthy
    vo.process(seq.images[4])           # essential again; chain must hold
    s = vo.stats[-1]
    assert s["ok"] and not s["pnp_ok"]
    # the scale chain survived the rescued frame: the healthy pair found
    # carried depths to ratio against instead of re-anchoring from zero
    assert s["scale_common"] >= 8, s


@pytest.mark.slow
def test_sub_snr_soak_rescue_recovers_lost_frames():
    """Mini sub-SNR soak (the 1000-frame regime's per-frame baseline):
    with the rescue the tracked fraction clears 85% (the regime measured
    ~67% tracked in round 4 without it), drift stays bounded, and the
    rescue demonstrably fires."""
    seq = two_plane_sequence(n_frames=250, h=240, w=320, seed=3,
                             motion_scale=0.9, path="loop", amplitude=5.0)
    vo_cfg = VOConfig(max_keyframes=64, kf_every=4, loop_temporal_gap=30,
                      loop_min_inliers=25, loop_min_score=0.05,
                      loop_min_common=8)
    vo = MonoVO(seq.intr, sift_cfg=SIFT, vo_cfg=vo_cfg)
    er, et = vo.run(iter(seq.images))
    tracked = sum(1 for s in vo.stats if s["ok"])
    n_rescued = sum(1 for s in vo.stats if s["pnp_ok"])
    assert tracked >= 0.85 * len(vo.stats), (tracked, len(vo.stats))
    ate = ate_rmse(er, et, seq.poses_r, seq.poses_t, with_scale=True)
    raw = ate_rmse(np.stack(vo.poses_r), np.stack(vo.poses_t),
                   seq.poses_r, seq.poses_t, with_scale=True)
    assert ate <= raw * 1.02 + 1e-6, (ate, raw)
    path = trajectory_path_length(seq.poses_r, seq.poses_t)[-1]
    assert ate < 0.15 * path, (ate, path)
    # observability: the soak regime actually exercises the rescue
    assert n_rescued >= 1, "sub-SNR soak never fired the PnP rescue"
