"""Real-chip north-star wall-clock: extract+match+BA at streaming rate.

BASELINE.json's north star asks for ">= 2k keypoints/frame SIFT
extract+match+BA at real-time frames/s" — this script measures exactly
that phrase on the real chip (VERDICT r3 task 2): a 640x480 stereo
sequence driven through StereoSlam (keyframes + sliding-window BA +
loop closure + eviction) at max_kpts=2048, plus the RGB-D variant, at
chunk sizes 1/8/32.  Reports frames/s INCLUDING windowed BA, measured
keypoints per frame, and the tunnel-RTT share (each host fetch costs
~38 ms here; chunk=N amortises it N-fold — a PCIe-attached host would
not pay it at all).

Run bare (axon backend):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_stereo_longrun.py
"""

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

from cusift_tpu.config import SiftConfig, SlamConfig
from cusift_tpu.data.evaluation import ate_rmse, trajectory_path_length
from cusift_tpu.data.synthetic import (planar_rgbd_sequence,
                                       two_plane_stereo_sequence)
from cusift_tpu.models.slam import Slam
from cusift_tpu.models.stereo import StereoSlam

SIFT = SiftConfig(max_kpts=2048, max_kpts_per_octave=1024, upscale=False)
SLAM = SlamConfig(max_keyframes=48, loop_temporal_gap=12)


def run_one(mode: str, seq, chunk: int, frames: int) -> dict:
    if mode == "stereo":
        slam = StereoSlam(seq.intr, seq.baseline, sift_cfg=SIFT,
                          slam_cfg=SLAM)
        pairs = list(zip(seq.images_l, seq.images_r))
    else:
        slam = Slam(seq.intr, sift_cfg=SIFT, slam_cfg=SLAM)
        pairs = list(zip(seq.images, seq.depths))
    t0 = time.time()
    slam.run(pairs[:2], chunk=chunk)       # bootstrap + first real step
    compile_s = time.time() - t0
    t0 = time.time()
    slam.run(pairs[2:frames], chunk=chunk)
    dt = time.time() - t0
    n = frames - 2
    kpts = [m["kpts"] for m in slam.metrics if m["kpts"]]
    er, et = slam.trajectory()
    ate = ate_rmse(er, et, seq.poses_r[:frames], seq.poses_t[:frames])
    path = float(trajectory_path_length(seq.poses_r[:frames],
                                        seq.poses_t[:frames])[-1])
    n_ba = sum(1 for m in slam.metrics if m.get("keyframe"))
    fetches = -(-n // chunk)               # one packed fetch per chunk
    return {
        "mode": mode, "chunk": chunk, "frames": frames,
        "compile_s": round(compile_s, 1),
        "wall_s": round(dt, 1), "frames_per_s": round(n / dt, 2),
        "ms_per_frame": round(1e3 * dt / n, 1),
        "tunnel_rtt_ms_per_frame": round(38.0 * fetches / n, 1),
        "kpts_per_frame_mean": round(float(np.mean(kpts)), 1),
        "keyframes": slam.state.n_kf_total,
        "ba_solves": n_ba, "closures": slam.state.n_closures,
        "tracked": sum(1 for m in slam.metrics if m.get("tracked", True)),
        "ate_m": round(float(ate), 4),
        "ate_pct_of_path": round(100 * float(ate) / max(path, 1e-9), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--chunks", type=int, nargs="+", default=(1, 8, 32))
    ap.add_argument("--modes", nargs="+", default=("stereo", "rgbd"))
    args = ap.parse_args()

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    seqs = {}
    if "stereo" in args.modes:
        # blobs=800 + 4 detail octaves: the bench scene's texture recipe,
        # so the run carries >= 2k valid keypoints/frame (the north-star
        # phrase) instead of the sparse default's ~780
        seqs["stereo"] = two_plane_stereo_sequence(
            n_frames=args.frames, h=480, w=640, seed=3, motion_scale=0.9,
            path="loop", amplitude=6.0, blobs=800, detail_octaves=4)
    if "rgbd" in args.modes:
        seqs["rgbd"] = planar_rgbd_sequence(
            n_frames=args.frames, h=480, w=640, seed=3, motion_scale=0.9)
    for mode in args.modes:
        for chunk in args.chunks:
            print(json.dumps(run_one(mode, seqs[mode], chunk, args.frames)),
                  flush=True)


if __name__ == "__main__":
    main()
