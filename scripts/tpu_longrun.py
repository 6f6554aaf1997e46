"""Real-chip long-run: the 300-frame loop soak on the TPU.

Mirrors tests/test_vo_sequence.py::test_long_loop_sequence_bounded_drift
but on the real chip (the CPU soak certifies correctness; this records
the wall-clock + accuracy numbers BASELINE.md cites for configs[4]).
Run bare (axon backend): PYTHONPATH=/root/repo:/root/.axon_site python
scripts/tpu_longrun.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

from cusift_tpu.config import SiftConfig, VOConfig
from cusift_tpu.data.evaluation import ate_rmse, trajectory_path_length
from cusift_tpu.data.synthetic import two_plane_sequence
from cusift_tpu.models.odometry import MonoVO


def main():
    seq = two_plane_sequence(n_frames=300, h=240, w=320, seed=3,
                             motion_scale=0.9, path="loop", amplitude=6.0)
    sift = SiftConfig(max_kpts=384, max_kpts_per_octave=256, num_octaves=3)
    vo_cfg = VOConfig(max_keyframes=96, kf_every=4, loop_temporal_gap=30,
                      loop_min_inliers=40, loop_min_score=0.05,
                      loop_min_common=8)
    vo = MonoVO(seq.intr, sift_cfg=sift, vo_cfg=vo_cfg)
    t0 = time.time()
    vo.process(seq.images[0])
    compile_s = time.time() - t0
    t0 = time.time()
    # run() prefetches uploads on a feeder thread (~34 ms/frame hidden)
    er, et = vo.run(iter(seq.images[1:]))
    dt = time.time() - t0
    ate = ate_rmse(er, et, seq.poses_r, seq.poses_t, with_scale=True)
    raw_r, raw_t = np.stack(vo.poses_r), np.stack(vo.poses_t)
    ate_raw = ate_rmse(raw_r, raw_t, seq.poses_r, seq.poses_t,
                       with_scale=True)
    path = float(trajectory_path_length(seq.poses_r, seq.poses_t)[-1])
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "frames": 300, "compile_s": round(compile_s, 1),
        "wall_s": round(dt, 1),
        "frames_per_s": round(299 / dt, 2),
        "keyframes": vo.n_kf, "closures": vo.n_closures,
        "tracked": sum(1 for s in vo.stats if s["ok"]),
        "ate_m": round(float(ate), 4),
        "ate_raw_m": round(float(ate_raw), 4),
        "ate_pct_of_path": round(100 * float(ate) / path, 2),
    }))


if __name__ == "__main__":
    main()
