"""KITTI-00-length endurance run: 4,541 synthetic frames through StereoSlam.

The configs[4] realism claim at the sequence length the config names
(VERDICT r3 task 7).  Asserts the properties that only show up at 10x the
tested horizon:

  * zero recompile growth — per-window wall-time plateaus (a recompile in
    the steady loop costs seconds and cannot hide) and the jitted-program
    cache counts stop growing after warmup;
  * bounded memory — RSS growth after warmup stays under a fixed budget
    (eviction working: the keyframe ring + edge buckets are the only
    state that could grow);
  * one mid-run checkpoint/restore — the restored instance continues and
    finishes the sequence;
  * closures still firing in the last 10% of the run.

Frames are rendered lazily on the feeder thread (utils/pipeline.py
prefetch) so the render cost overlaps tracking.  Works on the CPU
backend (slow) or the real chip; records wall/fps/drift for BASELINE.md.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        PYTHONPATH=/root/repo python scripts/endurance.py --frames 4541
  or  PYTHONPATH=/root/repo:/root/.axon_site python scripts/endurance.py
"""

import argparse
import json
import os
import time


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return float(line.split()[1]) / 1024.0
    return 0.0


def jit_cache_sizes() -> int:
    """Total compiled-variant count across the package's jitted functions."""
    import cusift_tpu.models.slam as mslam
    import cusift_tpu.models.stereo as mstereo
    import cusift_tpu.models.local_ba as mlba
    import cusift_tpu.optim.posegraph as mpg
    total = 0
    for mod in (mslam, mstereo, mlba, mpg):
        for name in dir(mod):
            fn = getattr(mod, name)
            size = getattr(fn, "_cache_size", None)
            if callable(size):
                try:
                    total += fn._cache_size()
                except Exception:
                    pass
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4541)
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--w", type=int, default=320)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--max-keyframes", type=int, default=64)
    ap.add_argument("--window", type=int, default=500,
                    help="frames per timing window")
    ap.add_argument("--ckpt-at", type=int, default=0,
                    help="frame at which to checkpoint+restore "
                         "(0 = frames//2)")
    args = ap.parse_args()
    ckpt_at = args.ckpt_at or args.frames // 2

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    from cusift_tpu.config import SiftConfig, SlamConfig
    from cusift_tpu.data.evaluation import (ate_rmse, kitti_drift,
                                            trajectory_path_length)
    from cusift_tpu.data.synthetic import (_two_plane_pose,
                                           _two_plane_render, textured_image,
                                           DEFAULT_INTR)
    from cusift_tpu.models.stereo import StereoSlam

    h, w, n = args.h, args.w, args.frames
    intr = DEFAULT_INTR * np.array([w / 640.0, h / 480.0,
                                    w / 640.0, h / 480.0], np.float32)
    tex = {-1: textured_image(h, w, seed=3, blobs=300, detail=0.25),
           +1: textured_image(h, w, seed=104, blobs=300, detail=0.25)}
    baseline = 0.12
    tb = np.array([baseline, 0.0, 0.0])

    # Tile the PROVEN 300-frame circuit: the loop path returns exactly to
    # the start pose at s=1, so repeating it is continuous — the camera
    # revisits the same world ~n/300 times with the same per-frame
    # baseline as the validated soak.  (Scaling the amplitude with n was
    # measured broken: a 4541-frame circuit at amplitude 6*n/300 swings
    # the camera ~10x beyond the 3-6 m planes and tracking dies.)
    cycle = 300

    def pose(f):
        return _two_plane_pose(f % cycle, cycle, "loop", 0.9, amplitude=6.0)

    def render(f):
        r_wc, t_wc = pose(f)
        img_l, _ = _two_plane_render(r_wc, t_wc, tex, intr, h, w, 3.0, 6.0)
        img_r, _ = _two_plane_render(r_wc, t_wc - tb, tex, intr, h, w,
                                     3.0, 6.0)
        return img_l, img_r

    sift = SiftConfig(max_kpts=384, max_kpts_per_octave=256, num_octaves=3)
    slam_cfg = SlamConfig(max_keyframes=args.max_keyframes,
                          loop_temporal_gap=8)

    def build():
        return StereoSlam(intr, baseline, sift_cfg=sift, slam_cfg=slam_cfg)

    slam = build()
    report = {"frames": n, "chunk": args.chunk,
              "backend": jax.default_backend(), "windows": []}
    window_walls = []
    t_start = time.time()
    f = 0
    rss_after_warmup = None
    cache_after_warmup = None
    while f < n:
        stop = min(f + args.window, n, ckpt_at if f < ckpt_at else n)
        t0 = time.time()
        slam.run((render(i) for i in range(f, stop)), chunk=args.chunk)
        wall = time.time() - t0
        window_walls.append((f, stop, wall))
        report["windows"].append({
            "frames": [f, stop], "wall_s": round(wall, 1),
            "fps": round((stop - f) / wall, 2), "rss_mb": round(rss_mb(), 1),
            "jit_cache": jit_cache_sizes(),
            "closures": slam.state.n_closures,
            "kf_total": slam.state.n_kf_total})
        print(json.dumps(report["windows"][-1]), flush=True)
        f = stop
        if f == ckpt_at:
            path = "/tmp/endurance_ckpt.npz"
            slam.checkpoint(path)
            slam = build()
            slam.restore(path)
            os.remove(path)
            report["checkpoint_restore_at"] = ckpt_at
            print(json.dumps({"checkpoint_restore": ckpt_at}), flush=True)
        if rss_after_warmup is None and f >= 2 * args.window:
            rss_after_warmup = rss_mb()
            cache_after_warmup = jit_cache_sizes()

    wall_total = time.time() - t_start
    gt_r = np.stack([pose(i)[0] for i in range(n)]).astype(np.float32)
    gt_t = np.stack([pose(i)[1] for i in range(n)]).astype(np.float32)
    er, et = slam.trajectory()
    # restore replays the trajectory from the checkpoint; stitch lengths
    n_est = min(len(er), n)
    ate = ate_rmse(er[-n_est:], et[-n_est:], gt_r[-n_est:], gt_t[-n_est:])
    path_len = float(trajectory_path_length(gt_r, gt_t)[-1])
    t_pc, _ = kitti_drift(er[-n_est:], et[-n_est:], gt_r[-n_est:],
                          gt_t[-n_est:],
                          lengths=(0.25 * path_len, 0.5 * path_len), step=16)

    closures_last10 = slam.state.n_closures - next(
        (wrec["closures"] for wrec in report["windows"]
         if wrec["frames"][1] >= 0.9 * n), 0)
    steady = [wl for f0, f1, wl in window_walls[2:]
              if (f1 - f0) == args.window]
    report.update(
        wall_s=round(wall_total, 1), fps=round(n / wall_total, 2),
        ate_m=round(float(ate), 3),
        ate_pct_of_path=round(100 * float(ate) / path_len, 2),
        t_drift_pct=round(float(t_pc), 2),
        closures=slam.state.n_closures,
        closures_last10pct=closures_last10,
        kf_total=slam.state.n_kf_total, n_kf=slam.state.n_kf,
        tracked=sum(1 for m in slam.metrics if m.get("tracked", True)),
        rss_mb_warmup=rss_after_warmup, rss_mb_final=round(rss_mb(), 1),
        jit_cache_warmup=cache_after_warmup,
        jit_cache_final=jit_cache_sizes(),
        steady_window_max_over_min=(round(max(steady) / min(steady), 2)
                                    if steady else None),
    )
    del report["windows"]
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
