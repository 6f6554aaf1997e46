"""Locate evict's ~504 ms/call inside the streaming loop (round-5 probe).

loop_profile.py round-5 re-run measured _evict_keyframe at 504 ms/call
while its pieces (host victim selection, three device ring gathers)
should cost ~1 dispatch + 1 cached upload.  This times each segment
in-loop by monkeypatching.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/evict_probe.py
"""

import json
import time
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

from cusift_tpu.config import SiftConfig, SlamConfig
from cusift_tpu.data.synthetic import two_plane_stereo_sequence
from cusift_tpu.models.stereo import StereoSlam

TIMES = defaultdict(float)
COUNTS = defaultdict(int)


def main():
    frames = 80
    seq = two_plane_stereo_sequence(n_frames=frames, h=480, w=640, seed=3,
                                    motion_scale=0.9, path="loop",
                                    amplitude=6.0, blobs=800,
                                    detail_octaves=4)
    sift = SiftConfig(max_kpts=2048, max_kpts_per_octave=1024)
    slam = StereoSlam(seq.intr, seq.baseline, sift_cfg=sift,
                      slam_cfg=SlamConfig(max_keyframes=24,
                                          loop_temporal_gap=12))

    orig_remove = slam._remove_keyframe_slot
    from cusift_tpu.models import evict as evict_mod
    orig_select = evict_mod.select_victim

    def timed_select(*a, **k):
        t0 = time.perf_counter()
        out = orig_select(*a, **k)
        TIMES["select_victim"] += time.perf_counter() - t0
        COUNTS["select_victim"] += 1
        return out

    evict_mod.select_victim = timed_select

    def timed_remove(v):
        s = slam.state
        t0 = time.perf_counter()
        # --- replicate the body with per-segment timers ---
        rv, tv = s.kf_pose_r[v].copy(), s.kf_pose_t[v].copy()
        for i, ref in enumerate(s.traj_ref):
            if ref == v:
                s.traj_rel_t[i] = s.traj_rel_r[i] @ tv + s.traj_rel_t[i]
                s.traj_rel_r[i] = s.traj_rel_r[i] @ rv
                s.traj_ref[i] = -1
            elif ref > v:
                s.traj_ref[i] = ref - 1
        t1 = time.perf_counter()
        TIMES["traj_bake"] += t1 - t0

        ins = [k for k in range(len(s.edge_i))
               if s.edge_j[k] == v and s.edge_i[k] != v]
        outs = [k for k in range(len(s.edge_i))
                if s.edge_i[k] == v and s.edge_j[k] != v]
        spliced = None
        if ins and outs:
            a, b = ins[0], outs[0]
            if s.edge_i[a] != s.edge_j[b]:
                spliced = (s.edge_i[a], s.edge_j[b],
                           s.meas_r[a] @ s.meas_r[b],
                           s.meas_r[a] @ s.meas_t[b] + s.meas_t[a],
                           min(s.weight[a], s.weight[b]))
        keep = [k for k in range(len(s.edge_i))
                if s.edge_i[k] != v and s.edge_j[k] != v]

        def shift(x):
            return x - 1 if x > v else x

        s.edge_i = [shift(s.edge_i[k]) for k in keep]
        s.edge_j = [shift(s.edge_j[k]) for k in keep]
        s.meas_r = [s.meas_r[k] for k in keep]
        s.meas_t = [s.meas_t[k] for k in keep]
        s.weight = [s.weight[k] for k in keep]
        if spliced is not None:
            slam._add_edge(shift(spliced[0]), shift(spliced[1]),
                           spliced[2], spliced[3], spliced[4])
        t2 = time.perf_counter()
        TIMES["edge_rebuild"] += t2 - t1

        kfcap = slam.cfg.max_keyframes
        pnp = np.concatenate(
            [np.arange(v), np.arange(v + 1, kfcap), [v]]).astype(np.int32)
        perm = slam._dev(("perm", v, kfcap), lambda: pnp)
        t3 = time.perf_counter()
        TIMES["perm_upload"] += t3 - t2

        s.kf_desc = s.kf_desc[perm]
        s.kf_valid = s.kf_valid[perm]
        s.kf_pts = s.kf_pts[perm]
        t4 = time.perf_counter()
        TIMES["ring_gather_dispatch"] += t4 - t3

        s.kf_pose_r = s.kf_pose_r[pnp].copy()
        s.kf_pose_t = s.kf_pose_t[pnp].copy()
        s.n_kf -= 1
        ref = slam._ref_cache[0]
        if ref > v:
            slam._ref_cache = (ref - 1,) + slam._ref_cache[1:]
        if slam._chunk_ref is not None and slam._chunk_ref[0] > v:
            slam._chunk_ref[0] -= 1
        TIMES["host_tail"] += time.perf_counter() - t4
        COUNTS["remove"] += 1

    slam._remove_keyframe_slot = timed_remove

    pairs = list(zip(seq.images_l, seq.images_r))
    slam.run(pairs, chunk=8)
    rep = {"frames": frames, "keyframes": slam.state.n_kf_total,
           "evictions": COUNTS["remove"]}
    for k in sorted(TIMES, key=TIMES.get, reverse=True):
        n = max(COUNTS.get(k, COUNTS["remove"]), 1)
        rep[k] = {"total_ms": round(1e3 * TIMES[k], 1),
                  "ms_per_call": round(1e3 * TIMES[k] / n, 1)}
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
