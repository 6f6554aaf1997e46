"""Standalone timing of the per-keyframe-event programs on the chip.

loop_profile.py measured retrieve+verify at ~460 ms/call and the
pose-graph solve at ~220 ms/call inside the streaming loop — orders
above their FLOP/byte budgets.  This probe times each program alone
(queue-and-fetch, warm) to split genuine program latency from loop
artifacts, and times the suspect sub-stages of _retrieve_verify_step.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kf_event_probe.py
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from cusift_tpu.config import (BAConfig, MatchConfig, PoseGraphConfig,
                               RansacConfig)
from cusift_tpu.models.local_ba import window_ba
from cusift_tpu.models.slam import _kf_scores, _retrieve_verify_step, _track
from cusift_tpu.optim.posegraph import PoseGraph, optimize as pg_optimize


def timeit(name, fn, iters=8):
    out = fn()
    jax.block_until_ready(out)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({name: round(dt * 1e3, 1)}), flush=True)


def main():
    rng = np.random.default_rng(0)
    kf, n = 48, 2048
    desc = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
    valid = jnp.asarray(np.ones(n, bool))
    pts = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    kd = jnp.asarray(rng.normal(size=(kf, n, 128)).astype(np.float32))
    kd = kd / jnp.linalg.norm(kd, axis=-1, keepdims=True)
    kv = jnp.asarray(np.ones((kf, n), bool))
    kp = jnp.asarray(rng.uniform(-2, 2, (kf, n, 3)).astype(np.float32))
    mc, rc = MatchConfig(), RansacConfig()
    key = jax.random.PRNGKey(0)

    timeit("kf_scores_ms", lambda: _kf_scores(
        desc, valid, kd, kv, jnp.ones(kf, bool)))
    timeit("track_ms", lambda: _track(desc, valid, pts, kd[0], kv[0],
                                      kp[0], mc, rc, key)[0].num_inliers)
    lim_ex = jnp.asarray(np.array([40, -1], np.int32))
    timeit("retrieve_verify_ms", lambda: _retrieve_verify_step(
        desc, valid, pts, kd, kv, kp, lim_ex, mc, rc, key))

    # eager PRNG split (the driver's _next_key) — suspected dispatch cost
    k = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for _ in range(16):
        k, _sub = jax.random.split(k)
    float(jnp.sum(_sub))
    print(json.dumps({"key_split_ms": round(
        (time.perf_counter() - t0) / 16 * 1e3, 2)}), flush=True)

    # pose graph at the loop's shape: 48 nodes, ~192 edges padded
    e = 192
    ei = np.arange(e) % (kf - 1)
    g = PoseGraph(
        poses_r=jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                            (kf, 3, 3)).copy()),
        poses_t=jnp.asarray(rng.normal(size=(kf, 3)).astype(np.float32)),
        edge_i=jnp.asarray(ei.astype(np.int32)),
        edge_j=jnp.asarray((ei + 1).astype(np.int32)),
        meas_r=jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                           (e, 3, 3)).copy()),
        meas_t=jnp.asarray(rng.normal(size=(e, 3)).astype(np.float32)),
        weight=jnp.asarray(np.ones(e, np.float32)))
    timeit("pose_graph_ms", lambda: pg_optimize(g, PoseGraphConfig()))
    timeit("pose_graph_dense_ms", lambda: pg_optimize(
        g, PoseGraphConfig(solver="dense")))

    # window BA at the loop's shape
    w = 5
    ba = BAConfig(max_iters=5, cg_iters=15, num_fixed_poses=2,
                  huber_delta=4.0)
    intr = jnp.asarray(np.array([600., 600., 320., 240.], np.float32))
    r0 = jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                     (w, 3, 3)).copy())
    t0_ = jnp.asarray(np.zeros((w, 3), np.float32))
    timeit("window_ba_ms", lambda: window_ba(
        kd[:w], kv[:w], kp[:w], r0, t0_, intr, jnp.ones(w, jnp.float32),
        mc, ba)[2])

    # the round-5 fused event program at the loop's shape
    from cusift_tpu.models.slam import _kf_event_step
    from cusift_tpu.config import PoseGraphConfig as PGC
    ecap = 192
    ints = np.zeros(4 + 2 * ecap, np.int32)
    ints[0] = kf - 1          # j: newest slot
    ints[1] = kf              # n_kf
    ints[2] = ecap - 1        # e_cnt: append into the last padded slot
    ints[3] = kf - 1 - 12     # lim
    ints[4:4 + kf - 1] = np.arange(kf - 1)
    ints[4 + ecap:4 + ecap + kf - 1] = np.arange(1, kf)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (ecap, 3, 3))
    blob_np = np.concatenate([
        ints[:4 + 2 * ecap].view(np.float32)[:4 + 2 * ecap],
        np.broadcast_to(np.eye(3, dtype=np.float32),
                        (kf, 3, 3)).ravel(),
        rng.normal(size=kf * 3).astype(np.float32) * 0.1,
        eye.ravel(), np.zeros(ecap * 3, np.float32),
        np.concatenate([np.ones(kf - 1, np.float32),
                        np.zeros(ecap - kf + 1, np.float32)]),
    ]).astype(np.float32)
    blob = jnp.asarray(blob_np)
    timeit("fused_event_ms", lambda: _kf_event_step(
        kd, kv, kp, intr, blob, key, 5, mc, rc,
        BAConfig(max_iters=5, cg_iters=15, num_fixed_poses=2,
                 huber_delta=4.0), PGC(solver="dense"), 0.1, 40))


if __name__ == "__main__":
    main()
