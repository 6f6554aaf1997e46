"""P8 exit tests (SURVEY.md §7): multi-device code on a fake 8-CPU mesh.

Golden invariant: sharded results == single-device results, bit-for-bit up
to float tolerance, for every mesh layout.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cusift_tpu.config import BAConfig, SiftConfig
from cusift_tpu.data.synthetic import ba_problem, textured_image
from cusift_tpu.models.sift import extract
from cusift_tpu.optim.ba import BAProblem, bundle_adjust
from cusift_tpu.parallel.dist_ba import (distributed_bundle_adjust,
                                         gather_points, partition_by_landmark)
from cusift_tpu.parallel.mesh import make_mesh, map_mesh
from cusift_tpu.parallel.sharded import extract_frames, retrieval_scores

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = SiftConfig(max_kpts=256, max_kpts_per_octave=128, num_octaves=3)


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == 8 and m.axis_names == ("frames", "map")
    m2 = make_mesh(frames=4, map_=2)
    assert m2.devices.shape == (4, 2)
    m3 = map_mesh()
    assert m3.devices.shape == (1, 8)


def test_sharded_extract_matches_single():
    imgs = np.stack([textured_image(120, 160, seed=s) for s in range(8)])
    mesh = make_mesh(frames=8, map_=1)
    feats = extract_frames(jnp.asarray(imgs), mesh, CFG)
    ref = extract(imgs[3], CFG)
    np.testing.assert_allclose(np.asarray(feats.x[3]), np.asarray(ref.x),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(feats.desc[3]), np.asarray(ref.desc),
                               rtol=1e-4, atol=1e-4)


def test_distributed_ba_matches_single():
    prob, _ = ba_problem(seed=3, n_cams=6, n_pts=64, pixel_noise=0.25)
    cfg = BAConfig(max_iters=8, cg_iters=30, num_fixed_poses=2)
    single = bundle_adjust(BAProblem(**{k: jnp.asarray(v) for k, v in prob.items()}), cfg)

    mesh = map_mesh(8)
    parts = partition_by_landmark(prob, 8)
    dist = distributed_bundle_adjust(parts, mesh, cfg)
    np.testing.assert_allclose(float(dist.initial_cost), float(single.initial_cost),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dist.poses_t), np.asarray(single.poses_t),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dist.poses_r), np.asarray(single.poses_r),
                               rtol=1e-3, atol=1e-4)
    pts = gather_points(parts, dist.points)
    np.testing.assert_allclose(pts, np.asarray(single.points), rtol=1e-3, atol=1e-3)


def test_distributed_ba_various_shard_counts():
    prob, _ = ba_problem(seed=7, n_cams=4, n_pts=30, pixel_noise=0.3)
    cfg = BAConfig(max_iters=4, cg_iters=20, num_fixed_poses=2)
    ref = bundle_adjust(BAProblem(**{k: jnp.asarray(v) for k, v in prob.items()}), cfg)
    for n in (2, 4):
        mesh = map_mesh(n)
        parts = partition_by_landmark(prob, n)
        dist = distributed_bundle_adjust(parts, mesh, cfg)
        np.testing.assert_allclose(np.asarray(dist.poses_t), np.asarray(ref.poses_t),
                                   rtol=1e-3, atol=1e-4)


def test_match_pairs_sharded_matches_single():
    from cusift_tpu.config import MatchConfig
    from cusift_tpu.ops.match import match
    from cusift_tpu.parallel.sharded import match_pairs_sharded

    rng = np.random.default_rng(5)
    da = rng.normal(size=(8, 64, 128)).astype(np.float32)
    db = rng.normal(size=(8, 64, 128)).astype(np.float32)
    da /= np.linalg.norm(da, axis=-1, keepdims=True)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    va = np.ones((8, 64), bool)
    vb = np.ones((8, 64), bool)
    vb[:, 10] = False
    cfg = MatchConfig(ratio_thresh=0.95)
    mesh = make_mesh(frames=8, map_=1)
    got = match_pairs_sharded(jnp.asarray(da), jnp.asarray(va),
                              jnp.asarray(db), jnp.asarray(vb), mesh, cfg)
    for i in (0, 3, 7):
        ref = match(jnp.asarray(da[i]), jnp.asarray(va[i]),
                    jnp.asarray(db[i]), jnp.asarray(vb[i]), cfg)
        np.testing.assert_array_equal(np.asarray(got.idx[i]), np.asarray(ref.idx))
        np.testing.assert_array_equal(np.asarray(got.ok[i]), np.asarray(ref.ok))
        np.testing.assert_allclose(np.asarray(got.dist[i]), np.asarray(ref.dist),
                                   rtol=1e-5, atol=1e-5)


def test_distributed_posegraph_matches_single():
    """D5: trajectory-partitioned pose graph == single-device optimize."""
    from cusift_tpu.config import PoseGraphConfig
    from cusift_tpu.data.synthetic import pose_ring
    from cusift_tpu.optim.posegraph import PoseGraph, optimize
    from cusift_tpu.parallel.dist_pg import (distributed_pg_optimize,
                                             partition_edges)

    ring = pose_ring(n=24, drift=0.03, seed=2)
    cfg = PoseGraphConfig(max_iters=10, cg_iters=50)
    g_single = PoseGraph(
        poses_r=jnp.asarray(ring["init_r"]), poses_t=jnp.asarray(ring["init_t"]),
        edge_i=jnp.asarray(ring["edge_i"]), edge_j=jnp.asarray(ring["edge_j"]),
        meas_r=jnp.asarray(ring["meas_r"]), meas_t=jnp.asarray(ring["meas_t"]),
        weight=jnp.asarray(np.ones(len(ring["edge_i"]), np.float32)))
    ref = optimize(g_single, cfg)
    assert float(ref.cost) < float(ref.initial_cost)

    for n_shards in (2, 8):
        mesh = map_mesh(n_shards)
        parts = partition_edges(ring["edge_i"], ring["edge_j"],
                                ring["meas_r"], ring["meas_t"],
                                np.ones(len(ring["edge_i"]), np.float32),
                                n_shards)
        g = PoseGraph(poses_r=jnp.asarray(ring["init_r"]),
                      poses_t=jnp.asarray(ring["init_t"]),
                      **{k: jnp.asarray(v) for k, v in parts.items()})
        dist = distributed_pg_optimize(g, mesh, cfg)
        np.testing.assert_allclose(float(dist.cost), float(ref.cost),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dist.poses_t),
                                   np.asarray(ref.poses_t),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dist.poses_r),
                                   np.asarray(ref.poses_r),
                                   rtol=1e-3, atol=1e-4)


def test_retrieval_scores():
    rng = np.random.default_rng(0)
    db = rng.normal(size=(6, 32, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    q = db[4].copy()  # query equals keyframe 4
    mesh = make_mesh(frames=1, map_=8)
    scores = retrieval_scores(jnp.asarray(q), jnp.ones(32, bool),
                              jnp.asarray(db), jnp.ones((6, 32), bool), mesh)
    assert int(np.argmax(np.asarray(scores))) == 4


def test_window_ba_dist_matches_single():
    """Streaming D4: sharded window BA == single-device window_ba.

    The static landmark-block sharding of `window_ba_dist` must reproduce
    the single-device solve (same association, same LM trajectory) at
    every shard count — the production path MonoVO/Slam take when a
    multi-device mesh exists.
    """
    from cusift_tpu.config import MatchConfig
    from cusift_tpu.data.synthetic import planar_rgbd_sequence
    from cusift_tpu.models.local_ba import window_ba
    from cusift_tpu.models.slam import _extract_with_points
    from cusift_tpu.optim.lie import se3_exp
    from cusift_tpu.parallel.dist_ba import window_ba_dist

    seq = planar_rgbd_sequence(5, 240, 320, seed=5, motion_scale=0.8,
                               detail=0.3)
    descs, valids, ptss = [], [], []
    for i in range(5):
        f, pts, _ = _extract_with_points(
            jnp.asarray(seq.images[i]), jnp.asarray(seq.depths[i]),
            jnp.asarray(seq.intr), CFG)
        descs.append(f.desc)
        valids.append(f.valid)
        ptss.append(pts)
    kd, kv, kp = jnp.stack(descs), jnp.stack(valids), jnp.stack(ptss)

    rs = np.random.default_rng(1)
    pr, pt = seq.poses_r.copy(), seq.poses_t.copy()
    for k in (2, 3, 4):
        dr, dt = (np.asarray(a) for a in se3_exp(rs.normal(scale=0.02, size=6)))
        pr[k] = dr @ seq.poses_r[k]
        pt[k] = dr @ seq.poses_t[k] + dt

    args = (kd, kv, kp, jnp.asarray(pr), jnp.asarray(pt),
            jnp.asarray(seq.intr), jnp.ones(5, jnp.float32))
    ba_cfg = BAConfig(max_iters=5, cg_iters=15, num_fixed_poses=2,
                      huber_delta=4.0)
    r0, t0, c00, c01 = window_ba(*args, MatchConfig(), ba_cfg)
    assert float(c01) < float(c00)
    for shards in (2, 4, 8):
        mesh = map_mesh(shards)
        r1, t1, c10, c11 = window_ba_dist(*args, mesh, MatchConfig(), ba_cfg)
        np.testing.assert_allclose(np.asarray(c10), np.asarray(c00),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                                   atol=5e-4)
