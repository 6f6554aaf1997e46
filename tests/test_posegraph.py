"""Pose-graph optimisation: loop closure fixes integrated odometry drift."""

import numpy as np
import jax.numpy as jnp
import pytest

from cusift_tpu.config import PoseGraphConfig
from cusift_tpu.data.synthetic import pose_ring
from cusift_tpu.optim.posegraph import PoseGraph, cost, optimize


def _graph(d):
    return PoseGraph(poses_r=jnp.asarray(d["init_r"]), poses_t=jnp.asarray(d["init_t"]),
                     edge_i=jnp.asarray(d["edge_i"]), edge_j=jnp.asarray(d["edge_j"]),
                     meas_r=jnp.asarray(d["meas_r"]), meas_t=jnp.asarray(d["meas_t"]),
                     weight=jnp.asarray(d["weight"]))


@pytest.fixture(scope="module")
def ring():
    return pose_ring(n=20, drift=0.02, seed=1)


def test_cost_decreases(ring):
    g = _graph(ring)
    res = optimize(g, PoseGraphConfig(max_iters=15))
    assert float(res.cost) < 0.1 * float(res.initial_cost)


def test_drift_reduced(ring):
    g = _graph(ring)
    res = optimize(g, PoseGraphConfig(max_iters=20))

    def traj_err(r, t):
        # camera centres: c = -R^T t
        c = -np.einsum("nij,nj->ni", np.swapaxes(np.asarray(r), 1, 2), np.asarray(t))
        cg = -np.einsum("nij,nj->ni", np.swapaxes(ring["gt_r"], 1, 2), ring["gt_t"])
        return np.linalg.norm(c - cg, axis=-1)

    before = traj_err(ring["init_r"], ring["init_t"])
    after = traj_err(res.poses_r, res.poses_t)
    assert after.max() < 0.5 * before.max()
    assert after.mean() < 0.1


def test_zero_weight_edges_ignored(ring):
    g = _graph(ring)
    # add a bogus edge with zero weight: result unchanged
    gi = g._replace(
        edge_i=jnp.concatenate([g.edge_i, jnp.array([0], jnp.int32)]),
        edge_j=jnp.concatenate([g.edge_j, jnp.array([10], jnp.int32)]),
        meas_r=jnp.concatenate([g.meas_r, jnp.eye(3)[None]]),
        meas_t=jnp.concatenate([g.meas_t, jnp.array([[9.0, 9.0, 9.0]])]),
        weight=jnp.concatenate([g.weight, jnp.array([0.0])]),
    )
    ra = optimize(g, PoseGraphConfig(max_iters=8))
    rb = optimize(gi, PoseGraphConfig(max_iters=8))
    np.testing.assert_allclose(np.asarray(ra.poses_t), np.asarray(rb.poses_t), atol=1e-5)


def test_perfect_graph_zero_cost(ring):
    g = _graph(ring)._replace(poses_r=jnp.asarray(ring["gt_r"]),
                              poses_t=jnp.asarray(ring["gt_t"]))
    # replace measurements with exact relative transforms
    gt_r, gt_t = ring["gt_r"], ring["gt_t"]
    i, j = ring["edge_i"], ring["edge_j"]
    rrel = np.einsum("eab,ecb->eac", gt_r[i], gt_r[j])  # R_i R_j^T
    trel = gt_t[i] - np.einsum("eab,eb->ea", rrel, gt_t[j])
    g = g._replace(meas_r=jnp.asarray(rrel), meas_t=jnp.asarray(trel))
    assert float(cost(g)) < 1e-8


def test_dense_solver_matches_cg(ring):
    """solver="dense" (Cholesky on the assembled normal equations)
    converges to the CG path's optimum on the same ring."""
    g = _graph(ring)
    rcg = optimize(g, PoseGraphConfig(max_iters=15))
    rde = optimize(g, PoseGraphConfig(max_iters=15, solver="dense"))
    assert float(rde.cost) < 0.1 * float(rde.initial_cost)
    np.testing.assert_allclose(float(rde.cost), float(rcg.cost),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rde.poses_t),
                               np.asarray(rcg.poses_t), rtol=1e-2, atol=1e-3)


def test_dense_solver_padded_graph(ring):
    """Dense path on the SLAM driver's padded shape: dead ring slots and
    weight-0 padding edges must not sink the Cholesky (zero diagonal
    blocks get a unit diagonal / zero rhs => dx = 0 there)."""
    n = ring["init_r"].shape[0]
    kfcap, ecap = n + 12, 64
    e = len(ring["edge_i"])
    pr = np.broadcast_to(np.eye(3, dtype=np.float32), (kfcap, 3, 3)).copy()
    pt = np.zeros((kfcap, 3), np.float32)
    pr[:n], pt[:n] = ring["init_r"], ring["init_t"]
    ei = np.zeros(ecap, np.int32)
    ej = np.zeros(ecap, np.int32)
    mr = np.broadcast_to(np.eye(3, dtype=np.float32), (ecap, 3, 3)).copy()
    mt = np.zeros((ecap, 3), np.float32)
    w = np.zeros(ecap, np.float32)
    ei[:e], ej[:e] = ring["edge_i"], ring["edge_j"]
    mr[:e], mt[:e], w[:e] = ring["meas_r"], ring["meas_t"], 1.0
    gp = PoseGraph(jnp.asarray(pr), jnp.asarray(pt), jnp.asarray(ei),
                   jnp.asarray(ej), jnp.asarray(mr), jnp.asarray(mt),
                   jnp.asarray(w))
    ref = optimize(_graph(ring), PoseGraphConfig(max_iters=10,
                                                 solver="dense"))
    res = optimize(gp, PoseGraphConfig(max_iters=10, solver="dense"))
    assert not bool(jnp.any(jnp.isnan(res.poses_t)))
    np.testing.assert_allclose(float(res.cost), float(ref.cost),
                               rtol=1e-3, atol=1e-6)
    # dead slots keep their identity poses exactly
    np.testing.assert_allclose(np.asarray(res.poses_t[n:]), 0.0, atol=1e-6)


def test_dense_solver_robust_kernel(ring):
    """IRLS robust reweighting composes with the dense solver."""
    g = _graph(ring)
    res = optimize(g, PoseGraphConfig(max_iters=15, solver="dense",
                                      huber_delta=1.0))
    assert float(res.cost) < 0.5 * float(res.initial_cost)


def test_robust_kernel_bounds_outlier_edge(ring):
    """SE(3) variant of the Sim(3) outlier test: robust kernels keep a
    garbage high-weight loop edge from dragging the solution below its
    plain-solve quality."""
    g = _graph(ring)
    rng = np.random.default_rng(5)
    bad_t = rng.normal(size=3) * 2.0
    gi = g._replace(
        edge_i=jnp.concatenate([g.edge_i, jnp.array([2], jnp.int32)]),
        edge_j=jnp.concatenate([g.edge_j, jnp.array([12], jnp.int32)]),
        meas_r=jnp.concatenate([g.meas_r, jnp.eye(3)[None]]),
        meas_t=jnp.concatenate([g.meas_t,
                                jnp.asarray(bad_t, jnp.float32)[None]]),
        weight=jnp.concatenate([g.weight, jnp.array([2.0])]),
    )

    def err(res):
        c = -np.einsum("nij,nj->ni",
                       np.swapaxes(np.asarray(res.poses_r), 1, 2),
                       np.asarray(res.poses_t))
        cg = -np.einsum("nij,nj->ni", np.swapaxes(ring["gt_r"], 1, 2),
                        ring["gt_t"])
        return np.linalg.norm(c - cg, axis=-1).max()

    e_clean = err(optimize(g, PoseGraphConfig(max_iters=20)))
    e_l2 = err(optimize(gi, PoseGraphConfig(max_iters=20)))
    e_tuk = err(optimize(gi, PoseGraphConfig(max_iters=20, huber_delta=1.0,
                                             robust_kernel="tukey")))
    assert e_l2 > 2.0 * e_clean, (e_l2, e_clean)
    assert e_tuk < 2.0 * e_clean, (e_tuk, e_clean)
