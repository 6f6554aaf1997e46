"""Sim(3) pose graph: algebra, drift recovery, SE(3) failure contrast.

The constructed scenario is the monocular failure mode (VERDICT round-3
task 3): a closed trajectory whose odometry translations carry a
multiplicative scale drift e^(gamma k).  A Sim(3) graph with one loop
edge measuring the relative epoch scale recovers the geometry; an SE(3)
graph on the same data cannot represent the drift and leaves a large
endpoint error — the reason models/odometry.py optimises Sim(3).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cusift_tpu.config import PoseGraphConfig
from cusift_tpu.optim.lie import se3_exp
from cusift_tpu.optim.sim3graph import (Sim3Graph, optimize, sim3_compose,
                                        sim3_inverse)


def test_sim3_algebra(rng):
    s1, s2 = 1.7, 0.6
    r1, _ = se3_exp(jnp.asarray(rng.normal(size=6) * 0.3))
    r2, _ = se3_exp(jnp.asarray(rng.normal(size=6) * 0.3))
    t1 = jnp.asarray(rng.normal(size=3))
    t2 = jnp.asarray(rng.normal(size=3))
    x = jnp.asarray(rng.normal(size=3))

    s1a, r1a, t1a = (jnp.float32(s1), r1, t1)
    s2a, r2a, t2a = (jnp.float32(s2), r2, t2)
    sc, rc, tc = sim3_compose(s1a, r1a, t1a, s2a, r2a, t2a)
    lhs = sc * (rc @ x) + tc
    rhs = s1 * (r1 @ (s2 * (r2 @ x) + t2)) + t1
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    si, ri, ti = sim3_inverse(sc, rc, tc)
    sI, rI, tI = sim3_compose(si, ri, ti, sc, rc, tc)
    np.testing.assert_allclose(float(sI), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rI), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tI), 0.0, atol=1e-5)


def _drift_problem(n=16, gamma=0.03, seed=0):
    """Closed square-ish loop with scale-drifted odometry measurements.

    Returns (gt_r, gt_t, graph arrays...).  Node k's odometry step
    translation is scaled by e^(gamma k); the loop edge (0, n-1) measures
    the true near-identity transform with relative scale e^(-gamma(n-1)).
    """
    rs = np.random.default_rng(seed)
    # ground-truth world-to-camera poses around a circle, ending at start
    gt_r, gt_t = [np.eye(3, dtype=np.float64)], [np.zeros(3)]
    for k in range(1, n):
        s = k / (n - 1)
        xi = np.array([0.6 * np.sin(2 * np.pi * s), 0.1 * np.sin(4 * np.pi * s),
                       0.5 * np.sin(2 * np.pi * s + 1.1),
                       0.05 * np.sin(2 * np.pi * s),
                       0.30 * np.sin(2 * np.pi * s),
                       0.05 * np.sin(4 * np.pi * s)])
        r, t = (np.asarray(a) for a in se3_exp(jnp.asarray(xi)))
        gt_r.append(r)
        gt_t.append(t)
    gt_r, gt_t = np.stack(gt_r), np.stack(gt_t)

    # drifted odometry edges k -> k+1: true relative with scaled translation
    ei, ej, mr, mt, ms = [], [], [], [], []
    est_r, est_t = [gt_r[0]], [gt_t[0]]
    for k in range(n - 1):
        r_rel = gt_r[k] @ gt_r[k + 1].T
        t_rel = gt_t[k] - r_rel @ gt_t[k + 1]
        drift = np.exp(gamma * k)
        ei.append(k)
        ej.append(k + 1)
        mr.append(r_rel)
        mt.append(t_rel * drift)
        ms.append(1.0)
        # integrate the drifted odometry for the initial estimate:
        # T_k = meas^-1 has X_{k+1} = R^T (X_k - t_meas)
        r_next = r_rel.T @ est_r[-1]
        t_next = r_rel.T @ (est_t[-1] - t_rel * drift)
        est_r.append(r_next)
        est_t.append(t_next)
    # loop edge (0, n-1): true transform, relative epoch scale k_0 / k_{n-1}
    r_rel = gt_r[0] @ gt_r[n - 1].T
    t_rel = gt_t[0] - r_rel @ gt_t[n - 1]
    ei.append(0)
    ej.append(n - 1)
    mr.append(r_rel)
    mt.append(t_rel)          # measured in node 0's epoch (= 1)
    ms.append(np.exp(-gamma * (n - 2)))
    return (gt_r, gt_t, np.stack(est_r), np.stack(est_t),
            np.array(ei, np.int32), np.array(ej, np.int32),
            np.stack(mr), np.stack(mt), np.array(ms, np.float32))


def _centers(r, t):
    return np.einsum("nij,nj->ni", np.transpose(r, (0, 2, 1)), -t)


def test_sim3_recovers_scale_drift():
    gt_r, gt_t, er, et, ei, ej, mr, mt, ms = _drift_problem()
    n = len(gt_r)
    err0 = np.linalg.norm(_centers(er, et) - _centers(gt_r, gt_t), axis=1)
    assert err0.max() > 0.15   # the drifted chain is visibly broken

    g = Sim3Graph(
        poses_r=jnp.asarray(er.astype(np.float32)),
        poses_t=jnp.asarray(et.astype(np.float32)),
        poses_s=jnp.ones(n, jnp.float32),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        meas_r=jnp.asarray(mr.astype(np.float32)),
        meas_t=jnp.asarray(mt.astype(np.float32)),
        meas_s=jnp.asarray(ms),
        weight=jnp.ones(len(ei), jnp.float32))
    res = optimize(g, PoseGraphConfig(max_iters=30, cg_iters=60))
    # the optimum keeps a small floor: the per-edge drift (log-scale ~gamma
    # per odometry edge) is distributed around the loop, not eliminated
    assert float(res.cost) < 0.05 * float(res.initial_cost)

    # corrected SE(3) poses: (R_i, t_i / s_i)
    s = np.asarray(res.poses_s)
    cr = np.asarray(res.poses_r)
    ct = np.asarray(res.poses_t) / s[:, None]
    err1 = np.linalg.norm(_centers(cr, ct) - _centers(gt_r, gt_t), axis=1)
    assert err1.max() < 0.25 * err0.max(), (err1.max(), err0.max())
    # node scales track the injected drift profile (up to the gauge)
    drift = np.exp(0.03 * np.arange(n))
    ratio = s / drift
    assert np.std(np.log(ratio[1:])) < 0.15


def test_se3_graph_cannot_absorb_scale_drift():
    """Same data through the SE(3) graph: large residual floor remains."""
    from cusift_tpu.optim.posegraph import PoseGraph, optimize as se3_opt

    gt_r, gt_t, er, et, ei, ej, mr, mt, ms = _drift_problem()
    g = PoseGraph(
        poses_r=jnp.asarray(er.astype(np.float32)),
        poses_t=jnp.asarray(et.astype(np.float32)),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        meas_r=jnp.asarray(mr.astype(np.float32)),
        meas_t=jnp.asarray(mt.astype(np.float32)),
        weight=jnp.ones(len(ei), jnp.float32))
    res = se3_opt(g, PoseGraphConfig(max_iters=30, cg_iters=60))
    # SE(3) cannot represent the drift: the cost cannot approach zero
    assert float(res.cost) > 1e-2 * float(res.initial_cost)


def test_robust_kernel_rejects_outlier_loop_edge():
    """A wrong loop association must not hijack the Sim(3) solve.

    Plain L2 lets one high-weight garbage edge (a false revisit claim)
    drag the whole graph BELOW its initialisation quality; the IRLS
    robust kernels bound its influence.  Measured orderings this test
    pins (see BASELINE.md robust-kernel table): huber's linear tail
    still lets the outlier pull (bounded but nonzero influence); tukey
    at a scale between the TRUE loop edge's initial residual and the
    outlier's redescends the outlier to exactly zero and lands at
    clean-solve quality.  This is the 1000-frame mono soak failure:
    corrected trajectory WORSE than raw under L2 once retrieval
    confuses self-similar views.
    """
    gt_r, gt_t, er, et, ei, ej, mr, mt, ms = _drift_problem()
    n = len(gt_r)
    rng = np.random.default_rng(3)
    bad_r, _ = (np.asarray(a) for a in
                se3_exp(jnp.asarray(rng.normal(size=6) * 0.5)))
    ei = np.concatenate([ei, [0]]).astype(np.int32)
    ej = np.concatenate([ej, [n // 2]]).astype(np.int32)
    mr = np.concatenate([mr, bad_r[None]])
    mt = np.concatenate([mt, rng.normal(size=(1, 3)) * 0.8])
    ms = np.concatenate([ms, [1.0]]).astype(np.float32)
    w = np.ones(len(ei), np.float32)
    w[-1] = 2.0          # loop-edge weight, like the production closures

    err_init = np.linalg.norm(_centers(er, et) - _centers(gt_r, gt_t),
                              axis=1).max()

    def solve(delta, kernel="huber"):
        g = Sim3Graph(
            poses_r=jnp.asarray(er.astype(np.float32)),
            poses_t=jnp.asarray(et.astype(np.float32)),
            poses_s=jnp.ones(n, jnp.float32),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            meas_r=jnp.asarray(mr.astype(np.float32)),
            meas_t=jnp.asarray(mt.astype(np.float32)),
            meas_s=jnp.asarray(ms),
            weight=jnp.asarray(w))
        res = optimize(g, PoseGraphConfig(max_iters=30, cg_iters=60,
                                          huber_delta=delta,
                                          robust_kernel=kernel))
        s = np.asarray(res.poses_s)
        cr = np.asarray(res.poses_r)
        ct = np.asarray(res.poses_t) / s[:, None]
        err = np.linalg.norm(_centers(cr, ct) - _centers(gt_r, gt_t),
                             axis=1).max()
        return err, float(res.cost), float(res.initial_cost)

    err_l2, _, _ = solve(0.0)
    assert err_l2 > 2.0 * err_init, "the outlier must demonstrably hijack L2"
    # kernels act on UNWEIGHTED residual norms (confidence weights are
    # divided out): measured huber@0.15 = 0.49 vs L2 1.31, tukey@1.0
    # recovers the clean-solve 0.04 exactly (outlier influence redescends
    # to zero)
    err_hub, c, c0 = solve(0.15, "huber")
    assert c < c0
    assert err_hub < 0.5 * err_l2, (err_hub, err_l2)
    err_tuk, _, _ = solve(1.0, "tukey")
    assert err_tuk < 0.3 * err_init, (err_tuk, err_init)
