"""P6 exit tests (SURVEY.md §7): BA converges on perturbed synthetic SfM."""

import numpy as np
import jax.numpy as jnp
import pytest

from cusift_tpu.config import BAConfig
from cusift_tpu.data.synthetic import ba_problem
from cusift_tpu.optim.ba import BAProblem, bundle_adjust, cost


def _to_problem(d):
    return BAProblem(**{k: jnp.asarray(v) for k, v in d.items()})


@pytest.fixture(scope="module")
def problem():
    prob, truth = ba_problem(seed=3, n_cams=6, n_pts=60, pixel_noise=0.25)
    return _to_problem(prob), truth


def test_cost_decreases(problem):
    p, _ = problem
    res = bundle_adjust(p, BAConfig(max_iters=15, cg_iters=40))
    assert float(res.cost) < 0.05 * float(res.initial_cost)
    assert int(res.iterations) >= 3


def test_recovers_poses(problem):
    p, truth = problem
    res = bundle_adjust(p, BAConfig(max_iters=20, cg_iters=40, num_fixed_poses=2))
    # gauge: cameras 0/1 fixed and exact in the initialisation, so compare
    # absolute poses directly
    r_err = np.abs(np.asarray(res.poses_r) - truth["poses_r"]).max()
    t_err = np.linalg.norm(np.asarray(res.poses_t) - truth["poses_t"], axis=-1).max()
    assert r_err < 0.01, f"rotation error {r_err}"
    assert t_err < 0.02, f"translation error {t_err}"


def test_reprojection_rmse(problem):
    p, _ = problem
    res = bundle_adjust(p, BAConfig(max_iters=20, cg_iters=40))
    p2 = p._replace(poses_r=res.poses_r, poses_t=res.poses_t, points=res.points)
    n_obs = float(jnp.sum(p.w))
    rmse = float(jnp.sqrt(2.0 * cost(p2) / n_obs))
    assert rmse < 0.6, f"reprojection rmse {rmse:.3f}px"  # ~pixel_noise


def test_zero_weight_obs_ignored(problem):
    p, _ = problem
    # corrupt half the measurements but zero their weights: result unchanged
    uv_bad = jnp.asarray(np.asarray(p.uv).copy())
    uv_bad = uv_bad.at[::2].add(500.0)
    w2 = jnp.asarray(np.asarray(p.w).copy()).at[::2].set(0.0)
    pa = p._replace(uv=uv_bad, w=w2)
    pb = p._replace(w=w2)
    ra = bundle_adjust(pa, BAConfig(max_iters=5, cg_iters=30))
    rb = bundle_adjust(pb, BAConfig(max_iters=5, cg_iters=30))
    np.testing.assert_allclose(np.asarray(ra.poses_t), np.asarray(rb.poses_t),
                               atol=1e-5)


def test_huber_resists_outliers():
    prob, truth = ba_problem(seed=5, n_cams=5, n_pts=50, pixel_noise=0.25)
    # corrupt 10% of observations badly
    rs = np.random.default_rng(0)
    n_o = len(prob["uv"])
    bad = rs.choice(n_o, n_o // 10, replace=False)
    prob["uv"][bad] += rs.uniform(30, 80, size=(len(bad), 2))
    p = _to_problem(prob)
    res = bundle_adjust(p, BAConfig(max_iters=25, cg_iters=40, huber_delta=2.0, num_fixed_poses=2))
    t_err = np.linalg.norm(np.asarray(res.poses_t) - truth["poses_t"], axis=-1).max()
    assert t_err < 0.05, f"translation error with outliers {t_err}"


def test_dense_solver_matches_cg(problem):
    """BAConfig.solver="dense" (assembled Schur + Cholesky, the streaming
    window form — kills the cg_iters sequential matvec latency on chip)
    converges to the same optimum as the matrix-free CG path."""
    import dataclasses

    p, _ = problem
    cfg = BAConfig(max_iters=15, cg_iters=60, num_fixed_poses=2)
    r_cg = bundle_adjust(p, cfg)
    r_d = bundle_adjust(p, dataclasses.replace(cfg, solver="dense"))
    assert float(r_d.cost) <= float(r_d.initial_cost)
    np.testing.assert_allclose(float(r_d.cost), float(r_cg.cost),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(r_d.poses_t),
                               np.asarray(r_cg.poses_t), atol=5e-3)
