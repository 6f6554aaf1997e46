"""Essential-matrix RANSAC, decomposition and triangulation (monocular).

Synthetic ground truth: random 3D scene, two cameras with known relative
(R, t); recovered motion must match up to the monocular scale ambiguity.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cusift_tpu.config import RansacConfig
from cusift_tpu.ops.essential import (decompose_essential, find_essential,
                                      sampson_error, solve_essential,
                                      triangulate_midpoint)
from cusift_tpu.optim.lie import se3_exp


def _scene(seed=0, n=256, outliers=0, noise=0.0):
    rs = np.random.default_rng(seed)
    pts = rs.uniform([-2.0, -1.5, 4.0], [2.0, 1.5, 10.0], size=(n, 3))
    xi = np.array([0.3, 0.05, 0.1, 0.02, 0.06, 0.01])
    r, t = (np.asarray(a) for a in se3_exp(xi))   # xb = R xa + t
    xa = pts[:, :2] / pts[:, 2:]
    pb = pts @ r.T + t
    xb = pb[:, :2] / pb[:, 2:]
    if noise:
        xa = xa + rs.normal(scale=noise, size=xa.shape)
        xb = xb + rs.normal(scale=noise, size=xb.shape)
    if outliers:
        bad = rs.choice(n, outliers, replace=False)
        xb[bad] = rs.uniform(-0.5, 0.5, size=(outliers, 2))
    return (xa.astype(np.float32), xb.astype(np.float32),
            r.astype(np.float32), t.astype(np.float32))


def _unit(v):
    return v / np.linalg.norm(v)


def test_solve_essential_exact():
    xa, xb, r, t = _scene(seed=1)
    e = np.asarray(solve_essential(jnp.asarray(xa), jnp.asarray(xb),
                                   jnp.ones(len(xa), jnp.float32)))
    err = np.asarray(sampson_error(jnp.asarray(e), jnp.asarray(xa),
                                   jnp.asarray(xb)))
    assert np.sqrt(err.mean()) < 1e-4
    # E ~ [t]x R up to sign/scale
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    e_gt = _unit((tx @ r).ravel())
    cos = abs(np.dot(_unit(e.ravel()), e_gt))
    assert cos > 0.999


def test_decompose_recovers_motion():
    xa, xb, r, t = _scene(seed=2)
    e = solve_essential(jnp.asarray(xa), jnp.asarray(xb),
                        jnp.ones(len(xa), jnp.float32))
    rr, tt, n_good = decompose_essential(e, jnp.asarray(xa), jnp.asarray(xb),
                                         jnp.ones(len(xa), jnp.float32))
    assert int(n_good) > 250
    np.testing.assert_allclose(np.asarray(rr), r, atol=1e-3)
    cos = np.dot(_unit(np.asarray(tt)), _unit(t))
    assert cos > 0.999  # direction, not scale


def test_triangulate_midpoint_depths():
    xa, xb, r, t = _scene(seed=3)
    pts, za, zb = triangulate_midpoint(jnp.asarray(r), jnp.asarray(t),
                                       jnp.asarray(xa), jnp.asarray(xb))
    # reconstruction is metric here because t carries the true scale
    rs = np.random.default_rng(3)
    gt = rs.uniform([-2.0, -1.5, 4.0], [2.0, 1.5, 10.0], size=(len(xa), 3))
    np.testing.assert_allclose(np.asarray(pts), gt, atol=1e-2)
    assert (np.asarray(za) > 0).all() and (np.asarray(zb) > 0).all()


def test_find_essential_with_outliers_and_noise():
    xa, xb, r, t = _scene(seed=4, n=512, outliers=150, noise=5e-4)
    res = find_essential(jnp.asarray(xa), jnp.asarray(xb),
                         jnp.ones(len(xa), bool), RansacConfig())
    assert bool(res.ok)
    assert int(res.num_inliers) > 300
    # outlier rows must be rejected
    np.testing.assert_allclose(np.asarray(res.r), r, atol=1e-2)
    cos = np.dot(_unit(np.asarray(res.t)), _unit(t))
    assert cos > 0.99


def test_find_essential_degenerate_few_matches():
    xa, xb, _, _ = _scene(seed=5, n=16)
    valid = np.zeros(16, bool)
    valid[:5] = True  # < min_matches
    res = find_essential(jnp.asarray(xa), jnp.asarray(xb),
                         jnp.asarray(valid), RansacConfig())
    assert not bool(res.ok)
