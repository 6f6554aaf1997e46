"""DLT-PnP RANSAC (ops/pnp.py): exact recovery, outliers, degeneracies."""

import numpy as np

import jax.numpy as jnp

from cusift_tpu.config import RansacConfig
from cusift_tpu.ops.pnp import find_pnp, solve_pnp


def _rot(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(ang) * k
            + (1 - np.cos(ang)) * (k @ k)).astype(np.float32)


def _scene(n, seed=0, depth_lo=2.0, depth_hi=8.0):
    """Random world points + a camera pose; returns (pts_w, xyn, r, t)."""
    rng = np.random.default_rng(seed)
    r = _rot(rng.normal(size=3), 0.4)
    t = np.array([0.3, -0.2, 0.5], np.float32)
    # points in front of the camera: sample in camera frame, unproject
    xy = rng.uniform(-0.5, 0.5, size=(n, 2)).astype(np.float32)
    z = rng.uniform(depth_lo, depth_hi, size=(n, 1)).astype(np.float32)
    pc = np.concatenate([xy * z, z], -1)
    pts_w = (pc - t) @ r                        # rows: R^T (pc - t)
    return pts_w.astype(np.float32), xy, r, t


def test_solve_pnp_exact_recovery():
    pts_w, xyn, r, t = _scene(32, seed=1)
    re, te = solve_pnp(jnp.asarray(pts_w), jnp.asarray(xyn),
                       jnp.ones(32, jnp.float32))
    np.testing.assert_allclose(np.asarray(re), r, atol=2e-3)
    np.testing.assert_allclose(np.asarray(te), t, atol=5e-3)


def test_find_pnp_with_outliers():
    n = 256
    pts_w, xyn, r, t = _scene(n, seed=2)
    rng = np.random.default_rng(3)
    bad = rng.random(n) < 0.35
    xyn = xyn.copy()
    xyn[bad] += rng.uniform(0.05, 0.3, size=(bad.sum(), 2)) \
        * rng.choice([-1, 1], size=(bad.sum(), 2))
    res = find_pnp(jnp.asarray(pts_w), jnp.asarray(xyn),
                   jnp.ones(n, bool), RansacConfig(num_hypotheses=256))
    assert bool(res.ok)
    assert int(res.num_inliers) >= 0.9 * (~bad).sum()
    # outliers must not be inliers
    assert not np.any(np.asarray(res.inliers) & bad)
    np.testing.assert_allclose(np.asarray(res.r), r, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-2)


def test_find_pnp_scale_is_metric():
    """PnP translation carries the map scale (the whole point)."""
    pts_w, xyn, r, t = _scene(64, seed=4)
    for s in (0.1, 10.0):
        res = find_pnp(jnp.asarray(pts_w * s), jnp.asarray(xyn),
                       jnp.ones(64, bool), RansacConfig(num_hypotheses=128))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.t), t * s,
                                   rtol=2e-2, atol=1e-2 * s)


def test_find_pnp_all_invalid():
    pts_w, xyn, _, _ = _scene(64, seed=5)
    res = find_pnp(jnp.asarray(pts_w), jnp.asarray(xyn),
                   jnp.zeros(64, bool))
    assert not bool(res.ok)
    assert np.all(np.isfinite(np.asarray(res.r)))


def test_find_pnp_noise_tolerance():
    n = 200
    pts_w, xyn, r, t = _scene(n, seed=6)
    rng = np.random.default_rng(7)
    xyn = xyn + rng.normal(scale=1e-3, size=xyn.shape).astype(np.float32)
    res = find_pnp(jnp.asarray(pts_w), jnp.asarray(xyn), jnp.ones(n, bool),
                   RansacConfig(num_hypotheses=256))
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.r), r, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=5e-2)
