"""Lie-group correctness: roundtrips, composition, scipy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from cusift_tpu.optim import lie


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(scale=1.0, size=(32, 3)).astype(np.float32)
    ours = np.asarray(lie.so3_exp(jnp.asarray(w)))
    ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_so3_log_roundtrip(rng):
    w = rng.normal(scale=0.8, size=(32, 3)).astype(np.float64)
    r = lie.so3_exp(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(lie.so3_log(r)), w, atol=1e-5)


def test_small_angle_stable():
    w = jnp.array([[0.0, 0.0, 0.0], [1e-9, -1e-9, 1e-10]])
    r = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(r), np.eye(3)[None].repeat(2, 0), atol=1e-8)
    assert np.isfinite(np.asarray(lie.so3_log(r))).all()
    g = jax.grad(lambda x: jnp.sum(lie.so3_exp(x)))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_se3_roundtrip(rng):
    xi = rng.normal(scale=0.7, size=(16, 6)).astype(np.float64)
    r, t = lie.se3_exp(jnp.asarray(xi))
    back = np.asarray(lie.se3_log(r, t))
    np.testing.assert_allclose(back, xi, atol=1e-5)


def test_compose_inverse(rng):
    xi = rng.normal(scale=0.5, size=(2, 6))
    r, t = lie.se3_exp(jnp.asarray(xi))
    ri, ti = lie.inverse(r, t)
    rc, tc = lie.compose(r, t, ri, ti)
    np.testing.assert_allclose(np.asarray(rc), np.eye(3)[None].repeat(2, 0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-6)


def test_transform_consistency(rng):
    xi = jnp.asarray(rng.normal(scale=0.5, size=(6,)))
    r, t = lie.se3_exp(xi)
    p = jnp.asarray(rng.normal(size=(10, 3)))
    q = lie.transform(r, t, p)
    np.testing.assert_allclose(np.asarray(q), np.asarray(p) @ np.asarray(r).T + np.asarray(t),
                               atol=1e-6)
