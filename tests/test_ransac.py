"""P5 exit tests (SURVEY.md §7): RANSAC recovers synthetic H and (R, t)."""

import numpy as np
import jax
import jax.numpy as jnp

from cusift_tpu.config import RansacConfig
from cusift_tpu.ops import geometry
from cusift_tpu.ops.geometry import apply_homography, procrustes
from cusift_tpu.ops.ransac import find_homography, find_rigid
from cusift_tpu.optim.lie import so3_exp

CFG = RansacConfig(num_hypotheses=512)


def _synthetic_h(rng, n=200, outlier_frac=0.3, noise=0.3):
    h_true = np.array([[1.1, 0.05, 12.0], [-0.04, 0.95, -8.0], [1e-4, -2e-4, 1.0]])
    pa = rng.uniform(20, 600, size=(n, 2)).astype(np.float32)
    pb = np.array(apply_homography(jnp.asarray(h_true), jnp.asarray(pa)))
    pb += rng.normal(scale=noise, size=pb.shape)
    n_out = int(outlier_frac * n)
    pb[:n_out] = rng.uniform(0, 600, size=(n_out, 2))
    valid = np.ones(n, bool)
    valid[-10:] = False  # also test masking
    return h_true, pa.astype(np.float32), pb.astype(np.float32), valid, n_out


def test_homography_recovery(rng):
    h_true, pa, pb, valid, n_out = _synthetic_h(rng)
    res = find_homography(jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(valid), CFG)
    assert bool(res.ok)
    # inliers exclude outliers and masked points
    inl = np.asarray(res.inliers)
    assert inl[n_out:-10].mean() > 0.95
    assert inl[:n_out].mean() < 0.1
    assert not inl[-10:].any()
    # transfer error of the refined H on clean points
    pred = np.asarray(apply_homography(res.h, jnp.asarray(pa[n_out:-10])))
    err = np.linalg.norm(pred - pb[n_out:-10], axis=-1)
    assert np.median(err) < 1.0


def test_rigid_recovery(rng):
    r_true = np.asarray(so3_exp(jnp.asarray([0.2, -0.1, 0.3])))
    t_true = np.array([0.3, -0.2, 0.5])
    n = 150
    pa = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    pb = pa @ r_true.T + t_true
    pb += rng.normal(scale=0.005, size=pb.shape)
    n_out = 40
    pb[:n_out] += rng.uniform(0.5, 2.0, size=(n_out, 3))
    valid = np.ones(n, bool)
    res = find_rigid(jnp.asarray(pa), jnp.asarray(pb.astype(np.float32)),
                     jnp.asarray(valid), CFG)
    assert bool(res.ok)
    assert np.linalg.norm(np.asarray(res.t) - t_true) < 0.02
    assert np.abs(np.asarray(res.r) - r_true).max() < 0.02
    assert np.asarray(res.inliers)[n_out:].mean() > 0.95


def test_procrustes_exact(rng):
    r_true = np.asarray(so3_exp(jnp.asarray([-0.4, 0.2, 0.1])))
    t_true = np.array([1.0, 2.0, -0.5])
    pa = rng.normal(size=(20, 3))
    pb = pa @ r_true.T + t_true
    r, t = procrustes(jnp.asarray(pa), jnp.asarray(pb), jnp.ones(20))
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)
    assert abs(np.linalg.det(np.asarray(r)) - 1.0) < 1e-5


def test_degenerate_input_no_nan():
    """All-invalid matches must not produce NaNs (mask-correctness)."""
    pa = jnp.zeros((32, 2))
    pb = jnp.zeros((32, 2))
    res = find_homography(pa, pb, jnp.zeros(32, bool), CFG)
    assert not bool(res.ok)
    assert np.isfinite(np.asarray(res.h)).all()


def test_improve_homography_polishes(rng):
    """C14 parity: IRLS from a perturbed H recovers the true one."""
    from cusift_tpu.ops.ransac import improve_homography

    n = 200
    pa = rng.uniform(20, 600, (n, 2)).astype(np.float32)
    h_true = np.array([[1.02, 0.03, 5.0], [-0.02, 0.98, -3.0],
                       [1e-5, -2e-5, 1.0]], np.float32)
    pb = np.asarray(geometry.apply_homography(jnp.asarray(h_true),
                                              jnp.asarray(pa)))
    pb = pb + rng.normal(scale=0.2, size=pb.shape).astype(np.float32)
    # perturb the affine part only: noise on the projective row at this
    # scale makes the initial H so degenerate that no inliers survive
    h0 = h_true.copy()
    h0[:2] += rng.normal(scale=0.005, size=(2, 3)).astype(np.float32)
    h = np.asarray(improve_homography(jnp.asarray(h0), jnp.asarray(pa),
                                      jnp.asarray(pb), jnp.ones(n, bool)))
    q0 = np.asarray(geometry.apply_homography(jnp.asarray(h0), jnp.asarray(pa)))
    q1 = np.asarray(geometry.apply_homography(jnp.asarray(h), jnp.asarray(pa)))
    gt = np.asarray(geometry.apply_homography(jnp.asarray(h_true), jnp.asarray(pa)))
    assert np.abs(q1 - gt).max() < np.abs(q0 - gt).max()
    assert np.abs(q1 - gt).mean() < 0.5
