"""Pallas gradient-patch sampler vs the XLA fused-gather path.

Runs the kernel in interpreter mode on CPU (the compiled path is exercised
on real TPU by bench.py and was verified bit-identical on descriptors).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cusift_tpu.ops.gaussian import image_gradients
from cusift_tpu.ops.sampling import bilinear_sample_pair
from cusift_tpu.ops.pallas.sampler import sample_grad_patches


def _setup(rng, L=4, H=96, W=160, N=16, S=144, spread=15.0):
    gauss = jnp.asarray(rng.normal(size=(L, H, W)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, N).astype(np.int32))
    cy = rng.uniform(0, H, N).astype(np.float32)
    cx = rng.uniform(0, W, N).astype(np.float32)
    ys = jnp.asarray(cy[:, None] + rng.uniform(-spread, spread, (N, S)).astype(np.float32))
    xs = jnp.asarray(cx[:, None] + rng.uniform(-spread, spread, (N, S)).astype(np.float32))
    return gauss, lvl, ys, xs


def _xla_reference(gauss, lvl, ys, xs):
    gdx, gdy = image_gradients(gauss)
    return bilinear_sample_pair(jnp.stack([gdx, gdy], -1), lvl, ys, xs)


def test_matches_xla_path(rng):
    gauss, lvl, ys, xs = _setup(rng)
    dx_r, dy_r, inb_r = _xla_reference(gauss, lvl, ys, xs)
    dx, dy, inb = sample_grad_patches(gauss, lvl, ys, xs, pr=48,
                                      interpret=True)
    m = np.asarray(inb_r)
    np.testing.assert_array_equal(np.asarray(inb), m)
    np.testing.assert_allclose(np.asarray(dx)[m], np.asarray(dx_r)[m],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy)[m], np.asarray(dy_r)[m],
                               atol=1e-5)


def test_small_level_padding(rng):
    # levels smaller than one patch must be padded, not crash
    gauss, lvl, ys, xs = _setup(rng, L=2, H=24, W=40, N=8, S=36, spread=6.0)
    dx_r, dy_r, inb_r = _xla_reference(gauss, lvl, ys, xs)
    dx, dy, inb = sample_grad_patches(gauss, lvl, ys, xs, pr=32,
                                      interpret=True)
    m = np.asarray(inb_r)
    np.testing.assert_allclose(np.asarray(dx)[m], np.asarray(dx_r)[m],
                               atol=1e-5)


def test_border_gradients_zero(rng):
    # samples exactly on the first/last row/col see zero gradients
    gauss = jnp.asarray(rng.normal(size=(1, 64, 128)).astype(np.float32))
    n, s = 8, 16
    ys = jnp.concatenate([jnp.zeros((n // 2, s)),
                          jnp.full((n // 2, s), 63.0)])
    xs = jnp.tile(jnp.linspace(1.0, 126.0, s)[None, :], (n, 1))
    lvl = jnp.zeros(n, jnp.int32)
    dx, dy, inb = sample_grad_patches(gauss, lvl, ys, xs, pr=32,
                                      interpret=True)
    assert bool(np.asarray(inb).all())
    np.testing.assert_allclose(np.asarray(dy), 0.0, atol=1e-6)


def test_capacity_assertion(rng):
    gauss, lvl, ys, xs = _setup(rng, N=12)  # not a multiple of 8
    with pytest.raises(AssertionError):
        sample_grad_patches(gauss, lvl, ys, xs, pr=48, interpret=True)


def test_fused_octave_matches_xla(rng, test_image):
    """ops/pallas/octave.py parity vs the XLA blur chain + extremum test."""
    import jax.numpy as jnp
    from cusift_tpu.config import SiftConfig
    from cusift_tpu.ops.pyramid import initial_level, octave_levels
    from cusift_tpu.ops.detect import extrema_score
    from cusift_tpu.ops.pallas.octave import fused_octave

    cfg = SiftConfig()
    base = initial_level(jnp.asarray(test_image), cfg)
    h, w = base.shape
    samp, dog, score = fused_octave(base, cfg, h, w, interpret=True)
    gauss = jnp.stack(octave_levels(base, cfg))
    dog_r = gauss[1:] - gauss[:-1]
    score_r = extrema_score(dog_r, cfg)

    np.testing.assert_allclose(np.asarray(samp),
                               np.asarray(gauss[1:cfg.scales_per_octave + 1]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dog), np.asarray(dog_r), atol=2e-5)
    sm, sr = np.asarray(score), np.asarray(score_r)
    np.testing.assert_array_equal(np.isfinite(sm), np.isfinite(sr))
    m = np.isfinite(sm)
    np.testing.assert_allclose(sm[m], sr[m], atol=2e-5)


def test_span_limit_margin(rng):
    """Samples at the documented span limit must not read wrapped lanes.

    Regression: the in-kernel central difference needs one extra row/col of
    patch margin beyond bilinear support; with the old +10 sizing, hat
    support reached the wrapped patch edge for worst-case alignments
    (errors up to 0.47 on unit-variance data).
    """
    L, H, W = 2, 256, 384
    gauss = jnp.asarray(rng.normal(size=(L, H, W)).astype(np.float32))
    n, s = 8, 64
    span = 37.9                      # sized like the ori stage: pr = 48+
    pr = -(-(int(span) + 12) // 8) * 8
    # centres chosen so nearest-8 alignment wastes the full 4+4 budget
    cy = np.full(n, 100.0 + 3.9, np.float32)
    cx = np.full(n, 200.0, np.float32)
    half = span / 2
    ys = jnp.asarray(np.stack([np.linspace(c - half, c + half, s)
                               for c in cy]).astype(np.float32))
    xs = jnp.asarray(np.stack([np.linspace(c - half, c + half, s)
                               for c in cx]).astype(np.float32))
    lvl = jnp.zeros(n, jnp.int32)
    dx_r, dy_r, _ = _xla_reference(gauss, lvl, ys, xs)
    dx, dy, _ = sample_grad_patches(gauss, lvl, ys, xs, pr=pr,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), atol=1e-5)
