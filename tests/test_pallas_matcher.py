"""Fused Pallas matcher == XLA matcher (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cusift_tpu.config import MatchConfig
from cusift_tpu.ops.match import match
from cusift_tpu.ops.pallas.matcher import match_pallas


def _unit(rng, n, d=128):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.mark.parametrize("n,m", [(256, 256), (300, 512), (512, 300)])
def test_matches_xla_path(rng, n, m):
    a, b = _unit(rng, n), _unit(rng, m)
    va = np.ones(n, bool)
    vb = np.ones(m, bool)
    vb[m // 3] = False
    cfg = MatchConfig(ratio_thresh=0.95)
    ref = match(jnp.asarray(a), jnp.asarray(va), jnp.asarray(b), jnp.asarray(vb), cfg)
    got = match_pallas(jnp.asarray(a), jnp.asarray(va), jnp.asarray(b),
                       jnp.asarray(vb), cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
    np.testing.assert_allclose(np.asarray(got.dist), np.asarray(ref.dist),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.ratio), np.asarray(ref.ratio),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))


def test_all_invalid_b(rng):
    a, b = _unit(rng, 256), _unit(rng, 256)
    got = match_pallas(jnp.asarray(a), jnp.ones(256, bool), jnp.asarray(b),
                       jnp.zeros(256, bool), MatchConfig(), interpret=True)
    assert not np.asarray(got.ok).any()


def test_single_valid_candidate_not_vacuous(rng):
    """With one valid B row the second-best is -inf and the ratio is 0;
    the isfinite(s2) guard must reject instead of passing every query."""
    a, b = _unit(rng, 64), _unit(rng, 64)
    vb = np.zeros(64, bool)
    vb[5] = True
    got = match_pallas(jnp.asarray(a), jnp.ones(64, bool), jnp.asarray(b),
                       jnp.asarray(vb), MatchConfig(), interpret=True)
    assert not np.asarray(got.ok).any()
    ref = match(jnp.asarray(a), jnp.ones(64, bool), jnp.asarray(b),
                jnp.asarray(vb), MatchConfig())
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))


def test_cross_check_branch_interpret(rng):
    """ops/match.py's pallas branch with cross_check (the reverse
    _pallas_top2 call) == the XLA cross-check result."""
    a, b = _unit(rng, 256), _unit(rng, 300)
    va = np.ones(256, bool)
    va[7] = False
    vb = np.ones(300, bool)
    vb[100] = False
    cfg_x = MatchConfig(ratio_thresh=0.95, cross_check=True, backend="xla")
    cfg_p = MatchConfig(ratio_thresh=0.95, cross_check=True, backend="pallas")
    ref = match(jnp.asarray(a), jnp.asarray(va), jnp.asarray(b),
                jnp.asarray(vb), cfg_x)
    got = match(jnp.asarray(a), jnp.asarray(va), jnp.asarray(b),
                jnp.asarray(vb), cfg_p, interpret=True)
    assert np.asarray(ref.ok).any()
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
