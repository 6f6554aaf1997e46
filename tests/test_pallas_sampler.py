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
                                      interpret=True, bf16_dots=False)
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
                                      interpret=True, bf16_dots=False)
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
                                      interpret=True, bf16_dots=False)
    assert bool(np.asarray(inb).all())
    np.testing.assert_allclose(np.asarray(dy), 0.0, atol=1e-6)


def test_non_group_multiple_slot_count_pads(rng):
    """Slot counts that don't divide the grid group are padded, not
    rejected (round 4: the group size G became a tuned parameter — 32 on
    v5e — so callers' 8-aligned slot counts need the pad path), and the
    padded lanes change nothing."""
    gauss, lvl, ys, xs = _setup(rng, N=12)  # not a multiple of any group
    dx, dy, inb = sample_grad_patches(gauss, lvl, ys, xs, pr=48,
                                      interpret=True, bf16_dots=False)
    assert dx.shape == ys.shape and dy.shape == ys.shape
    dx2, dy2, _ = sample_grad_patches(gauss, jnp.pad(lvl, (0, 4)),
                                      jnp.pad(ys, ((0, 4), (0, 0))),
                                      jnp.pad(xs, ((0, 4), (0, 0))),
                                      pr=48, interpret=True,
                                      bf16_dots=False)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dx2[:12]))
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(dy2[:12]))


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


def test_fused_octave_hbm_matches_pipelined(rng, test_image):
    """The manual-output-DMA variant (hbm_out=True, big row tile) must be
    bit-identical to the pipelined kernel — same arithmetic, different
    output path and tile height (96 vs 48 exercises a second halo split)."""
    import jax.numpy as jnp
    from cusift_tpu.config import SiftConfig
    from cusift_tpu.ops.pyramid import initial_level
    from cusift_tpu.ops.pallas.octave import fused_octave

    cfg = SiftConfig()
    base = initial_level(jnp.asarray(test_image), cfg)
    h, w = base.shape
    ref = fused_octave(base, cfg, h, w, interpret=True)
    out = fused_octave(base, cfg, h, w, interpret=True, tr=96, hbm_out=True)
    for a, b, name in zip(out, ref, ("samp", "dog", "score")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_fused_octave_batched_matches_single(rng, test_image):
    """[B, H, W] bases ride the Pallas grid (and jax.vmap routes through
    the custom_vmap rule onto that path): both must be bit-identical to
    per-image calls.  Regression for the round-3 chip finding: the default
    vmap batching rule gives the ANY-space base block a non-trivial
    index_map, which the Mosaic lowering rejects — every fused-pyramid
    variant failed to lower under extract_batch until the batch moved
    into the kernel grid."""
    import jax
    import jax.numpy as jnp
    from cusift_tpu.config import SiftConfig
    from cusift_tpu.ops.pyramid import initial_level
    from cusift_tpu.ops.pallas.octave import fused_octave

    cfg = SiftConfig()
    base = initial_level(jnp.asarray(test_image), cfg)
    h, w = base.shape
    batch = jnp.stack([base, 0.5 * base + 0.1, base[::-1]])
    for tr, hbm in ((48, False), (96, True)):
        singles = [fused_octave(b, cfg, h, w, interpret=True, tr=tr,
                                hbm_out=hbm) for b in batch]
        grid = fused_octave(batch, cfg, h, w, interpret=True, tr=tr,
                            hbm_out=hbm)
        vm = jax.vmap(lambda b: fused_octave(b, cfg, h, w, interpret=True,
                                             tr=tr, hbm_out=hbm))(batch)
        for i, one in enumerate(singles):
            for a, b_, name in zip(one, (g[i] for g in grid),
                                   ("samp", "dog", "score")):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b_),
                                              err_msg=f"grid {name}[{i}]")
        for a, b_, name in zip(grid, vm, ("samp", "dog", "score")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_),
                                          err_msg=f"vmap {name}")


def test_checkify_bounds_clean(rng):
    """SURVEY.md §5.2: checkify-guarded index math passes on adversarial
    border keypoints (patch corners clipped against every image edge)."""
    from jax.experimental import checkify

    gauss, lvl, _, _ = _setup(rng, L=3, H=96, W=160, N=16, S=36)
    # all four corners + centre, samples spilling past the image edges
    cy = np.array([0.0, 0.0, 95.0, 95.0, 48.0] * 4)[:16].astype(np.float32)
    cx = np.array([0.0, 159.0, 0.0, 159.0, 80.0] * 4)[:16].astype(np.float32)
    off = rng.uniform(-8.0, 8.0, (16, 36)).astype(np.float32)
    ys = jnp.asarray(cy[:, None] + off)
    xs = jnp.asarray(cx[:, None] + off[:, ::-1])

    checked = checkify.checkify(
        lambda *a: sample_grad_patches(*a, pr=48, interpret=True,
                                       debug_checks=True, bf16_dots=False))
    err, (dx, dy, inb) = checked(gauss, lvl, ys, xs)
    err.throw()  # no bounds violation
    # parity unchanged by the checks
    dx_r, dy_r, inb_r = _xla_reference(gauss, lvl, ys, xs)
    m = np.asarray(inb_r)
    np.testing.assert_allclose(np.asarray(dx)[m], np.asarray(dx_r)[m],
                               atol=1e-5)


def test_bf16_dots_error_bounded():
    """The production bf16 interpolation dots quantise the GRADIENTS, not
    the patch: error must be small RELATIVE to the gradient magnitude (the
    rejected full-bf16 pass lost ~5e-3 absolute through central-difference
    cancellation — see the kernel comment)."""
    gauss, lvl, ys, xs = _setup(np.random.default_rng(42))
    dx32, dy32, _ = sample_grad_patches(gauss, lvl, ys, xs, pr=48,
                                        interpret=True, bf16_dots=False)
    dx16, dy16, _ = sample_grad_patches(gauss, lvl, ys, xs, pr=48,
                                        interpret=True, bf16_dots=True)
    for a32, a16 in ((dx32, dx16), (dy32, dy16)):
        a32, a16 = np.asarray(a32), np.asarray(a16)
        scale = np.maximum(np.abs(a32), 0.05)  # unit-variance test data
        rel = np.abs(a16 - a32) / scale
        assert np.median(rel) < 4e-3
        # tail: interpolation across a gradient sign change can leave a
        # near-zero f32 value whose bf16 counterpart is relatively far off
        assert rel.max() < 0.1


def test_separable_grid_matches_general():
    """_kernel_sep (axis-aligned grid as two skinny matmuls) == the
    general sampler on the expanded grid, within bf16-dot tolerance."""
    from cusift_tpu.ops.pallas.sampler import sample_grad_patches_sep

    rng2 = np.random.default_rng(7)
    gauss, lvl, _, _ = _setup(rng2, L=3, H=96, W=160, N=16, S=16)
    gr, gc = 12, 12
    cy = rng2.uniform(20, 76, 16).astype(np.float32)
    cx = rng2.uniform(20, 140, 16).astype(np.float32)
    rad = rng2.uniform(5.0, 14.0, 16).astype(np.float32)
    c1d = (np.arange(gr, dtype=np.float32) + 0.5) / gr * 2.0 - 1.0
    ys_rows = jnp.asarray(cy[:, None] + rad[:, None] * c1d[None, :])
    xs_cols = jnp.asarray(cx[:, None] + rad[:, None] * c1d[None, :])

    dx, dy, inb = sample_grad_patches_sep(gauss, lvl, ys_rows, xs_cols,
                                          pr=48, interpret=True)
    ys = np.broadcast_to(np.asarray(ys_rows)[:, :, None], (16, gr, gc))
    xs = np.broadcast_to(np.asarray(xs_cols)[:, None, :], (16, gr, gc))
    dx_r, dy_r, inb_r = _xla_reference(gauss, lvl,
                                       jnp.asarray(ys.reshape(16, -1)),
                                       jnp.asarray(xs.reshape(16, -1)))
    np.testing.assert_array_equal(np.asarray(inb), np.asarray(inb_r))
    m = np.asarray(inb_r)
    for a, b in ((dx, dx_r), (dy, dy_r)):
        a, b = np.asarray(a)[m], np.asarray(b)[m]
        scale = np.maximum(np.abs(b), 0.05)
        assert np.median(np.abs(a - b) / scale) < 8e-3


def _hist_desc_setup(seed=11, L=3, H=96, W=160, N=16, S=64):
    rng2 = np.random.default_rng(seed)
    gauss = jnp.asarray(rng2.normal(size=(L, H, W)).astype(np.float32))
    lvl = jnp.asarray(rng2.integers(0, L, N).astype(np.int32))
    cy = rng2.uniform(8, H - 8, N).astype(np.float32)
    cx = rng2.uniform(8, W - 8, N).astype(np.float32)
    off = rng2.uniform(-10, 10, (N, S)).astype(np.float32)
    ys = jnp.asarray(cy[:, None] + off)
    xs = jnp.asarray(cx[:, None] + off[:, ::-1])
    wv = jnp.asarray(rng2.uniform(0.2, 1.0, (N, S)).astype(np.float32))
    return gauss, lvl, ys, xs, wv


def test_fused_hist_matches_xla():
    """_kernel_hist (fused sample+bin) == the XLA formula, within
    bf16-dot tolerance (histograms average many samples)."""
    from cusift_tpu.ops.pallas.sampler import sample_ori_hist

    gauss, lvl, ys, xs, wv = _hist_desc_setup()
    nb = 36
    hist = sample_ori_hist(gauss, lvl, ys, xs, wv, nb, pr=48,
                           interpret=True)
    dx, dy, inb = _xla_reference(gauss, lvl, ys, xs)
    mag = np.sqrt(np.asarray(dx) ** 2 + np.asarray(dy) ** 2)
    ang = np.arctan2(np.asarray(dy), np.asarray(dx))
    w = mag * np.asarray(wv) * np.asarray(inb)
    fbin = (ang / (2 * np.pi) * nb) % nb
    dist = np.abs(fbin[..., None] - np.arange(nb))
    dist = np.minimum(dist, nb - dist)
    ref = ((np.maximum(0.0, 1.0 - dist)) * w[..., None]).sum(1)
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(hist) / scale, ref / scale,
                               atol=2e-2)


def test_fused_desc_matches_xla():
    """_kernel_desc (fused sample+rotate+bin+cell-contract) == the XLA
    descriptor math; compared after normalisation via cosine."""
    from cusift_tpu.ops.pallas.sampler import sample_desc_raw

    gauss, lvl, ys, xs, wv = _hist_desc_setup(seed=13)
    nb, cells = 8, 16
    rng2 = np.random.default_rng(5)
    theta = jnp.asarray(rng2.uniform(0, 2 * np.pi, 16).astype(np.float32))
    wsp = jnp.asarray(rng2.uniform(0, 1, (64, cells)).astype(np.float32))
    raw = sample_desc_raw(gauss, lvl, ys, xs, theta, wv, wsp,
                          nb=nb, cells=cells, pr=48, interpret=True)
    desc = np.swapaxes(np.asarray(raw), 1, 2).reshape(16, cells * nb)

    dx, dy, inb = _xla_reference(gauss, lvl, ys, xs)
    mag = np.sqrt(np.asarray(dx) ** 2 + np.asarray(dy) ** 2)
    ang = np.asarray(theta)[:, None] - np.arctan2(np.asarray(dy),
                                                  np.asarray(dx))
    w = mag * np.asarray(wv) * np.asarray(inb)
    fbin = (ang / (2 * np.pi) * nb) % nb
    dist = np.abs(fbin[..., None] - np.arange(nb))
    dist = np.minimum(dist, nb - dist)
    contrib = np.maximum(0.0, 1.0 - dist) * w[..., None]       # [N, S, nb]
    ref = np.einsum("sc,ksb->kcb", np.asarray(wsp), contrib).reshape(16, -1)

    for a, b in zip(desc, ref):
        na, nr = np.linalg.norm(a), np.linalg.norm(b)
        assert na > 0 and nr > 0
        assert np.dot(a / na, b / nr) > 0.9995


def test_checkify_matcher_idx_bounds(rng):
    from jax.experimental import checkify
    from cusift_tpu.config import MatchConfig
    from cusift_tpu.ops.pallas.matcher import match_pallas

    a = rng.normal(size=(64, 128)).astype(np.float32)
    b = rng.normal(size=(72, 128)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    checked = checkify.checkify(
        lambda *x: match_pallas(*x, MatchConfig(), interpret=True,
                                debug_checks=True))
    err, m = checked(jnp.asarray(a), jnp.ones(64, bool),
                     jnp.asarray(b), jnp.ones(72, bool))
    err.throw()
    assert np.asarray(m.idx).max() < 72


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
                                    interpret=True, bf16_dots=False)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), atol=1e-5)


def test_sampler_group_config_plumbing(rng, monkeypatch):
    """VERDICT r4 weak #5: the grid group is a SiftConfig field, not an
    env-var module constant — different g values stay output-invariant
    (pure padding/grouping), and the env var overrides only as a probe."""
    from cusift_tpu.config import SiftConfig
    from cusift_tpu.ops.pallas import sampler as sampler_mod

    assert SiftConfig().sampler_group == 48

    gauss, lvl, ys, xs = _setup(rng, N=24, S=36)
    ref = sample_grad_patches(gauss, lvl, ys, xs, pr=48, g=8,
                              interpret=True, bf16_dots=False)
    for g in (16, 48):     # 24 % 16 != 0 exercises the pad-to-group path
        out = sample_grad_patches(gauss, lvl, ys, xs, pr=48, g=g,
                                  interpret=True, bf16_dots=False)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    # env override beats the argument (probe knob), default is 48
    monkeypatch.setenv("CUSIFT_SAMPLER_GROUP", "8")
    assert sampler_mod._resolve_g(48) == 8
    monkeypatch.delenv("CUSIFT_SAMPLER_GROUP")
    assert sampler_mod._resolve_g(None) == 48
    assert sampler_mod._resolve_g(32) == 32
