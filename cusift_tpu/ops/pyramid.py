"""Gaussian scale-space pyramid + difference-of-Gaussians.

Reference analog: cuSIFT's per-octave ``LaplaceMulti`` fused kernel computing
~6 blur levels and 5 DoG planes per octave (SURVEY.md C7, hot loop #1) and
the ``ScaleDown`` octave seeding (C6).  TPU design: one jitted function per
image shape; octaves are a static Python loop (unrolled at trace time), the
levels of an octave are stacked into a single ``[S+3, H, W]`` array so every
downstream op is batched.  No host syncs anywhere (the reference's per-octave
point-count readbacks disappear; SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import SiftConfig
from .gaussian import blur, downsample2, upsample2


class Octave(NamedTuple):
    gauss: jnp.ndarray  # [S+3, H, W] blurred levels
    dog: jnp.ndarray    # [S+2, H, W] difference of gaussians


def initial_level(img: jnp.ndarray, cfg: SiftConfig) -> jnp.ndarray:
    """Octave-0 base: optional 2x upsample + blur up to sigma0.

    (Reference: ScaleUp + LowPass + initBlur handling, SURVEY.md C5-C6.)
    """
    assert img.ndim == 2, "one image; batch via vmap/shard_map at the call site"
    img = img.astype(jnp.float32)
    if cfg.upscale:
        base = upsample2(img)
        assumed = cfg.init_blur * 2.0
    else:
        base = img
        assumed = cfg.init_blur
    delta = max(cfg.sigma0 ** 2 - assumed ** 2, 0.01) ** 0.5
    return blur(base, delta)


def octave_levels(base: jnp.ndarray, cfg: SiftConfig) -> list[jnp.ndarray]:
    """All S+3 blur levels of one octave from its sigma0 base (incremental
    chain; reference LaplaceMulti's blur half, SURVEY.md C7)."""
    levels = [base]
    for s in cfg.incremental_sigmas():
        levels.append(blur(levels[-1], s))
    return levels


def build_pyramid(img: jnp.ndarray, cfg: SiftConfig) -> list[Octave]:
    """Build the full scale space for a [H, W] float image in [0, 1].

    Returns one Octave per octave, finest first.  Octave o has spatial size
    (H >> o, W >> o) relative to the base image (2x input if cfg.upscale).
    """
    n_oct = cfg.num_octaves_for(*img.shape)
    octaves = []
    current = initial_level(img, cfg)
    for _ in range(n_oct):
        levels = octave_levels(current, cfg)
        gauss = jnp.stack(levels)               # [S+3, H, W]
        dog = gauss[1:] - gauss[:-1]            # [S+2, H, W]
        octaves.append(Octave(gauss=gauss, dog=dog))
        # Seed next octave from the level carrying 2*sigma0 blur (index S).
        current = downsample2(levels[cfg.scales_per_octave])
    return octaves
