"""Batched bilinear sampling from pyramid level stacks.

Reference analog: CUDA texture-object bilinear fetches in
``ExtractSiftDescriptors`` / ``ComputeOrientations`` (SURVEY.md C9–C10).
TPU has no texture units; the equivalent is a batched gather of the four
corner pixels plus VPU lerp math, with all keypoints' samples batched into
one [K, S] gather so XLA emits a single fused gather kernel
(SURVEY.md §2.2 row 3).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(stack: jnp.ndarray, lvl: jnp.ndarray,
                    ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample stack[L, H, W] at float (ys, xs) on per-item integer level.

    stack: [L, H, W]; lvl: [K] int32; ys, xs: [K, S] float32.
    Returns (values [K, S], in_bounds [K, S] bool).  Out-of-bounds samples
    return the clamped-border value; callers should zero them via the mask.
    """
    _, h, w = stack.shape
    inb = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    ys = jnp.clip(ys, 0.0, h - 1.000001)
    xs = jnp.clip(xs, 0.0, w - 1.000001)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = ys - y0
    fx = xs - x0
    l = lvl[:, None]
    v00 = stack[l, y0, x0]
    v01 = stack[l, y0, x1]
    v10 = stack[l, y1, x0]
    v11 = stack[l, y1, x1]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy, inb
