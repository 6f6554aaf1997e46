"""Separable Gaussian filtering on TPU.

Reference analog: cuSIFT's ``LowPass`` / ``LaplaceMulti`` CUDA kernels
(SURVEY.md C5–C7) keep filter taps in ``__constant__`` memory and tile the
image with shared-memory halos.  On TPU the idiomatic form is a depthwise
separable convolution lowered through XLA (`lax.conv_general_dilated`), which
the compiler tiles onto VMEM itself; taps are compile-time constants baked
into the HLO.  A fused Pallas multi-level variant lives in
``ops/pallas/octave.py`` for the perf endgame.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_taps(sigma: float, radius: int | None = None) -> np.ndarray:
    """1-D Gaussian filter taps (numpy, compile-time constant).

    Radius defaults to ceil(4*sigma) like cv2.getGaussianKernel's automatic
    size for float images ("small" sigmas keep at least radius 1).
    """
    if radius is None:
        radius = max(1, int(math.ceil(4.0 * float(sigma))))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-(x * x) / (2.0 * float(sigma) ** 2))
    w /= w.sum()
    return w.astype(np.float32)


def _reflect_pad(img: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 padding (matches cv2.GaussianBlur's default)."""
    if r == 0:
        return img
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    return jnp.pad(img, pad, mode="reflect")


def _conv1d(img: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """Correlate a [..., H, W] image with static taps along `axis`.

    Implemented as a statically-unrolled sum of shifted slices (VPU FMAs)
    rather than `lax.conv`: a 1-channel convolution on TPU pads the feature
    dimension to the 128-lane MXU width, multiplying memory traffic ~128x.
    Shifted slices of a padded array are contiguous views that XLA fuses
    into a single elementwise loop — measured ~20x faster for the pyramid.
    """
    r = (taps.shape[0] - 1) // 2
    x = _reflect_pad(img, r, axis)
    n = img.shape[axis]
    ax = axis % img.ndim
    out = None
    for k, w in enumerate(taps.tolist()):
        sl = [slice(None)] * img.ndim
        sl[ax] = slice(k, k + n)
        term = jnp.float32(w) * x[tuple(sl)]
        out = term if out is None else out + term
    return out


def blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur of a [..., H, W] image; sigma is static."""
    if float(sigma) <= 0.0:
        return img
    taps = gaussian_taps(sigma, radius)
    return _conv1d(_conv1d(img, taps, axis=-2), taps, axis=-1)


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Reference ``ScaleDown``: stride-2 decimation. The source level already
    carries 2x the base blur, so no extra low-pass is required (Lowe '04)."""
    return img[..., ::2, ::2]


def upsample2(img: jnp.ndarray) -> jnp.ndarray:
    """Reference ``ScaleUp``: 2x bilinear upsample (for the optional octave -1)."""
    h, w = img.shape[-2], img.shape[-1]
    return jax.image.resize(img, img.shape[:-2] + (2 * h, 2 * w), method="bilinear")


@partial(jax.jit, static_argnums=())
def image_gradients(img: jnp.ndarray):
    """Central-difference gradients (dx, dy) with replicated borders.

    Used by orientation/descriptor stages; matches the 2-tap [-1,0,1]/2
    scheme of classic SIFT implementations.
    """
    dx = 0.5 * (jnp.roll(img, -1, axis=-1) - jnp.roll(img, 1, axis=-1))
    dy = 0.5 * (jnp.roll(img, -1, axis=-2) - jnp.roll(img, 1, axis=-2))
    # zero out the wrapped border columns/rows
    w = img.shape[-1]
    h = img.shape[-2]
    col = jnp.arange(w)
    row = jnp.arange(h)
    dx = dx * ((col > 0) & (col < w - 1))
    dy = dy * ((row > 0) & (row < h - 1))[:, None]
    return dx, dy
