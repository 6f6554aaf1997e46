"""128-d SIFT descriptors as fixed-grid sampling + one-hot matmuls.

Reference analog: ``ExtractSiftDescriptors`` (SURVEY.md C10, hot loop #2):
warp-parallel 16x16 rotated sampling with texture fetches, trilinear binning
into 4x4 cells x 8 orientation bins, normalize -> clip 0.2 -> renormalize.

TPU design (SURVEY.md §2.2 row 3, §7 "turn gathers into matmuls"): each
(keypoint, orientation) slot samples a fixed G x G grid directly in the
*rotated descriptor frame*, so the spatial trilinear weights are a static
[G^2, 16] matrix known at trace time.  Only the 8-way orientation binning is
data-dependent; the descriptor reduces to one einsum
``[K, G^2, 8] x [G^2, 16] -> [K, 16, 8]`` that runs on the MXU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import SiftConfig
from .keypoints import Keypoints
from .sampling import bilinear_sample


def _spatial_weights(g: int, d: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static grid geometry.

    Returns (cell_coords [g*g, 2], W_spatial [g*g, d*d], gauss [g*g]).
    Cell coordinates u, v span [-d/2, d/2]; cell centres sit at
    -d/2 + 0.5, ..., d/2 - 0.5.  W_spatial holds the bilinear weight of each
    sample toward each of the d*d cells.
    """
    c = (np.arange(g, dtype=np.float32) + 0.5) / g * d - d / 2.0  # [-d/2, d/2]
    vv, uu = np.meshgrid(c, c, indexing="ij")                     # v=row, u=col
    coords = np.stack([vv.ravel(), uu.ravel()], -1)               # [g*g, 2]
    centres = np.arange(d, dtype=np.float32) - d / 2.0 + 0.5      # [d]
    wv = np.maximum(0.0, 1.0 - np.abs(coords[:, 0:1] - centres[None, :]))  # [g*g, d]
    wu = np.maximum(0.0, 1.0 - np.abs(coords[:, 1:2] - centres[None, :]))
    w_spatial = (wv[:, :, None] * wu[:, None, :]).reshape(g * g, d * d)
    gauss = np.exp(-(coords ** 2).sum(-1) / (0.5 * d * d))        # sigma = d/2
    return coords.astype(np.float32), w_spatial.astype(np.float32), gauss.astype(np.float32)


def descriptors(gdx: jnp.ndarray, gdy: jnp.ndarray, kps: Keypoints,
                theta: jnp.ndarray, ok: jnp.ndarray, cfg: SiftConfig):
    """Descriptors for all (keypoint, orientation) slots of one octave.

    gdx, gdy: [L, H, W] Gaussian-stack gradients (octave-local).
    theta, ok: [K, M] orientations and slot validity.
    Returns (desc [K*M, 128], slot_valid [K*M]); slot m of keypoint k lands
    at row k*M + m.
    """
    g, d, nb = cfg.desc_grid, cfg.desc_width, cfg.desc_bins
    k, m = theta.shape
    coords, w_spatial, gauss = map(jnp.asarray, _spatial_weights(g, d))
    s = g * g

    # Flatten (keypoint, orientation) slots.
    th = theta.reshape(-1)                                     # [K*M]
    slot_valid = (ok & kps.valid[:, None]).reshape(-1)
    rep = lambda a: jnp.repeat(a, m, axis=0)
    xo, yo, so = rep(kps.xo), rep(kps.yo), rep(kps.so)
    lvl = jnp.clip(rep(kps.level), 0, gdx.shape[0] - 1)

    sigma_oct = cfg.sigma0 * 2.0 ** (so / cfg.scales_per_octave)
    cell_w = cfg.desc_scale_factor * sigma_oct                 # px per cell
    ct, st = jnp.cos(th), jnp.sin(th)
    # rotate descriptor-frame coords (v=row, u=col) into the image frame
    u = coords[None, :, 1] * cell_w[:, None]                   # [KM, S]
    v = coords[None, :, 0] * cell_w[:, None]
    xs = xo[:, None] + u * ct[:, None] - v * st[:, None]
    ys = yo[:, None] + u * st[:, None] + v * ct[:, None]

    dx, inb1 = bilinear_sample(gdx, lvl, ys, xs)
    dy, inb2 = bilinear_sample(gdy, lvl, ys, xs)
    mag = jnp.sqrt(dx * dx + dy * dy)
    # Gradient direction rotated into the keypoint frame.  Negated (theta -
    # grad) to match the classic descriptor's y-up angle convention (image
    # rows grow downward here); validated against the cv2 oracle in
    # tests/test_describe.py.
    ang = th[:, None] - jnp.arctan2(dy, dx)
    w = mag * gauss[None, :] * inb1 * inb2                     # [KM, S]

    # Soft orientation binning -> [KM, S, nb] (2 non-zeros per sample).
    fbin = (ang / (2.0 * jnp.pi) * nb) % nb
    b0 = jnp.floor(fbin).astype(jnp.int32) % nb
    f = (fbin - jnp.floor(fbin))[..., None]
    eye = jnp.eye(nb, dtype=w.dtype)
    obin = eye[b0] * (1 - f) + eye[(b0 + 1) % nb] * f          # [KM, S, nb]
    contrib = obin * w[..., None]

    # MXU contraction: spatial cells x orientation bins.
    desc = jnp.einsum("sc,ksb->kcb", w_spatial, contrib,
                      preferred_element_type=jnp.float32)      # [KM, 16, 8]
    desc = desc.reshape(k * m, d * d * nb)

    # normalise -> clip -> renormalise (Lowe)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.minimum(desc, cfg.desc_clip)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    return desc * slot_valid[:, None], slot_valid
