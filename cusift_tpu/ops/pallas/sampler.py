"""Pallas patch sampler: per-keypoint gradient patches as MXU matmuls.

Reference analog: the texture-unit bilinear fetches of
``ComputeOrientations`` / ``ExtractSiftDescriptors`` (SURVEY.md C9–C10,
hot loop #2).  TPU has no texture hardware, and XLA's generic gather pays
per fetched index — the [K*S] 4-corner gathers cost ~8 ms/frame on v5e even
fused.  This kernel exploits that every keypoint's samples live in one small
window of one pyramid level:

  * per grid step, DMA G keypoints' [PR, PC] patches of (dx, dy) from the
    HBM gradient planes into VMEM.  Patch corners are aligned to the
    (8, 128) Mosaic tile (rows to 8, columns to 128, via ``pl.multiple_of``
    hints) — alignment costs at most half a tile per side, which the patch
    size budgets for;
  * bilinear interpolation is *separable*: sample s of keypoint g is
    ``wy[g,s,:] @ patch[g] @ wx[g,s,:]^T`` with hat-function weights
    (<= 2 non-zeros per row).  Contracting columns first keeps the
    intermediate at [PR, S] (tiny) and turns all samples of a keypoint into
    one [PR, PC] x [PC, S] MXU matmul per channel (SURVEY.md §7 "gathers
    into matmuls").  Bounding the patch at PC=256 columns instead of the
    full image width is what keeps the contraction small — a full-width
    strip at the upscaled octave costs 6x the FLOPs for identical output.

Samples whose true coordinates fall outside the image get zero weight here
(the patch never contains them); callers already zero those lanes via the
``inb`` mask, so the only behavioural difference vs the XLA path is the
value of masked-out lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 8  # keypoints per grid step


def _kernel(lvl_ref, y0_ref, x0_ref,          # scalar prefetch [N]
            ry_ref, rx_ref,                   # VMEM blocks [G, S]
            gx_ref, gy_ref,                   # HBM planes [L, Hp, Wp]
            ox_ref, oy_ref,                   # VMEM out blocks [G, S]
            px, py, sem,                      # scratch: patches + DMA sems
            *, pr: int, pc: int):
    i = pl.program_id(0)

    def dma(plane_ref, scratch, j, slot):
        k = i * _G + j
        y0 = pl.multiple_of(y0_ref[k], 8)     # aligned by the wrapper
        x0 = pl.multiple_of(x0_ref[k], 128)
        return pltpu.make_async_copy(
            plane_ref.at[lvl_ref[k], pl.ds(y0, pr), pl.ds(x0, pc)],
            scratch.at[j], sem.at[slot, j])

    for j in range(_G):
        dma(gx_ref, px, j, 0).start()
        dma(gy_ref, py, j, 1).start()
    for j in range(_G):
        dma(gx_ref, px, j, 0).wait()
        dma(gy_ref, py, j, 1).wait()

    s = ry_ref.shape[1]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (pr, s), 0).astype(jnp.float32)
    coli = jax.lax.broadcasted_iota(jnp.int32, (pc, s), 0).astype(jnp.float32)
    for j in range(_G):
        ry = ry_ref[j, :]                                      # [S]
        rx = rx_ref[j, :]
        wyt = jnp.maximum(0.0, 1.0 - jnp.abs(ry[None, :] - rowi))  # [PR, S]
        wxt = jnp.maximum(0.0, 1.0 - jnp.abs(rx[None, :] - coli))  # [PC, S]
        # HIGHEST precision: a default bf16 MXU pass costs ~5e-3 absolute
        # in the sampled gradients, visibly degrading descriptor quality.
        bx = jnp.dot(px[j], wxt, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)       # [PR, S]
        by = jnp.dot(py[j], wxt, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        ox_ref[j, :] = jnp.sum(bx * wyt, axis=0)
        oy_ref[j, :] = jnp.sum(by * wyt, axis=0)


@functools.partial(jax.jit, static_argnames=("pr", "pc", "interpret"))
def sample_patches(gx: jnp.ndarray, gy: jnp.ndarray, lvl: jnp.ndarray,
                   ys: jnp.ndarray, xs: jnp.ndarray,
                   pr: int, pc: int = 256, interpret: bool = False):
    """Bilinear-sample (gx, gy) [L, H, W] at float (ys, xs) [N, S] per-slot.

    pr: static patch rows (multiple of 8); every slot's samples must span
    fewer than pr - 9 rows (4+4 go to nearest-8 offset alignment, 1 to
    bilinear support).  pc: static patch cols (multiple of 128); sample
    column span must stay under pc - 129.  Callers size both from the
    config's worst-case support.
    Returns (dx [N, S], dy [N, S], inb [N, S]).
    """
    l, h, w = gx.shape
    n, s = ys.shape
    assert n % _G == 0, (n, _G)
    assert pr % 8 == 0 and pc % 128 == 0, (pr, pc)

    inb = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    ys = jnp.clip(ys, 0.0, h - 1.000001)
    xs = jnp.clip(xs, 0.0, w - 1.000001)

    # pad planes: width to a lane multiple >= one patch, height likewise
    hp = max((h + 7) // 8 * 8, pr)
    wp = max((w + 127) // 128 * 128, pc)
    if (hp, wp) != (h, w):
        gx = jnp.pad(gx, ((0, 0), (0, hp - h), (0, wp - w)))
        gy = jnp.pad(gy, ((0, 0), (0, hp - h), (0, wp - w)))

    # patch corner per slot: centred on the samples' coordinate range
    # (a mean can shift off-centre and leak the extremes past the patch),
    # rounded to the NEAREST tile so alignment costs half a tile per side
    yc = 0.5 * (jnp.min(ys, axis=1) + jnp.max(ys, axis=1))
    xc = 0.5 * (jnp.min(xs, axis=1) + jnp.max(xs, axis=1))
    y0 = jnp.clip((yc.astype(jnp.int32) - pr // 2 + 4) & ~7, 0, hp - pr)
    x0 = jnp.clip((xc.astype(jnp.int32) - pc // 2 + 64) & ~127, 0, wp - pc)
    ry = ys - y0[:, None].astype(jnp.float32)
    rx = xs - x0[:, None].astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n // _G,),
        in_specs=[
            pl.BlockSpec((_G, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((_G, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_G, pr, pc), jnp.float32),
            pltpu.VMEM((_G, pr, pc), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _G)),
        ],
    )
    dx, dy = pl.pallas_call(
        functools.partial(_kernel, pr=pr, pc=pc),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, s), jnp.float32),
                   jax.ShapeDtypeStruct((n, s), jnp.float32)],
        interpret=interpret,
    )(jnp.clip(lvl, 0, l - 1), y0, x0, ry, rx, gx, gy)
    return dx, dy, inb
