"""Pallas patch sampler: per-keypoint gradient strips as MXU matmuls.

Reference analog: the texture-unit bilinear fetches of
``ComputeOrientations`` / ``ExtractSiftDescriptors`` (SURVEY.md C9–C10,
hot loop #2).  TPU has no texture hardware, and XLA's generic gather pays
per fetched index — the [K*S] 4-corner gathers cost ~8 ms/frame on v5e even
fused.  This kernel exploits that every keypoint's samples live in a small
row band of one pyramid level:

  * per grid step, DMA G keypoints' [PR, W] full-width row strips of
    (dx, dy) from the HBM gradient planes into VMEM (strip row offsets are
    8-aligned to satisfy Mosaic's (8, 128) tile proofs; taking the full
    width sidesteps lane-offset alignment entirely, and W shrinks 2x per
    octave anyway);
  * bilinear interpolation is *separable*: sample s of keypoint g is
    ``wy[g,s,:] @ strip[g] @ wx[g,s,:]^T`` with hat-function weights
    (<= 2 non-zeros per row).  Contracting over columns FIRST keeps the
    intermediate at [G, S, PR] (tiny) and turns the gather into one batched
    MXU ``dot_general`` per channel (SURVEY.md §7 "gathers into matmuls").

Samples whose true coordinates fall outside the image get zero weight here
(the strip never contains them); callers already zero those lanes via the
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


def _kernel(lvl_ref, y0_ref,                  # scalar prefetch [N]
            ry_ref, rx_ref,                   # VMEM blocks [G, S]
            gx_ref, gy_ref,                   # HBM planes [L, Hp, Wp]
            ox_ref, oy_ref,                   # VMEM out blocks [G, S]
            sx, sy, sem,                      # scratch: strips + DMA sems
            *, pr: int, wp: int):
    i = pl.program_id(0)

    def dma(plane_ref, scratch, j, slot):
        k = i * _G + j
        y0 = pl.multiple_of(y0_ref[k], 8)  # aligned by the wrapper (& ~7)
        return pltpu.make_async_copy(
            plane_ref.at[lvl_ref[k], pl.ds(y0, pr), :],
            scratch.at[j], sem.at[slot, j])

    for j in range(_G):
        dma(gx_ref, sx, j, 0).start()
        dma(gy_ref, sy, j, 1).start()
    for j in range(_G):
        dma(gx_ref, sx, j, 0).wait()
        dma(gy_ref, sy, j, 1).wait()

    s = ry_ref.shape[1]
    # Per-slot standard 2-D matmuls.  (A batched-both-sides dot_general
    # with the [G, S, ...] weight layout miscompiled on sublane-tile
    # boundaries here — rows ≡ 7 (mod 8) read mixtures; the per-g form
    # uses only lane-preserving broadcasts and plain [M,K]x[K,N] dots.)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (pr, s), 0).astype(jnp.float32)
    coli = jax.lax.broadcasted_iota(jnp.int32, (wp, s), 0).astype(jnp.float32)
    for j in range(_G):
        ry = ry_ref[j, :]                                      # [S]
        rx = rx_ref[j, :]
        wyt = jnp.maximum(0.0, 1.0 - jnp.abs(ry[None, :] - rowi))  # [PR, S]
        wxt = jnp.maximum(0.0, 1.0 - jnp.abs(rx[None, :] - coli))  # [Wp, S]
        # HIGHEST precision: a default bf16 MXU pass costs ~5e-3 absolute
        # in the sampled gradients, visibly degrading descriptor quality.
        bx = jnp.dot(sx[j], wxt, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)       # [PR, S]
        by = jnp.dot(sy[j], wxt, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
        ox_ref[j, :] = jnp.sum(bx * wyt, axis=0)
        oy_ref[j, :] = jnp.sum(by * wyt, axis=0)


@functools.partial(jax.jit, static_argnames=("pr", "interpret"))
def sample_patches(gx: jnp.ndarray, gy: jnp.ndarray, lvl: jnp.ndarray,
                   ys: jnp.ndarray, xs: jnp.ndarray,
                   pr: int, interpret: bool = False):
    """Bilinear-sample (gx, gy) [L, H, W] at float (ys, xs) [N, S] per-slot.

    pr: static strip rows (multiple of 8); every slot's samples must span
    fewer than pr - 9 rows (8 rows go to offset alignment, 1 to bilinear
    support) — callers size it from the config's worst-case support.
    Returns (dx [N, S], dy [N, S], inb [N, S]).
    """
    l, h, w = gx.shape
    n, s = ys.shape
    assert n % _G == 0, (n, _G)
    assert pr % 8 == 0, pr

    inb = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    ys = jnp.clip(ys, 0.0, h - 1.000001)
    xs = jnp.clip(xs, 0.0, w - 1.000001)

    # pad planes: width to a lane multiple, height to cover one strip
    hp = max((h + 7) // 8 * 8, pr)
    wp = max((w + 127) // 128 * 128, 128)
    if (hp, wp) != (h, w):
        gx = jnp.pad(gx, ((0, 0), (0, hp - h), (0, wp - w)))
        gy = jnp.pad(gy, ((0, 0), (0, hp - h), (0, wp - w)))

    # strip top per slot: centred on the samples' row range (a mean can
    # shift off-centre and leak the extremes past the strip), rounded to
    # the NEAREST 8 so the alignment costs at most 4 rows per side
    yc = 0.5 * (jnp.min(ys, axis=1) + jnp.max(ys, axis=1))
    y0 = jnp.clip((yc.astype(jnp.int32) - pr // 2 + 4) & ~7, 0, hp - pr)
    ry = ys - y0[:, None].astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
            pltpu.VMEM((_G, pr, wp), jnp.float32),
            pltpu.VMEM((_G, pr, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _G)),
        ],
    )
    dx, dy = pl.pallas_call(
        functools.partial(_kernel, pr=pr, wp=wp),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, s), jnp.float32),
                   jax.ShapeDtypeStruct((n, s), jnp.float32)],
        interpret=interpret,
    )(jnp.clip(lvl, 0, l - 1), y0, ry, xs, gx, gy)
    return dx, dy, inb
