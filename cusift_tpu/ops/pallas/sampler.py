"""Pallas patch sampler: per-keypoint gradient sampling as MXU matmuls.

Reference analog: the texture-unit bilinear fetches of
``ComputeOrientations`` / ``ExtractSiftDescriptors`` (SURVEY.md C9–C10,
hot loop #2).  TPU has no texture hardware, and XLA's generic gather pays
per fetched index — the [K*S] 4-corner gathers cost ~8 ms/frame on v5e even
fused.  This kernel exploits that every keypoint's samples live in one small
window of one pyramid level:

  * per grid step, DMA G keypoints' [PR, PC] patches of the *Gaussian*
    stack from HBM into VMEM and compute the (dx, dy) central differences
    in-register — the dense gradient planes never exist in HBM (the XLA
    path materialises ~50 MB of them per frame), and each keypoint costs
    ONE patch transfer instead of two.  Patch corners are aligned to the
    (8, 128) Mosaic tile (rows to 8, cols to 128, via ``pl.multiple_of``);
  * bilinear interpolation is *separable*: sample s of keypoint g is
    ``wy[g,s,:] @ patch[g] @ wx[g,s,:]^T`` with hat-function weights
    (<= 2 non-zeros per row).  Contracting columns first keeps the
    intermediate at [PR, S] and turns all samples of a keypoint into one
    [PR, PC] x [PC, S] MXU matmul per gradient channel (SURVEY.md §7
    "gathers into matmuls").  Bounding the patch at PC=256 columns instead
    of the image width keeps the contraction small — a full-width strip at
    the upscaled octave costs 6x the FLOPs for identical output.

Gradient border convention matches ops/gaussian.image_gradients: zero in
the first/last image row/column (masks built from the prefetched absolute
patch corners).  In-patch wrap-around from the rolled differences only
touches patch-edge lanes, which are either image borders (masked) or
outside every sample's hat support.  Samples whose true coordinates fall
outside the image get zero weight (the patch never contains them); callers
already zero those lanes via the ``inb`` mask.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Keypoints per grid step: larger groups amortise the per-grid-step
# overhead (block index math, DMA semaphore round) and let the in-flight
# patch DMAs overlap deeper, until VMEM pressure and tail quantisation
# turn it back down.  48 is the measured optimum on v5e (round-4 chip
# sweeps of the headline pipeline: at 5120 cap G=8 778.0k, 16 781.1k,
# 32 794.5k, 64 791.5k, 128 784.4k kpts/s; at the adopted 6144 cap
# G=32 800-802k vs **G=48 806k**).  The shipped value lives in
# SiftConfig.sampler_group and is plumbed through every wrapper's `g`
# argument; the env var remains an override for perf probes ONLY.
_G_DEFAULT = 48


def _resolve_g(g) -> int:
    env = os.environ.get("CUSIFT_SAMPLER_GROUP")
    if env:
        return int(env)
    return int(g) if g else _G_DEFAULT


def _kernel(lvl_ref, y0_ref, x0_ref,          # scalar prefetch [N]
            ry_ref, rx_ref,                   # VMEM blocks [G, S]
            g_ref,                            # HBM Gaussian stack [L, Hp, Wp]
            ox_ref, oy_ref,                   # VMEM out blocks [G, S]
            patches, sem,                     # scratch: patches + DMA sems
            *, pr: int, pc: int, h: int, w: int, bf16_dots: bool,
            _G: int):
    i = pl.program_id(0)

    def dma(j):
        k = i * _G + j
        y0 = pl.multiple_of(y0_ref[k], 8)     # aligned by the wrapper
        x0 = pl.multiple_of(x0_ref[k], 128)
        return pltpu.make_async_copy(
            g_ref.at[lvl_ref[k], pl.ds(y0, pr), pl.ds(x0, pc)],
            patches.at[j], sem.at[j])

    for j in range(_G):
        dma(j).start()
    for j in range(_G):
        dma(j).wait()

    s = ry_ref.shape[1]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (pr, s), 0).astype(jnp.float32)
    coli = jax.lax.broadcasted_iota(jnp.int32, (pc, s), 0).astype(jnp.float32)

    # Raw central differences for ALL G patches in one pass over the
    # flattened [G*PR, PC] block: 2 rolls instead of 16.  The row-axis
    # roll bleeds one row between adjacent patches, but those rows are
    # alignment margin outside every sample's hat support (same
    # wrap-around argument as the module docstring).
    pall = patches[:].reshape(_G * pr, pc)                     # [G*PR, PC]
    # pltpu.roll wants non-negative shifts: roll(-1) == roll(n-1)
    gx_all = 0.5 * (pltpu.roll(pall, pc - 1, 1) - pltpu.roll(pall, 1, 1))
    gy_all = 0.5 * (pltpu.roll(pall, _G * pr - 1, 0)
                    - pltpu.roll(pall, 1, 0))
    prow1 = jax.lax.broadcasted_iota(jnp.int32, (pr, 1), 0)
    pcol1 = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)

    for j in range(_G):
        k = i * _G + j
        # zero-at-border gradient masks are RANK-1 (x-borders depend only
        # on the column, y-borders only on the row): two tiny vectors
        # broadcast instead of full [PR, PC] mask builds
        arow = prow1 + y0_ref[k]                               # [PR, 1]
        acol = pcol1 + x0_ref[k]                               # [1, PC]
        my = ((arow > 0) & (arow < h - 1)).astype(jnp.float32)
        mx = ((acol > 0) & (acol < w - 1)).astype(jnp.float32)
        gx = gx_all[j * pr:(j + 1) * pr] * mx                  # [PR, PC]
        gy = gy_all[j * pr:(j + 1) * pr] * my
        ry = ry_ref[j, :]                                      # [S]
        rx = rx_ref[j, :]
        # NOTE: the hat-weight build must stay f32 — bf16 at coordinate
        # magnitudes ~PC quantises to quarter-pixel steps, destroying the
        # bilinear interpolation (only the post-difference VALUES are
        # bf16-safe, same principle as the gradient quantisation).
        wyt = jnp.maximum(0.0, 1.0 - jnp.abs(ry[None, :] - rowi))  # [PR, S]
        wxt = jnp.maximum(0.0, 1.0 - jnp.abs(rx[None, :] - coli))  # [PC, S]
        # both gradient channels contract against the SAME column-weight
        # matrix, so one [2*PR, PC] x [PC, S] dot replaces two — halving
        # the per-slot MXU issue count (the dots are far too small to
        # fill the MXU; issue latency, not FLOPs, is what they cost)
        gxy = jnp.concatenate([gx, gy], axis=0)                # [2PR, PC]
        if bf16_dots:
            # Quantising the GRADIENTS (not the patch) to bf16 is safe: a
            # bf16 pass over the patch values loses ~5e-3 absolute through
            # cancellation in the central difference, but rounding the
            # already-differenced gradients costs only ~2^-8 RELATIVE
            # (~1e-4 absolute at typical gradient magnitudes) — and a
            # single-pass bf16 MXU dot is 6x the HIGHEST (6-pass) rate.
            bxy = jnp.dot(gxy.astype(jnp.bfloat16),
                          wxt.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)  # [2PR, S]
        else:
            bxy = jnp.dot(gxy, wxt, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)  # [2PR, S]
        ox_ref[j, :] = jnp.sum(bxy[:pr] * wyt, axis=0)
        oy_ref[j, :] = jnp.sum(bxy[pr:] * wyt, axis=0)


def _kernel_sep(lvl_ref, y0_ref, x0_ref,      # scalar prefetch [N]
                ry_ref, rx_ref,               # VMEM blocks [G, GR]/[G, GC]
                g_ref,                        # HBM Gaussian stack
                ox_ref, oy_ref,               # VMEM out blocks [G, GR*GC]
                patches, sem,
                *, pr: int, pc: int, h: int, w: int, gr: int, gc: int,
                _G: int):
    """Separable-grid variant: the orientation stage samples an
    AXIS-ALIGNED regular grid, so its S = GR*GC samples factor into GR
    distinct rows x GC distinct cols — the hat-weight matrices shrink
    from [PR, S]/[PC, S] to [PR, GR]/[PC, GC] (~12x less build work) and
    all samples of a slot reduce to two skinny matmuls
    (wy^T @ patch @ wx), ~22x fewer FLOPs than the general kernel."""
    i = pl.program_id(0)

    def dma(j):
        k = i * _G + j
        y0 = pl.multiple_of(y0_ref[k], 8)
        x0 = pl.multiple_of(x0_ref[k], 128)
        return pltpu.make_async_copy(
            g_ref.at[lvl_ref[k], pl.ds(y0, pr), pl.ds(x0, pc)],
            patches.at[j], sem.at[j])

    for j in range(_G):
        dma(j).start()
    for j in range(_G):
        dma(j).wait()

    rowi = jax.lax.broadcasted_iota(jnp.int32, (pr, gr), 0).astype(jnp.float32)
    coli = jax.lax.broadcasted_iota(jnp.int32, (pc, gc), 0).astype(jnp.float32)
    pall = patches[:].reshape(_G * pr, pc)
    gx_all = 0.5 * (pltpu.roll(pall, pc - 1, 1) - pltpu.roll(pall, 1, 1))
    gy_all = 0.5 * (pltpu.roll(pall, _G * pr - 1, 0)
                    - pltpu.roll(pall, 1, 0))
    prow1 = jax.lax.broadcasted_iota(jnp.int32, (pr, 1), 0)
    pcol1 = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)

    for j in range(_G):
        k = i * _G + j
        arow = prow1 + y0_ref[k]
        acol = pcol1 + x0_ref[k]
        my = ((arow > 0) & (arow < h - 1)).astype(jnp.float32)
        mx = ((acol > 0) & (acol < w - 1)).astype(jnp.float32)
        gx = gx_all[j * pr:(j + 1) * pr] * mx
        gy = gy_all[j * pr:(j + 1) * pr] * my

        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry_ref[j, :][None, :] - rowi))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx_ref[j, :][None, :] - coli))
        wyb = wy.astype(jnp.bfloat16)                          # [PR, GR]
        wxb = wx.astype(jnp.bfloat16)                          # [PC, GC]
        bx = jnp.dot(gx.astype(jnp.bfloat16), wxb,
                     preferred_element_type=jnp.float32)       # [PR, GC]
        by = jnp.dot(gy.astype(jnp.bfloat16), wxb,
                     preferred_element_type=jnp.float32)
        ox = jnp.dot(wyb.T, bx.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)       # [GR, GC]
        oy = jnp.dot(wyb.T, by.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        # Mosaic cannot relayout a [GR, GC] tile into one flat row;
        # outputs stay 3-D and the wrapper flattens outside the kernel
        ox_ref[j] = ox
        oy_ref[j] = oy


def _sample_slot(gx, gy, ry, rx, rowi, coli, bf16_dots: bool):
    """Shared per-slot separable-bilinear sampling -> (dx, dy) [S].

    One fused [2*PR, PC] x [PC, S] dot for both gradient channels (they
    share the column-weight matrix; see _kernel)."""
    pr = gx.shape[0]
    wyt = jnp.maximum(0.0, 1.0 - jnp.abs(ry[None, :] - rowi))  # [PR, S]
    wxt = jnp.maximum(0.0, 1.0 - jnp.abs(rx[None, :] - coli))  # [PC, S]
    gxy = jnp.concatenate([gx, gy], axis=0)                    # [2PR, PC]
    if bf16_dots:
        bxy = jnp.dot(gxy.astype(jnp.bfloat16), wxt.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)      # [2PR, S]
    else:
        bxy = jnp.dot(gxy, wxt, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    return (jnp.sum(bxy[:pr] * wyt, axis=0),
            jnp.sum(bxy[pr:] * wyt, axis=0))


_PI = 3.14159265358979


def _atan2(y, x):
    """Elementwise atan2 from a 9th-order minimax atan polynomial.

    Mosaic has no atan2 primitive; this builds it from supported ops
    (~1e-6 rad on the octant, folded by the usual symmetries — bin
    widths are 2*pi/36, so the error is 5 orders below a bin)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    z = num / jnp.maximum(den, 1e-30)
    z2 = z * z
    a = z * (0.99997726 + z2 * (-0.33262347 + z2 * (0.19354346
             + z2 * (-0.11643287 + z2 * (0.05265332
             + z2 * -0.01172120)))))
    a = jnp.where(swap, (_PI / 2) - a, a)
    a = jnp.where(x < 0, _PI - a, a)
    return jnp.where(y < 0, -a, a)


def _fmod_pos(x, n: float):
    """x mod n into [0, n) for bounded float x (floor-based, exact)."""
    return x - n * jnp.floor(x / n)


def _grad_patches_prologue(patches, pr, pc, _G):
    """DMA'd patches -> raw central differences for the whole group."""
    pall = patches[:].reshape(_G * pr, pc)
    gx_all = 0.5 * (pltpu.roll(pall, pc - 1, 1) - pltpu.roll(pall, 1, 1))
    gy_all = 0.5 * (pltpu.roll(pall, _G * pr - 1, 0)
                    - pltpu.roll(pall, 1, 0))
    return gx_all, gy_all


def _kernel_hist(lvl_ref, y0_ref, x0_ref,     # scalar prefetch [N]
                 ry_ref, rx_ref, wv_ref,      # VMEM [G, S]
                 g_ref,                       # HBM Gaussian stack
                 hist_ref,                    # VMEM out [G, NB]
                 patches, sem,
                 *, pr: int, pc: int, h: int, w: int, nb: int, _G: int):
    """Fused orientation stage: sampling + gradient polar decomposition +
    soft circular binning, all in-register.

    The XLA path materialises dx/dy [K, S] in HBM plus a [K, S, NB]
    one-hot tensor for the histogram contraction (~80 MB/frame at the
    bench shape); here only the [G, NB] histograms ever leave the chip.
    wv is the caller's per-sample weight (Gaussian radial x in-bounds x
    keypoint validity)."""
    i = pl.program_id(0)

    def dma(j):
        k = i * _G + j
        y0 = pl.multiple_of(y0_ref[k], 8)
        x0 = pl.multiple_of(x0_ref[k], 128)
        return pltpu.make_async_copy(
            g_ref.at[lvl_ref[k], pl.ds(y0, pr), pl.ds(x0, pc)],
            patches.at[j], sem.at[j])

    for j in range(_G):
        dma(j).start()
    for j in range(_G):
        dma(j).wait()

    s = ry_ref.shape[1]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (pr, s), 0).astype(jnp.float32)
    coli = jax.lax.broadcasted_iota(jnp.int32, (pc, s), 0).astype(jnp.float32)
    bini = jax.lax.broadcasted_iota(jnp.int32, (nb, s), 0).astype(jnp.float32)
    gx_all, gy_all = _grad_patches_prologue(patches, pr, pc, _G)
    prow1 = jax.lax.broadcasted_iota(jnp.int32, (pr, 1), 0)
    pcol1 = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)

    for j in range(_G):
        k = i * _G + j
        arow = prow1 + y0_ref[k]
        acol = pcol1 + x0_ref[k]
        my = ((arow > 0) & (arow < h - 1)).astype(jnp.float32)
        mx = ((acol > 0) & (acol < w - 1)).astype(jnp.float32)
        gx = gx_all[j * pr:(j + 1) * pr] * mx
        gy = gy_all[j * pr:(j + 1) * pr] * my
        dx, dy = _sample_slot(gx, gy, ry_ref[j, :], rx_ref[j, :],
                              rowi, coli, True)                # [S]
        mag = jnp.sqrt(dx * dx + dy * dy)
        ang = _atan2(dy, dx)
        fbin = _fmod_pos(ang / (2.0 * _PI) * nb, float(nb))
        wgt = mag * wv_ref[j, :]
        dist = jnp.abs(fbin[None, :] - bini)                   # [NB, S]
        dist = jnp.minimum(dist, nb - dist)
        obin = jnp.maximum(0.0, 1.0 - dist)
        hist_ref[j, :] = jnp.sum(obin * wgt[None, :], axis=1)


def _kernel_desc(lvl_ref, y0_ref, x0_ref, th_ref,  # scalar prefetch [N]
                 ry_ref, rx_ref, wv_ref,           # VMEM [G, S]
                 wsp_ref,                          # VMEM [S, CELLS] static
                 g_ref,                            # HBM Gaussian stack
                 out_ref,                          # VMEM out [G, NB, CELLS]
                 patches, sem,
                 *, pr: int, pc: int, h: int, w: int, nb: int, cells: int,
                 _G: int):
    """Fused descriptor stage: sampling + rotated-frame binning + the
    spatial-cell contraction, in-register (see _kernel_hist).  Emits the
    raw [NB, CELLS] histogram block per slot; normalisation stays
    outside."""
    i = pl.program_id(0)

    def dma(j):
        k = i * _G + j
        y0 = pl.multiple_of(y0_ref[k], 8)
        x0 = pl.multiple_of(x0_ref[k], 128)
        return pltpu.make_async_copy(
            g_ref.at[lvl_ref[k], pl.ds(y0, pr), pl.ds(x0, pc)],
            patches.at[j], sem.at[j])

    for j in range(_G):
        dma(j).start()
    for j in range(_G):
        dma(j).wait()

    s = ry_ref.shape[1]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (pr, s), 0).astype(jnp.float32)
    coli = jax.lax.broadcasted_iota(jnp.int32, (pc, s), 0).astype(jnp.float32)
    bini = jax.lax.broadcasted_iota(jnp.int32, (nb, s), 0).astype(jnp.float32)
    gx_all, gy_all = _grad_patches_prologue(patches, pr, pc, _G)
    prow1 = jax.lax.broadcasted_iota(jnp.int32, (pr, 1), 0)
    pcol1 = jax.lax.broadcasted_iota(jnp.int32, (1, pc), 1)

    for j in range(_G):
        k = i * _G + j
        arow = prow1 + y0_ref[k]
        acol = pcol1 + x0_ref[k]
        my = ((arow > 0) & (arow < h - 1)).astype(jnp.float32)
        mx = ((acol > 0) & (acol < w - 1)).astype(jnp.float32)
        gx = gx_all[j * pr:(j + 1) * pr] * mx
        gy = gy_all[j * pr:(j + 1) * pr] * my
        dx, dy = _sample_slot(gx, gy, ry_ref[j, :], rx_ref[j, :],
                              rowi, coli, True)                # [S]
        mag = jnp.sqrt(dx * dx + dy * dy)
        ang = th_ref[k] - _atan2(dy, dx)
        fbin = _fmod_pos(ang / (2.0 * _PI) * nb, float(nb))
        wgt = mag * wv_ref[j, :]
        dist = jnp.abs(fbin[None, :] - bini)                   # [NB, S]
        dist = jnp.minimum(dist, nb - dist)
        contrib = jnp.maximum(0.0, 1.0 - dist) * wgt[None, :]
        out_ref[j] = jnp.dot(contrib.astype(jnp.bfloat16),
                             wsp_ref[:].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)


def _patch_geometry(gauss, ys, xs, pr, pc):
    """Shared wrapper math: pad the stack, choose aligned patch corners.

    Returns the padded stack; border masks must use the ORIGINAL h, w
    (the zero-pad apron is not image content) — callers capture them
    before invoking this.
    """
    l, h, w = gauss.shape
    inb = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    ys = jnp.clip(ys, 0.0, h - 1.000001)
    xs = jnp.clip(xs, 0.0, w - 1.000001)
    hp = max((h + 7) // 8 * 8, pr)
    wp = max((w + 127) // 128 * 128, pc)
    if (hp, wp) != (h, w):
        gauss = jnp.pad(gauss, ((0, 0), (0, hp - h), (0, wp - w)))
    yc = 0.5 * (jnp.min(ys, axis=1) + jnp.max(ys, axis=1))
    xc = 0.5 * (jnp.min(xs, axis=1) + jnp.max(xs, axis=1))
    y0 = jnp.clip((yc.astype(jnp.int32) - pr // 2 + 4) & ~7, 0, hp - pr)
    x0 = jnp.clip((xc.astype(jnp.int32) - pc // 2 + 64) & ~127, 0, wp - pc)
    ry = ys - y0[:, None].astype(jnp.float32)
    rx = xs - x0[:, None].astype(jnp.float32)
    return gauss, inb, y0, x0, ry, rx


@functools.partial(jax.jit, static_argnames=("nb", "pr", "pc", "g", "interpret"))
def sample_ori_hist(gauss: jnp.ndarray, lvl: jnp.ndarray,
                    ys: jnp.ndarray, xs: jnp.ndarray, wv: jnp.ndarray,
                    nb: int, pr: int, pc: int = 256,
                    g: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused orientation histograms: [N, nb] from per-slot sample grids.

    wv [N, S]: per-sample weight (radial Gaussian x keypoint validity);
    out-of-image samples are zeroed in-wrapper via the inb mask.
    """
    l, h, w = gauss.shape
    n, s = ys.shape
    g = _resolve_g(g)
    pad_n = (-n) % g
    if pad_n:
        lvl = jnp.pad(lvl, (0, pad_n))
        ys = jnp.pad(ys, ((0, pad_n), (0, 0)))
        xs = jnp.pad(xs, ((0, pad_n), (0, 0)))
        wv = jnp.pad(wv, ((0, pad_n), (0, 0)))
    gauss, inb, y0, x0, ry, rx = _patch_geometry(gauss, ys, xs, pr, pc)
    wv = wv * inb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=((n + pad_n) // g,),
        in_specs=[
            pl.BlockSpec((g, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((g, nb), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, pr, pc), jnp.float32),
            pltpu.SemaphoreType.DMA((g,)),
        ],
    )
    (hist,) = pl.pallas_call(
        functools.partial(_kernel_hist, pr=pr, pc=pc, h=h, w=w, nb=nb,
                          _G=g),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n + pad_n, nb), jnp.float32)],
        interpret=interpret,
    )(jnp.clip(lvl, 0, l - 1), y0, x0, ry, rx, wv, gauss)
    return hist[:n]


@functools.partial(jax.jit,
                   static_argnames=("nb", "cells", "pr", "pc", "g", "interpret"))
def sample_desc_raw(gauss: jnp.ndarray, lvl: jnp.ndarray,
                    ys: jnp.ndarray, xs: jnp.ndarray,
                    theta: jnp.ndarray, wv: jnp.ndarray,
                    w_spatial: jnp.ndarray, nb: int, cells: int,
                    pr: int, pc: int = 256, g: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused raw descriptors: [N, nb, cells] (normalise outside).

    theta [N] slot orientations; wv [N, S] Gaussian spatial weights;
    w_spatial [S, cells] static bilinear cell weights.
    """
    l, h, w = gauss.shape
    n, s = ys.shape
    g = _resolve_g(g)
    pad_n = (-n) % g
    if pad_n:
        lvl = jnp.pad(lvl, (0, pad_n))
        ys = jnp.pad(ys, ((0, pad_n), (0, 0)))
        xs = jnp.pad(xs, ((0, pad_n), (0, 0)))
        theta = jnp.pad(theta, (0, pad_n))
        wv = jnp.pad(wv, ((0, pad_n), (0, 0)))
    gauss, inb, y0, x0, ry, rx = _patch_geometry(gauss, ys, xs, pr, pc)
    wv = wv * inb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=((n + pad_n) // g,),
        in_specs=[
            pl.BlockSpec((g, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, cells), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((g, nb, cells), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, pr, pc), jnp.float32),
            pltpu.SemaphoreType.DMA((g,)),
        ],
    )
    (raw,) = pl.pallas_call(
        functools.partial(_kernel_desc, pr=pr, pc=pc, h=h, w=w,
                          nb=nb, cells=cells, _G=g),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n + pad_n, nb, cells),
                                        jnp.float32)],
        interpret=interpret,
    )(jnp.clip(lvl, 0, l - 1), y0, x0, theta, ry, rx, wv, w_spatial, gauss)
    return raw[:n]


@functools.partial(jax.jit,
                   static_argnames=("pr", "pc", "g", "interpret"))
def sample_grad_patches_sep(gauss: jnp.ndarray, lvl: jnp.ndarray,
                            ys_rows: jnp.ndarray, xs_cols: jnp.ndarray,
                            pr: int, pc: int = 256, g: int | None = None,
                            interpret: bool = False):
    """Separable-grid gradient sampling: ys_rows [N, GR], xs_cols [N, GC]
    define an axis-aligned grid per slot; returns (dx, dy, inb) shaped
    [N, GR*GC] in row-major (r * GC + c) order."""
    l, h, w = gauss.shape
    n, gr = ys_rows.shape
    gc = xs_cols.shape[1]
    g = _resolve_g(g)
    assert pr % 8 == 0 and pc % 128 == 0, (pr, pc)

    inb = ((ys_rows >= 0) & (ys_rows <= h - 1))[:, :, None] \
        & ((xs_cols >= 0) & (xs_cols <= w - 1))[:, None, :]
    inb = inb.reshape(n, gr * gc)
    pad_n = (-n) % g
    if pad_n:
        lvl = jnp.pad(lvl, (0, pad_n))
        ys_rows = jnp.pad(ys_rows, ((0, pad_n), (0, 0)))
        xs_cols = jnp.pad(xs_cols, ((0, pad_n), (0, 0)))
    ys = jnp.clip(ys_rows, 0.0, h - 1.000001)
    xs = jnp.clip(xs_cols, 0.0, w - 1.000001)

    hp = max((h + 7) // 8 * 8, pr)
    wp = max((w + 127) // 128 * 128, pc)
    if (hp, wp) != (h, w):
        gauss = jnp.pad(gauss, ((0, 0), (0, hp - h), (0, wp - w)))

    yc = 0.5 * (jnp.min(ys, axis=1) + jnp.max(ys, axis=1))
    xc = 0.5 * (jnp.min(xs, axis=1) + jnp.max(xs, axis=1))
    y0 = jnp.clip((yc.astype(jnp.int32) - pr // 2 + 4) & ~7, 0, hp - pr)
    x0 = jnp.clip((xc.astype(jnp.int32) - pc // 2 + 64) & ~127, 0, wp - pc)
    ry = ys - y0[:, None].astype(jnp.float32)
    rx = xs - x0[:, None].astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=((n + pad_n) // g,),
        in_specs=[
            pl.BlockSpec((g, gr), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, gc), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((g, gr, gc), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, gr, gc), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, pr, pc), jnp.float32),
            pltpu.SemaphoreType.DMA((g,)),
        ],
    )
    dx, dy = pl.pallas_call(
        functools.partial(_kernel_sep, pr=pr, pc=pc, h=h, w=w,
                          gr=gr, gc=gc, _G=g),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n + pad_n, gr, gc), jnp.float32),
                   jax.ShapeDtypeStruct((n + pad_n, gr, gc), jnp.float32)],
        interpret=interpret,
    )(jnp.clip(lvl, 0, l - 1), y0, x0, ry, rx, gauss)
    return (dx[:n].reshape(n, gr * gc), dy[:n].reshape(n, gr * gc), inb)


@functools.partial(jax.jit,
                   static_argnames=("pr", "pc", "g", "interpret", "debug_checks",
                                    "bf16_dots"))
def sample_grad_patches(gauss: jnp.ndarray, lvl: jnp.ndarray,
                        ys: jnp.ndarray, xs: jnp.ndarray,
                        pr: int, pc: int = 256, g: int | None = None,
                        interpret: bool = False,
                        debug_checks: bool = False,
                        bf16_dots: bool = True):
    """Sample image gradients of `gauss` [L, H, W] at (ys, xs) [N, S].

    Gradients are central differences computed in-kernel from one Gaussian
    patch per slot.  pr: static patch rows (multiple of 8); every slot's
    samples must span fewer than pr - 11 rows (4+4 nearest-8 alignment,
    1 bilinear support, 1 per side so the central difference never reads
    the wrapped patch-edge lanes).  pc: static patch cols (multiple of
    128); column span under pc - 131.
    Returns (dx [N, S], dy [N, S], inb [N, S]).
    """
    l, h, w = gauss.shape
    n, s = ys.shape
    g = _resolve_g(g)
    assert pr % 8 == 0 and pc % 128 == 0, (pr, pc)

    inb = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    # pad the slot count to the grid group (dead slots sample patch (0,0);
    # their outputs are sliced off below)
    pad_n = (-n) % g
    if pad_n:
        lvl = jnp.pad(lvl, (0, pad_n))
        ys = jnp.pad(ys, ((0, pad_n), (0, 0)))
        xs = jnp.pad(xs, ((0, pad_n), (0, 0)))
    ys = jnp.clip(ys, 0.0, h - 1.000001)
    xs = jnp.clip(xs, 0.0, w - 1.000001)

    # pad the stack: width to a lane multiple >= one patch, height likewise
    hp = max((h + 7) // 8 * 8, pr)
    wp = max((w + 127) // 128 * 128, pc)
    if (hp, wp) != (h, w):
        gauss = jnp.pad(gauss, ((0, 0), (0, hp - h), (0, wp - w)))

    # patch corner per slot: centred on the samples' coordinate range
    # (a mean can shift off-centre and leak the extremes past the patch),
    # rounded to the NEAREST tile so alignment costs half a tile per side
    yc = 0.5 * (jnp.min(ys, axis=1) + jnp.max(ys, axis=1))
    xc = 0.5 * (jnp.min(xs, axis=1) + jnp.max(xs, axis=1))
    y0 = jnp.clip((yc.astype(jnp.int32) - pr // 2 + 4) & ~7, 0, hp - pr)
    x0 = jnp.clip((xc.astype(jnp.int32) - pc // 2 + 64) & ~127, 0, wp - pc)
    ry = ys - y0[:, None].astype(jnp.float32)
    rx = xs - x0[:, None].astype(jnp.float32)

    if debug_checks:
        # SURVEY.md §5.2 bounds sanitizer: the kernel DMAs [y0:y0+pr,
        # x0:x0+pc] from HBM at Mosaic-aligned offsets and evaluates hat
        # weights needing rows floor(ry)..floor(ry)+1 inside the patch —
        # checkify so interpret-mode tests fail loudly on any violation
        # instead of silently reading a neighbouring tile.
        from jax.experimental import checkify
        checkify.check(jnp.all((y0 >= 0) & (y0 + pr <= hp)),
                       "sampler: patch rows out of the padded stack")
        checkify.check(jnp.all((x0 >= 0) & (x0 + pc <= wp)),
                       "sampler: patch cols out of the padded stack")
        checkify.check(jnp.all(y0 % 8 == 0),
                       "sampler: patch row corner not sublane-aligned")
        checkify.check(jnp.all(x0 % 128 == 0),
                       "sampler: patch col corner not lane-aligned")
        checkify.check(jnp.all((ry >= 0.0) & (ry <= pr - 1.0)),
                       "sampler: sample row outside patch support")
        checkify.check(jnp.all((rx >= 0.0) & (rx <= pc - 1.0)),
                       "sampler: sample col outside patch support")
        checkify.check(jnp.all((lvl >= 0) & (lvl < l)),
                       "sampler: level index out of range")

    np_ = n + pad_n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(np_ // g,),
        in_specs=[
            pl.BlockSpec((g, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((g, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, pr, pc), jnp.float32),
            pltpu.SemaphoreType.DMA((g,)),
        ],
    )
    dx, dy = pl.pallas_call(
        functools.partial(_kernel, pr=pr, pc=pc, h=h, w=w,
                          bf16_dots=bf16_dots, _G=g),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((np_, s), jnp.float32),
                   jax.ShapeDtypeStruct((np_, s), jnp.float32)],
        interpret=interpret,
    )(jnp.clip(lvl, 0, l - 1), y0, x0, ry, rx, gauss)
    return dx[:n], dy[:n], inb
