"""Fused octave kernel: multi-scale blur + DoG + extrema score in one pass.

Reference analog: the ``LaplaceMulti`` CUDA kernel (SURVEY.md C7, hot loop
#1) computes all blur levels and DoG planes of one octave with
shared-memory row caches; ``FindPointsMulti``'s dense extremum test (C8)
follows as a second kernel.  The XLA form pays an HBM round-trip per
separable-conv pass (~24 passes/octave) plus another for the 26-neighbour
test.  This kernel streams the octave base once:

  * grid over row tiles; each step DMAs one base tile (+ halo) into VMEM;
  * every level is blurred DIRECTLY from the base with total-sigma taps
    (sqrt(sig_i^2 - sig_0^2)) — ~35% more VPU FMAs than the incremental
    chain but half the halo and no level-to-level serialisation, and VPU
    FLOPs are free relative to HBM here;
  * DoG planes and the strict 26-neighbour extrema score (contrast
    prefilter included, borders zeroed) are computed in-register from the
    still-resident levels;
  * only what downstream needs leaves the chip: DoG (refinement cubes),
    Gaussian levels 1..S (the gradient sampler's input), and the score
    (feeds approx_max_k directly).

The caller pre-pads the base with reflect-101 borders (matching
cv2.GaussianBlur / the XLA path) so the kernel does pure valid-region
arithmetic at static offsets.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian import gaussian_taps

_TR = 48  # output rows per grid step


def _plan(cfg, h: int, w: int, tr: int = _TR):
    """Static geometry: taps per level, paddings, tile counts."""
    sig = cfg.sigmas()                      # absolute blur per level
    taps = []
    for i in range(1, cfg.levels_per_octave):
        sd = math.sqrt(max(sig[i] ** 2 - sig[0] ** 2, 1e-12))
        taps.append(gaussian_taps(sd))
    rmax = max((t.shape[0] - 1) // 2 for t in taps)
    rp = rmax + 1                            # +1: extrema needs a DoG halo
    rp = (rp + 3) // 4 * 4                   # 2*rp on the sublane grid, so
                                             # tile height stays a mult of 8
    wv = max((w + 127) // 128 * 128, 128)    # output plane width
    wp = (wv + 2 * rp + 2 + 127) // 128 * 128
    n_tiles = (h + tr - 1) // tr
    return taps, rp, wv, wp, n_tiles


def _compute(samp_dst, dog_dst, score_dst, base_ref, tile, acc, levs, sem,
             *, taps, rp, tr, h, w, wv, s, prefilter, batched):
    """Shared tile body: blur levels, DoG, extrema score for one row tile.

    ``*_dst`` are [planes, tr, wv] refs — either the pipeline's VMEM output
    blocks (``_kernel``) or manually-DMA'd scratch buffers (``_kernel_hbm``);
    both index identically.  ``batched`` selects the (batch, tile) grid form:
    the base lives whole in HBM/ANY space (a batched block would need a
    non-trivial index_map, which Mosaic rejects for ANY-space blocks — the
    reason ``jax.vmap`` cannot batch this kernel directly), so the batch
    index just rides the manual input DMA.
    """
    i = pl.program_id(1 if batched else 0)

    src = base_ref.at[pl.program_id(0)] if batched else base_ref
    cp = pltpu.make_async_copy(
        src.at[pl.ds(pl.multiple_of(i * tr, 8), tr + 2 * rp), :],
        tile, sem)
    cp.start()
    cp.wait()

    # level frame: rows [-1, tr+1), cols [-1, wv+1) rel. the output tile
    hv2, wv2 = tr + 2, wv + 2

    # level 0 = base slice; levels 1.. = separable blur of the base tile.
    # Accumulate through VMEM scratch refs one tap at a time — keeping the
    # whole unrolled add tree as live vector values blows the 16 MB VMEM
    # stack (43 MB at 1280 width).
    levs[0, :hv2, :wv2] = tile[rp - 1: rp - 1 + hv2,
                               rp - 1: rp - 1 + wv2]
    for li, tp in enumerate(taps, start=1):
        r = (tp.shape[0] - 1) // 2
        wgts = tp.tolist()

        def conv_terms(load):
            """Symmetric-tap terms: w_k (x_k + x_{2r-k}) — halves the FMAs.

            Yields expression-tree chunks so the live vector set stays
            bounded (a fully unrolled tree blew the VMEM stack)."""
            terms = [jnp.float32(wgts[r]) * load(r)]
            for k in range(r):
                terms.append(jnp.float32(wgts[k]) * (load(k) + load(2 * r - k)))
            chunk = None
            for n, t_ in enumerate(terms):
                chunk = t_ if chunk is None else chunk + t_
                if (n + 1) % 8 == 0:
                    yield chunk
                    chunk = None
            if chunk is not None:
                yield chunk

        y0 = rp - 1 - r
        first = True
        for c in conv_terms(lambda k: tile[y0 + k: y0 + k + hv2, :]):
            acc[:, :] = c if first else acc[:, :] + c
            first = False
        x0 = rp - 1 - r
        first = True
        for c in conv_terms(lambda k: acc[:, x0 + k: x0 + k + wv2]):
            levs[li, :hv2, :wv2] = c if first else levs[li, :hv2, :wv2] + c
            first = False

    # outputs: sampler levels 1..s and all DoG planes
    for j in range(1, s + 1):
        samp_dst[j - 1] = levs[j, 1:hv2 - 1, 1:wv2 - 1]
    for k in range(s + 2):
        dog_dst[k] = (levs[k + 1, 1:hv2 - 1, 1:wv2 - 1]
                      - levs[k, 1:hv2 - 1, 1:wv2 - 1])

    # strict 26-neighbour extrema score for DoG levels 1..s
    rows = jax.lax.broadcasted_iota(jnp.int32, (tr, wv), 0) + i * tr
    cols = jax.lax.broadcasted_iota(jnp.int32, (tr, wv), 1)
    interior = ((rows > 0) & (rows < h - 1) &
                (cols > 0) & (cols < w - 1))
    for j in range(1, s + 1):
        wmax = None
        wmin = None
        for dz in (j - 1, j, j + 1):
            d = levs[dz + 1, :hv2, :wv2] - levs[dz, :hv2, :wv2]
            for dy in range(3):
                for dx in range(3):
                    v = d[dy: dy + tr, dx: dx + wv]
                    wmax = v if wmax is None else jnp.maximum(wmax, v)
                    wmin = v if wmin is None else jnp.minimum(wmin, v)
        c = (levs[j + 1, 1:hv2 - 1, 1:wv2 - 1]
             - levs[j, 1:hv2 - 1, 1:wv2 - 1])
        is_max = (c >= wmax) & (c > prefilter)
        is_min = (c <= wmin) & (c < -prefilter)
        ok = (is_max | is_min) & interior
        score_dst[j - 1] = jnp.where(ok, jnp.abs(c), -jnp.inf)


def _kernel(base_ref, samp_ref, dog_ref, score_ref, tile, acc, levs, sem,
            **kw):
    """Pipelined form: outputs ride the pallas pipeline's VMEM blocks
    (double-buffered by the runtime — the 11 planes cap the tile at
    ~48 rows before VMEM overflows)."""
    _compute(samp_ref, dog_ref, score_ref, base_ref, tile, acc, levs, sem,
             **kw)


def _kernel_hbm(base_ref, samp_ref, dog_ref, score_ref, tile, acc, levs,
                obuf_s, obuf_d, obuf_c, sem, sem_out, **kw):
    """Manual-output form: outputs live in HBM and each tile's planes are
    DMA'd out explicitly from single-buffered VMEM scratch.  Dropping the
    runtime's double-buffered output blocks frees ~half the VMEM budget,
    so the row tile can grow to 96-128 and the ~500 small VPU ops per
    tile amortise over 2-2.7x the data (the measured residual of the
    pipelined form vs the XLA chain — docs/kernels.md).  The out-DMA is
    ~7 us/tile against 100s of us of compute, so issuing it eagerly and
    waiting in-line costs ~nothing.
    """
    _compute(obuf_s, obuf_d, obuf_c, base_ref, tile, acc, levs, sem, **kw)
    batched = kw["batched"]
    i = pl.program_id(1 if batched else 0)
    tr = kw["tr"]
    row = pl.ds(pl.multiple_of(i * tr, 8), tr)
    for buf, ref in ((obuf_s, samp_ref), (obuf_d, dog_ref),
                     (obuf_c, score_ref)):
        dst = ref.at[pl.program_id(0)] if batched else ref
        cp = pltpu.make_async_copy(buf, dst.at[:, row, :], sem_out)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("cfg", "h", "w", "interpret",
                                             "tr", "hbm_out"))
def fused_octave(base: jnp.ndarray, cfg, h: int, w: int,
                 interpret: bool = False, tr: int = _TR,
                 hbm_out: bool = False):
    """One octave from its base level [H, W] (already at sigma0).

    Returns (sample_levels [S, H, W], dog [S+2, H, W], score [S, H, W])
    where score holds |DoG| at strict interior 26-neighbour extrema that
    clear the contrast prefilter, and -inf elsewhere.  A [B, H, W] base
    returns [B, ...]-leading outputs, with the batch riding the Pallas
    grid; ``jax.vmap`` routes here through a ``custom_vmap`` rule because
    the default batching rule would give the ANY-space base block a
    non-trivial index_map, which the Mosaic lowering rejects (it only
    pipelines VMEM blocks).

    ``tr`` is the output rows per grid step; ``hbm_out`` selects the
    manual-output-DMA kernel (the only way to run tr > 48 within VMEM).
    """

    @jax.custom_batching.custom_vmap
    def call(b_):
        return _fused_octave_impl(b_, cfg, h, w, interpret, tr, hbm_out)

    @call.def_vmap
    def _rule(axis_size, in_batched, b_):
        del axis_size
        assert in_batched[0]
        out = _fused_octave_impl(b_, cfg, h, w, interpret, tr, hbm_out)
        return out, (True, True, True)

    return call(base)


def _fused_octave_impl(base: jnp.ndarray, cfg, h: int, w: int,
                       interpret: bool, tr: int, hbm_out: bool):
    assert base.ndim in (2, 3), (
        f"fused_octave supports one batch level at most (base.ndim="
        f"{base.ndim}); nested vmap cannot ride the kernel grid")
    batched = base.ndim == 3
    nb = base.shape[0] if batched else 1
    s = cfg.scales_per_octave
    prefilter = 0.5 * cfg.contrast_thresh / s
    assert tr % 8 == 0, tr
    taps, rp, wv, wp, n_tiles = _plan(cfg, h, w, tr)
    hp = n_tiles * tr + 2 * rp
    # Index-math bounds (SURVEY.md §5.2): all kernel slices are static, so
    # the guards are trace-time asserts rather than checkify.  The last
    # tile's DMA reads rows [(n_tiles-1)*TR, (n_tiles-1)*TR + TR + 2rp)
    # and the widest x-conv reads cols up to rp - 1 + rmax + wv + 2.
    rmax = max((t.shape[0] - 1) // 2 for t in taps)
    assert (n_tiles - 1) * tr + tr + 2 * rp <= hp
    assert rp - 1 + rmax + wv + 2 <= wp, (rp, rmax, wv, wp)
    assert rp >= rmax + 1, (rp, rmax)   # DoG halo for the extrema stencil

    # reflect-101 only up to rp (reflect pads must stay < dim); the tile
    # overhang past the last image row is zero-filled and never read back
    # (outputs are sliced to [:h, :w])
    lead = ((0, 0),) if batched else ()
    pad_r = jnp.pad(base, lead + ((rp, rp), (rp, rp)), mode="reflect")
    pad_r = jnp.pad(pad_r, lead + ((0, hp - h - 2 * rp),
                                   (0, wp - w - 2 * rp)))

    scratch = [
        pltpu.VMEM((tr + 2 * rp, wp), jnp.float32),
        pltpu.VMEM((tr + 2, wp), jnp.float32),
        pltpu.VMEM((cfg.levels_per_octave, tr + 2,
                    (wv + 2 + 127) // 128 * 128), jnp.float32),
    ]
    if hbm_out:
        kernel = _kernel_hbm
        out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * 3
        scratch += [
            pltpu.VMEM((s, tr, wv), jnp.float32),
            pltpu.VMEM((s + 2, tr, wv), jnp.float32),
            pltpu.VMEM((s, tr, wv), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        kernel = _kernel
        if batched:
            out_specs = [
                pl.BlockSpec((None, s, tr, wv), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, s + 2, tr, wv), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, s, tr, wv), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
            ]
        else:
            out_specs = [
                pl.BlockSpec((s, tr, wv), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s + 2, tr, wv), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s, tr, wv), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ]
        scratch += [pltpu.SemaphoreType.DMA(())]

    blead = (nb,) if batched else ()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=blead + (n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    samp, dog, score = pl.pallas_call(
        functools.partial(kernel, taps=taps, rp=rp, tr=tr, h=h, w=w,
                          wv=wv, s=s, prefilter=prefilter, batched=batched),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(blead + (s, n_tiles * tr, wv), jnp.float32),
            jax.ShapeDtypeStruct(blead + (s + 2, n_tiles * tr, wv),
                                 jnp.float32),
            jax.ShapeDtypeStruct(blead + (s, n_tiles * tr, wv), jnp.float32),
        ],
        interpret=interpret,
    )(pad_r)
    return samp[..., :h, :w], dog[..., :h, :w], score[..., :h, :w]
