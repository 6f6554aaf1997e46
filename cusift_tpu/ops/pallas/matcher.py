"""Fused Pallas descriptor matcher: sim matmul + top-2 without HBM round-trip.

Reference analog: the shared-memory tiled GEMM + reduction in
``MatchSiftPoints*`` / ``FindMaxCorr`` (SURVEY.md C12).  The XLA version in
ops/match.py materialises the [N, M] similarity matrix in HBM between the
matmul and the top-k (64 MB at 4096x4096 f32 — ~160 us of pure HBM traffic
at v5e bandwidth).  This kernel keeps each [TN, M] similarity block in VMEM:
one MXU dot per grid step, row-wise best/second-best reduced in-register,
only [N, 3]-sized results ever leave the chip.

The B matrix (transposed, [128, M]) is replicated into VMEM across grid
steps — for M <= ~8192 it fits comfortably (4 MB at M=8192); larger M falls
back to the XLA path at the call site.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import MatchConfig
from ..match import Matches

_TN = 256  # query rows per grid step


def _kernel(a_ref, bt_ref, vb_ref, top_ref, idx_ref):
    sim = jnp.dot(a_ref[:], bt_ref[:], preferred_element_type=jnp.float32)
    sim = jnp.where(vb_ref[:] > 0.0, sim, -jnp.inf)        # [TN, M]
    s1 = jnp.max(sim, axis=-1)
    i1 = jnp.argmax(sim, axis=-1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    sim2 = jnp.where(cols == i1[:, None], -jnp.inf, sim)
    s2 = jnp.max(sim2, axis=-1)
    top_ref[:] = jnp.stack([s1, s2], axis=-1)
    idx_ref[:] = i1[:, None]


def _pallas_top2(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                 valid_b: jnp.ndarray, interpret: bool = False):
    n, d = desc_a.shape
    m = desc_b.shape[0]
    pad_n = (-n) % _TN
    a = jnp.pad(desc_a, ((0, pad_n), (0, 0)))
    grid = ((n + pad_n) // _TN,)
    top, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TN, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TN, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n + pad_n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n + pad_n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a, desc_b.T, valid_b[None, :].astype(jnp.float32))
    return top[:n], idx[:n, 0]


@partial(jax.jit, static_argnames=("cfg", "interpret", "debug_checks"))
def match_pallas(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
                 desc_b: jnp.ndarray, valid_b: jnp.ndarray,
                 cfg: MatchConfig = MatchConfig(),
                 interpret: bool = False,
                 debug_checks: bool = False) -> Matches:
    """Drop-in replacement for ops.match.match using the fused kernel."""
    top, i1 = _pallas_top2(desc_a, desc_b, valid_b, interpret)
    if debug_checks:
        # SURVEY.md §5.2 bounds sanitizer: the kernel's in-VMEM argmax must
        # index a real B row (padded query rows are sliced off above; the
        # B side is never padded).
        from jax.experimental import checkify
        checkify.check(jnp.all((i1 >= 0) & (i1 < desc_b.shape[0])),
                       "matcher: best-match index out of range")
    s1, s2 = top[:, 0], top[:, 1]
    # clip as in ops/match.py: -inf masked lanes must not produce NaN ratios
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.clip(s1, -1.0, 1.0), 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.clip(s2, -1.0, 1.0), 1e-12))
    ratio = d1 / d2
    # isfinite(s2) mirrors ops/match.py: with a single valid candidate in B
    # the second-best is -inf, d2 = inf and ratio = 0 — without the guard
    # the ratio test passes vacuously for every query row.
    ok = (valid_a & jnp.isfinite(s1) & jnp.isfinite(s2)
          & (ratio < cfg.ratio_thresh) & (s1 > cfg.min_score))
    return Matches(idx=i1, dist=d1, score=s1, ratio=ratio, ok=ok)
