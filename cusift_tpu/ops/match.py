"""Brute-force descriptor matching on the MXU.

Reference analog: ``MatchSiftData`` (SURVEY.md C12, hot loop #3) — a
hand-rolled shared-memory tiled GEMM over 128-d descriptors plus per-row
best/second-best reduction.  On TPU this is literally
``A @ B.T`` on the systolic array followed by `top_k(2)` per row; the whole
matcher is ~10 lines and runs at matmul speed-of-light.  A fused Pallas
variant that never materialises the [N, M] similarity matrix in HBM lives in
``ops/pallas/matcher.py``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatchConfig


class Matches(NamedTuple):
    """Per-row-of-A match results (reference: fields written into SiftData A)."""

    idx: jnp.ndarray    # [N] int32 best match in B
    dist: jnp.ndarray   # [N] L2 distance of best match ("match_error")
    score: jnp.ndarray  # [N] best correlation (dot product)
    ratio: jnp.ndarray  # [N] d1/d2 ambiguity
    ok: jnp.ndarray     # [N] passed validity + ratio test (+ cross-check)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def match(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
          desc_b: jnp.ndarray, valid_b: jnp.ndarray,
          cfg: MatchConfig = MatchConfig(),
          interpret: bool = False) -> Matches:
    """Ratio-test matching of [N, 128] against [M, 128] unit descriptors.

    ``interpret`` runs the Pallas kernel in interpret mode (CPU tests of the
    pallas/cross-check branch only; never set on TPU).
    """
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    # The kernel replicates the non-query side into VMEM; with cross_check
    # BOTH sides take a turn as the replicated operand, so the guard must
    # cover the larger of the two (an asymmetric large-A/small-B call would
    # otherwise blow the VMEM budget on the reverse pass).
    vmem_limit = max(desc_a.shape[0], desc_b.shape[0]) if cfg.cross_check \
        else desc_b.shape[0]
    if vmem_limit > 8192:
        backend = "xla"  # replicated side would not fit VMEM in the kernel

    if backend == "pallas":
        # fused MXU matmul + in-VMEM top-2: the [N, M] similarity matrix
        # never round-trips through HBM (ops/pallas/matcher.py)
        from .pallas.matcher import _pallas_top2
        top, i1 = _pallas_top2(desc_a, desc_b, valid_b, interpret)
        s1, s2 = top[:, 0], top[:, 1]
        if cfg.cross_check:
            _, best_for_b = _pallas_top2(desc_b, desc_a, valid_a, interpret)
    else:
        sim = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)
        sim = jnp.where(valid_b[None, :], sim, -jnp.inf)       # mask dead cols
        # best + second-best via two dense max passes: `lax.top_k` sorts
        # each row (~10 ms at 4096x4096 on v5e); max/argmax are plain VPU
        # reductions.
        s1 = jnp.max(sim, axis=-1)
        i1 = jnp.argmax(sim, axis=-1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        s2 = jnp.max(jnp.where(cols == i1[:, None], -jnp.inf, sim), axis=-1)
        if cfg.cross_check:
            sim_m = jnp.where(valid_a[:, None], sim, -jnp.inf)
            best_for_b = jnp.argmax(sim_m, axis=0)              # [M]

    # unit vectors: d^2 = 2 - 2 * <a, b>.  Clamp the correlations to the
    # valid [-1, 1] range first: masked lanes carry -inf, and inf/inf in
    # the ratio would be a NaN (flagged by jax_debug_nans) even though the
    # ok gate discards those lanes.
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.clip(s1, -1.0, 1.0), 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.clip(s2, -1.0, 1.0), 1e-12))
    ratio = d1 / d2
    # isfinite(s2): with a single valid candidate in B the second-best is
    # -inf, d2 = inf and ratio = 0 — the test would pass vacuously for
    # every query row
    ok = (valid_a & jnp.isfinite(s1) & jnp.isfinite(s2)
          & (ratio < cfg.ratio_thresh) & (s1 > cfg.min_score))
    if cfg.cross_check:
        ok = ok & (best_for_b[i1] == jnp.arange(desc_a.shape[0]))
    return Matches(idx=i1, dist=d1,
                   score=s1, ratio=ratio, ok=ok)
