"""Closed-form 3x3 linear algebra (det / inverse / solve).

`jnp.linalg.inv` lowers through a general LU factorisation — a poor fit for
huge batches of tiny matrices on TPU (compile-time and runtime overhead).
Cofactor expansion is ~30 fused VPU flops per matrix and vectorises over any
leading batch dims.  Used by the DoG quadratic refinement (ops/detect.py)
and the landmark-block inverses in BA (optim/ba.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from cusift_tpu.utils.precision import f32_matmuls


def det3(m: jnp.ndarray) -> jnp.ndarray:
    """Determinant of [..., 3, 3]."""
    return (m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]))


def adjugate3(m: jnp.ndarray) -> jnp.ndarray:
    """Adjugate (transposed cofactor matrix) of [..., 3, 3]."""
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    return jnp.stack([
        jnp.stack([c00, c01, c02], -1),
        jnp.stack([c10, c11, c12], -1),
        jnp.stack([c20, c21, c22], -1),
    ], -2)


@f32_matmuls
def inv3(m: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Inverse of [..., 3, 3]; singular inputs return adj/eps-guarded det."""
    d = det3(m)[..., None, None]
    d = jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))
    return adjugate3(m) / d


@f32_matmuls
def solve3(m: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12):
    """Solve m x = b for [..., 3, 3] x [..., 3]; returns (x, ok)."""
    d = det3(m)
    ok = jnp.abs(d) > eps
    dd = jnp.where(ok, d, 1.0)
    x = (adjugate3(m) @ b[..., None])[..., 0] / dd[..., None]
    return jnp.where(ok[..., None], x, 0.0), ok


def solve_spd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for small SPD A [..., n, n] via unrolled Cholesky.

    Statically unrolled over n (intended n <= ~10): every step is an
    elementwise op over the batch, so a vmapped 1024-hypothesis RANSAC
    solve stays pure VPU math — `jnp.linalg.solve`'s batched LU costs
    ~7 ms for 1024 8x8 systems on v5e.  Callers must regularise A
    (ridge) so positive-definiteness holds; degenerate systems produce
    finite garbage that downstream scoring rejects.
    """
    n = a.shape[-1]
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                l[i][j] = s / l[j][j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x, -1)
