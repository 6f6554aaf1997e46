"""Robust M-estimator kernels for the graph optimisers (IRLS form).

Shared by optim/posegraph.py (SE3) and optim/sim3graph.py (Sim3): both
apply the kernel to the per-edge residual NORM, reweight edges by the
sqrt IRLS weight at each linearisation, and evaluate step acceptance on
the true rho-cost so the LM loop optimises one consistent objective.

Kernel choice (PoseGraphConfig.robust_kernel):
* "huber"  — bounded influence, linear tail.  Safe default; an outlier
  still pulls with constant force, so a confidently-wrong loop edge
  (weight 2, rotation off by ~0.5 rad) biases the solution.
* "cauchy" — influence decays ~1/r; softer rejection.
* "tukey"  — redescending: influence is exactly ZERO beyond the scale,
  i.e. a gross outlier is dropped entirely once the inlier edges agree.
  Needs a sane initialisation (the odometry chain provides one); with a
  bad init it can also drop genuine constraints, hence not the default.
"""

from __future__ import annotations

import jax.numpy as jnp


def sqrt_weight(nrm: jnp.ndarray, delta: float, kernel: str) -> jnp.ndarray:
    """sqrt IRLS weight per edge given residual norms (delta > 0)."""
    x = nrm / delta
    if kernel == "huber":
        w = jnp.where(x > 1.0, 1.0 / jnp.maximum(x, 1e-12), 1.0)
    elif kernel == "cauchy":
        w = 1.0 / (1.0 + x * x)
    elif kernel == "tukey":
        w = jnp.where(x < 1.0, (1.0 - x * x) ** 2, 0.0)
    else:
        raise ValueError(f"unknown robust kernel {kernel!r}")
    return jnp.sqrt(w)


def rho(nrm: jnp.ndarray, delta: float, kernel: str) -> jnp.ndarray:
    """Per-edge robust cost given residual norms (delta > 0)."""
    x = nrm / delta
    if kernel == "huber":
        return jnp.where(x <= 1.0, 0.5 * nrm ** 2,
                         delta * (nrm - 0.5 * delta))
    if kernel == "cauchy":
        return 0.5 * delta * delta * jnp.log1p(x * x)
    if kernel == "tukey":
        c2 = delta * delta / 6.0
        return c2 * (1.0 - jnp.clip(1.0 - x * x, 0.0, 1.0) ** 3)
    raise ValueError(f"unknown robust kernel {kernel!r}")
