"""Pose-graph optimisation (SE(3) graph SLAM backend).

New surface relative to the reference (SURVEY.md §0): the SLAM backend
optimises keyframe poses against relative-pose constraints (odometry + loop
closures).  Residual per edge (i, j):

    r_e = log( T_meas^-1 · T_i · T_j^-1 )      for world-to-cam T

Matrix-free Gauss-Newton: J v and J^T u come from `jax.jvp` / `jax.vjp` of
the whole residual map (no sparse matrices), so the normal equations
(J^T J + lambda I) dx = -J^T r are solved by CG with only O(E) work per
iteration — the TPU-friendly analog of a sparse Cholesky backend.  The
trajectory-partitioned distributed variant (SURVEY.md §2.4 D5) reuses the
same residual map inside shard_map.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from cusift_tpu.utils.precision import f32_matmuls

from . import robust

from ..config import PoseGraphConfig
from .lie import compose, inverse, se3_exp, se3_log


class PoseGraph(NamedTuple):
    """Static-capacity pose graph; edge weight 0 disables an edge."""

    poses_r: jnp.ndarray   # [N, 3, 3] world-to-camera
    poses_t: jnp.ndarray   # [N, 3]
    edge_i: jnp.ndarray    # [E] int32
    edge_j: jnp.ndarray    # [E] int32
    meas_r: jnp.ndarray    # [E, 3, 3] measured T_i * T_j^-1
    meas_t: jnp.ndarray    # [E, 3]
    weight: jnp.ndarray    # [E] (sqrt-information scalar)


class PoseGraphResult(NamedTuple):
    poses_r: jnp.ndarray
    poses_t: jnp.ndarray
    cost: jnp.ndarray
    initial_cost: jnp.ndarray


def _residuals(xi: jnp.ndarray, g: PoseGraph) -> jnp.ndarray:
    """[E, 6] weighted residuals at retraction xi [N, 6] about g's poses."""
    dr, dt = se3_exp(xi)
    r = dr @ g.poses_r
    t = (dr @ g.poses_t[..., None])[..., 0] + dt
    ri, ti = r[g.edge_i], t[g.edge_i]
    rj, tj = r[g.edge_j], t[g.edge_j]
    # relative transform T_i * T_j^-1
    rji, tji = inverse(rj, tj)
    rrel, trel = compose(ri, ti, rji, tji)
    # error vs measurement
    rmi, tmi = inverse(g.meas_r, g.meas_t)
    rerr, terr = compose(rmi, tmi, rrel, trel)
    return se3_log(rerr, terr) * g.weight[:, None]


@f32_matmuls
def cost(g: PoseGraph, axis_name=None) -> jnp.ndarray:
    """Total weighted cost; with `axis_name`, g's edges are the local
    shard and the scalar is psum-reduced (SURVEY.md §2.4 D5)."""
    r = _residuals(jnp.zeros((g.poses_r.shape[0], 6)), g)
    c = 0.5 * jnp.sum(r ** 2)
    return jax.lax.psum(c, axis_name) if axis_name is not None else c


def _edge_norms(g: PoseGraph) -> jnp.ndarray:
    """UNWEIGHTED per-edge residual norms at the current poses.

    The stored residuals carry the sqrt-information weight; dividing it
    out keeps the robust kernel's scale in residual units, so a weight-2
    loop edge (confidence) is not pushed toward the outlier regime at
    half the residual of an odometry edge.
    """
    r = _residuals(jnp.zeros((g.poses_r.shape[0], 6)), g)
    return jnp.linalg.norm(r, axis=-1) / jnp.maximum(g.weight, 1e-12)


def _robust_cost(g: PoseGraph, delta: float, kernel: str,
                 axis_name=None) -> jnp.ndarray:
    """Robust cost on per-edge residual norms (delta <= 0: plain L2)."""
    if delta <= 0:
        return cost(g, axis_name)
    # information-weighted robust cost: sum_e w_e^2 rho(||r_e||_unweighted)
    # (reduces exactly to cost() when delta <= 0)
    c = jnp.sum(g.weight ** 2 * robust.rho(_edge_norms(g), delta, kernel))
    return jax.lax.psum(c, axis_name) if axis_name is not None else c


def _cg(matvec, b, iters: int, tol: float):
    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = jnp.sum(r * r)
    bn = jnp.maximum(jnp.sqrt(jnp.sum(b * b)), 1e-30)

    def body(carry, _):
        x, r, p, rs = carry
        ap = matvec(p)
        denom = jnp.sum(p * ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rs / denom, 0.0)
        x2 = x + alpha * p
        r2 = r - alpha * ap
        rs2 = jnp.sum(r2 * r2)
        beta = jnp.where(rs > 1e-30, rs2 / rs, 0.0)
        p2 = r2 + beta * p
        return (x2, r2, p2, rs2), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rs), None, length=iters)
    return x


@f32_matmuls
def lm_loop(g: PoseGraph, cfg: PoseGraphConfig,
            axis_name=None) -> PoseGraphResult:
    """LM on the pose graph; gauge fixed by freezing pose 0 (optional).

    Runs standalone (axis_name=None) or inside shard_map with poses
    replicated and edges sharded over `axis_name` — the trajectory-
    partitioned distributed pose graph of SURVEY.md §2.4 D5: each device
    owns a contiguous keyframe chunk's edges, cross-chunk constraint
    contributions (the [N, 6] J^T r / J^T J x vectors) ride one psum per
    application, and every device runs the identical replicated CG, so
    the distributed result is bit-for-bit the single-device math.
    """
    n = g.poses_r.shape[0]
    mask = jnp.ones((n, 6))
    if cfg.fix_first_pose:
        mask = mask.at[0].set(0.0)

    def psum_(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    delta = cfg.huber_delta

    def body(carry, _):
        g, lam, cur = carry
        zero = jnp.zeros((n, 6))
        if delta > 0:
            # IRLS: sqrt-Huber edge reweighting at the current poses;
            # acceptance evaluates the true robust cost (one objective)
            w_rob = robust.sqrt_weight(_edge_norms(g), delta,
                                       cfg.robust_kernel)
            g_it = g._replace(weight=g.weight * w_rob)
        else:
            g_it = g
        res0, vjp_fn = jax.vjp(lambda xi: _residuals(xi, g_it), zero)

        def normal_mv(x):
            x = x * mask
            _, jx = jax.jvp(lambda xi: _residuals(xi, g_it), (zero,), (x,))
            jtjx = psum_(vjp_fn(jx)[0])
            return (jtjx + lam * x) * mask

        b = -psum_(vjp_fn(res0)[0]) * mask
        dx = _cg(normal_mv, b, cfg.cg_iters, cfg.cg_tol) * mask
        dr, dt = se3_exp(dx)
        r2 = dr @ g.poses_r
        t2 = (dr @ g.poses_t[..., None])[..., 0] + dt
        cand = g._replace(poses_r=r2, poses_t=t2)
        cnew = _robust_cost(cand, delta, cfg.robust_kernel,
                             axis_name)
        accept = jnp.isfinite(cnew) & (cnew < cur)
        g2 = jax.tree.map(lambda a, b: jnp.where(accept, b, a), g, cand)
        lam2 = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e6)
        return (g2, lam2, jnp.where(accept, cnew, cur)), None

    c0 = _robust_cost(g, delta, cfg.robust_kernel, axis_name)
    init = (g, jnp.asarray(cfg.init_damping, jnp.float32), c0)
    (gf, _, cf), _ = jax.lax.scan(body, init, None, length=cfg.max_iters)
    return PoseGraphResult(poses_r=gf.poses_r, poses_t=gf.poses_t,
                           cost=cf, initial_cost=c0)


@f32_matmuls
@partial(jax.jit, static_argnames=("cfg",))
def optimize(g: PoseGraph, cfg: PoseGraphConfig = PoseGraphConfig()) -> PoseGraphResult:
    """Single-device pose-graph optimisation (jitted LM loop)."""
    return lm_loop(g, cfg)
