"""Sliding-window local bundle adjustment for the SLAM backend.

BASELINE north star: "extract + match + BA at real-time frames/s" — the
round-1 SLAM backend only ran pose-graph optimisation on loop closure;
this module bundle-adjusts the landmarks seen by the last W keyframes
every time a keyframe is inserted (the standard local-BA backend step).

TPU shape: the whole thing — cross-keyframe data association (descriptor
matching on the MXU), landmark initialisation from the newest keyframe's
RGB-D backprojections, and the LM/Schur/PCG solve (`optim/ba.py`) — is
ONE jitted static-shape program over the fixed window [W, N, ...] slices
of the keyframe ring.  One dispatch + one packed pose fetch per keyframe
insert; nothing recompiles as the map grows (window indices are device
data, window size is static).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import BAConfig, MatchConfig
from ..ops.geometry import project
from ..ops.match import match
from ..optim.ba import BAProblem, lm_loop


def build_window_problem_union(kf_desc, kf_valid, kf_pts, poses_r, poses_t,
                               intr, win_mask,
                               match_cfg: MatchConfig = MatchConfig(),
                               gate_px: float = 25.0) -> BAProblem:
    """All-window landmark union (standard local BA anchoring).

    The newest-anchored form below discards observations of landmarks not
    re-seen in the newest keyframe (VERDICT round-2 weak #4).  Here every
    keyframe's backprojections are landmark candidates, deduplicated
    through the pairwise match graph: slot (k, s) joins the landmark of
    the EARLIEST window keyframe it matches (with one-step owner
    indirection, which is fully transitive because owners are finalised
    in ascending-k order), otherwise it founds its own landmark.

    Static shapes: landmarks = all W*N slots (dead ones weight 0),
    observations = the same [W, N] grid as the newest-anchored form —
    each slot contributes exactly ONE observation (of its owner), so the
    observation count and Schur cost match the cheap form; only the
    landmark array grows W-fold ([W*N, 3] — trivial).  W(W-1)/2 extra
    [N, N] MXU matches pay for the dedup.
    """
    w, n = kf_valid.shape
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    valid = kf_valid & (kf_pts[..., 2] > 1e-6) & (win_mask[:, None] > 0)

    # world position of every slot under the current pose estimate
    pw = jax.vmap(lambda pts, r, t: (pts - t) @ r)(
        kf_pts, poses_r, poses_t)                       # [W, N, 3]
    pw_flat = pw.reshape(w * n, 3)

    owner = (jnp.arange(w, dtype=jnp.int32)[:, None] * n
             + jnp.arange(n, dtype=jnp.int32)[None, :])  # [W, N] self-own
    owner_rows = [owner[0]]
    for k in range(1, w):
        own_k = owner[k]
        assigned = jnp.zeros(n, bool)
        for j in range(k):
            m = match(kf_desc[k], valid[k], kf_desc[j], valid[j], match_cfg)
            okj = m.ok & valid[k] & valid[j][m.idx] & ~assigned
            # one-step indirection: row j's owners are already final
            own_k = jnp.where(okj, owner_rows[j][m.idx], own_k)
            assigned = assigned | okj
        owner_rows.append(own_k)
    owner = jnp.stack(owner_rows)                        # [W, N]

    uv = jax.vmap(lambda pts: project(pts, fx, fy, cx, cy))(kf_pts)
    own_w = pw_flat[owner]                               # [W, N, 3]
    own_c = jax.vmap(lambda pts, r, t: pts @ r.T + t)(
        own_w, poses_r, poses_t)                         # [W, N, 3]
    pred = jax.vmap(lambda pts: project(pts, fx, fy, cx, cy))(own_c)
    owner_valid = valid.reshape(-1)[owner]
    # near-plane gate: a landmark at/behind the observing camera (z ~ 0)
    # can still project near the principal point and pass the pixel
    # gate, but its Jacobian entries ~fx/z overflow f32 in J^T J and
    # NaN the window (optim/ba.py:_mask_dead_obs rationale)
    ok = (valid & owner_valid & (own_c[..., 2] > 1e-2)
          & (jnp.sum((uv - pred) ** 2, -1) < gate_px ** 2))

    cam_idx = jnp.repeat(jnp.arange(w, dtype=jnp.int32), n)
    return BAProblem(
        poses_r=poses_r, poses_t=poses_t, points=pw_flat, intr=intr,
        cam_idx=cam_idx, pt_idx=owner.reshape(-1), uv=uv.reshape(-1, 2),
        w=ok.reshape(-1).astype(jnp.float32))


def build_window_problem(kf_desc, kf_valid, kf_pts, poses_r, poses_t,
                         intr, win_mask,
                         match_cfg: MatchConfig = MatchConfig(),
                         gate_px: float = 25.0) -> BAProblem:
    """Data association + landmark init for a keyframe window -> BAProblem.

    The shared front half of local BA: usable by the jitted single-device
    `window_ba` below AND by callers that hand the problem to the
    distributed Schur solver (`parallel/dist_ba.py`) — e.g. the KITTI
    odometry chain sharding its map over a mesh (BASELINE configs[5]).
    Landmarks anchor to the NEWEST keyframe (cheapest form; see
    `build_window_problem_union` for the all-window union).
    """
    w, n = kf_valid.shape
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]

    # landmarks: the newest keyframe's valid backprojections, in world
    anchor = w - 1
    pts_j = kf_pts[anchor]                                   # [N, 3]
    valid_j = kf_valid[anchor] & (pts_j[:, 2] > 1e-6)
    r_j, t_j = poses_r[anchor], poses_t[anchor]
    points_w = (pts_j - t_j) @ r_j                           # R^T (X_c - t)

    # data association: newest -> every window keyframe (the anchor row
    # matches itself exactly; kept — it contributes its own observation)
    def assoc(desc_k, valid_k, pts_k, r_k, t_k):
        m = match(kf_desc[anchor], valid_j, desc_k, valid_k, match_cfg)
        pk = pts_k[m.idx]                                    # [N, 3]
        uv = project(pk, fx, fy, cx, cy)
        ok = m.ok & valid_j & (pk[:, 2] > 1e-6)
        # projection gate: a descriptor match whose pixel position is far
        # from the landmark's predicted projection under the CURRENT pose
        # estimate is a misassociation — Huber blunts these but enough of
        # them still set the cost floor and stall LM
        pc = points_w @ r_k.T + t_k
        pred = project(pc, fx, fy, cx, cy)
        # near-plane gate: see build_window_problem_union
        ok = ok & (pc[:, 2] > 1e-2) \
            & (jnp.sum((uv - pred) ** 2, -1) < gate_px ** 2)
        return uv, ok

    uv, ok = jax.vmap(assoc)(kf_desc, kf_valid, kf_pts,
                             poses_r, poses_t)               # [W, N, 2/..]
    ok = ok & (win_mask[:, None] > 0)

    cam_idx = jnp.repeat(jnp.arange(w, dtype=jnp.int32), n)
    pt_idx = jnp.tile(jnp.arange(n, dtype=jnp.int32), w)
    return BAProblem(
        poses_r=poses_r, poses_t=poses_t, points=points_w, intr=intr,
        cam_idx=cam_idx, pt_idx=pt_idx, uv=uv.reshape(-1, 2),
        w=ok.reshape(-1).astype(jnp.float32))


@partial(jax.jit, static_argnames=("match_cfg", "ba_cfg", "anchor"))
def window_ba(kf_desc, kf_valid, kf_pts, poses_r, poses_t, intr,
              win_mask,
              match_cfg: MatchConfig = MatchConfig(),
              ba_cfg: BAConfig = BAConfig(max_iters=5, cg_iters=15,
                                          num_fixed_poses=2,
                                          huber_delta=4.0),
              gate_px: float = 25.0, anchor: str = "newest"):
    """Local BA over a keyframe window; newest keyframe anchors landmarks.

    kf_desc [W, N, 128], kf_valid [W, N], kf_pts [W, N, 3] (camera-frame
    backprojections), poses_r/t [W] world-to-camera, win_mask [W] (0 pads
    a window larger than the current map — padded cameras contribute no
    observations and keep their input pose).  Window order is
    oldest-first; the newest keyframe is index W-1, the two oldest real
    keyframes are the gauge anchors.

    Returns (poses_r [W,3,3], poses_t [W,3], initial_cost, final_cost).
    `anchor` picks the landmark scheme: "newest" (cheapest, default) or
    "union" (all-window dedup via the match graph).
    """
    build = (build_window_problem_union if anchor == "union"
             else build_window_problem)
    prob = build(kf_desc, kf_valid, kf_pts, poses_r,
                 poses_t, intr, win_mask, match_cfg, gate_px)
    res = lm_loop(prob, ba_cfg)
    # padded cameras keep their (meaningless) input pose; real cameras
    # take the optimised one
    keep = win_mask[:, None, None] > 0
    r_out = jnp.where(keep, res.poses_r, poses_r)
    t_out = jnp.where(keep[..., 0], res.poses_t, poses_t)
    return r_out, t_out, res.initial_cost, res.cost
