"""Small-scale incremental SfM (BASELINE configs[2]).

New surface relative to the reference: cuSIFT's extract/match/rigid pieces
composed into multi-view structure-from-motion: pairwise matching builds
feature *tracks* (union-find over match edges, host-side graph logic),
poses are chained from RGB-D rigid alignments, landmarks initialise from
depth back-projection, and the whole problem is polished by the TPU Schur
BA (optim/ba.py).  The BA problem is a static-shape BAProblem, so repeated
refinements reuse one compiled program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (BAConfig, MatchConfig, RansacConfig, SiftConfig)
from ..optim.ba import BAProblem, BAResult, bundle_adjust
from ..ops.match import match
from ..ops.ransac import find_rigid
from .slam import _extract_with_points


class SfmReconstruction(NamedTuple):
    poses_r: np.ndarray    # [F, 3, 3] world-to-camera
    poses_t: np.ndarray    # [F, 3]
    points: np.ndarray     # [L, 3] world landmarks
    ba: BAResult
    n_tracks: int
    n_obs: int


class _UnionFind:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[rb] = ra


def reconstruct_rgbd(images, depths, intr,
                     sift_cfg: SiftConfig = SiftConfig(),
                     match_cfg: MatchConfig = MatchConfig(),
                     ransac_cfg: RansacConfig = RansacConfig(),
                     ba_cfg: BAConfig = BAConfig(),
                     max_tracks: int = 4096, seed: int = 0) -> SfmReconstruction:
    """Incremental RGB-D SfM over a short sequence (10-frame TUM snippet).

    Pipeline: per-frame extract (jitted, one compile) -> consecutive-pair
    match + rigid RANSAC for initial poses -> track building (union-find)
    -> landmark init from the earliest observation's depth -> Schur BA.
    """
    f = len(images)
    intr_j = jnp.asarray(intr)
    key = jax.random.PRNGKey(seed)

    feats, pts3, pvalid = [], [], []
    for i in range(f):
        fe, pt, pv = _extract_with_points(jnp.asarray(images[i]),
                                          jnp.asarray(depths[i]), intr_j,
                                          sift_cfg)
        feats.append(fe)
        pts3.append(np.asarray(pt))
        pvalid.append(np.asarray(pv))

    n = sift_cfg.total_kpts
    uf = _UnionFind(f * n)
    slot = lambda fr, k: fr * n + k

    # chain poses from consecutive rigid alignments; collect match edges
    poses_r = [np.eye(3, dtype=np.float32)]
    poses_t = [np.zeros(3, np.float32)]
    pairs = [(i, i + 1) for i in range(f - 1)] + [(i, i + 2) for i in range(f - 2)]
    rel_cache = {}
    for (a, b) in pairs:
        key, k = jax.random.split(key)
        m = match(feats[a].desc, feats[a].valid, feats[b].desc,
                  feats[b].valid, match_cfg)
        idx = np.asarray(m.idx)
        ok = np.asarray(m.ok) & pvalid[a]
        pb = pts3[b][idx]
        ok = ok & (pb[:, 2] > 1e-6)
        rig = find_rigid(jnp.asarray(pts3[a]), jnp.asarray(pb),
                         jnp.asarray(ok), ransac_cfg, k)
        if not bool(rig.ok):
            continue
        inl = np.asarray(rig.inliers)
        rel_cache[(a, b)] = (np.asarray(rig.r), np.asarray(rig.t))
        for ka in np.nonzero(inl)[0]:
            uf.union(slot(a, int(ka)), slot(b, int(idx[ka])))

    for i in range(1, f):
        if (i - 1, i) in rel_cache:
            r_rel, t_rel = rel_cache[(i - 1, i)]
            # X_i = R X_{i-1} + t  =>  T_i<-w = (R, t) * T_{i-1}<-w
            ri = r_rel @ poses_r[i - 1]
            ti = r_rel @ poses_t[i - 1] + t_rel
        else:  # tracking gap: reuse previous pose
            ri, ti = poses_r[i - 1], poses_t[i - 1]
        poses_r.append(ri.astype(np.float32))
        poses_t.append(ti.astype(np.float32))
    poses_r = np.stack(poses_r)
    poses_t = np.stack(poses_t)

    # build tracks: root slot -> landmark id (only tracks seen >= 2 times)
    members: dict[int, list] = {}
    for fr in range(f):
        val = np.asarray(feats[fr].valid) & pvalid[fr]
        for k in np.nonzero(val)[0]:
            members.setdefault(uf.find(slot(fr, int(k))), []).append((fr, int(k)))
    tracks = [m for m in members.values()
              if len({fr for fr, _ in m}) >= 2][:max_tracks]

    # landmarks from the earliest observation's depth back-projection
    # (feature coordinates fetched once per frame — per-observation
    # np.asarray would pay a host round-trip each)
    xs_np = [np.asarray(fe.x) for fe in feats]
    ys_np = [np.asarray(fe.y) for fe in feats]
    cam_idx, pt_idx, uvs, ws = [], [], [], []
    points = []
    for li, obs in enumerate(tracks):
        obs = sorted(obs)
        fr0, k0 = obs[0]
        pc = pts3[fr0][k0]                       # camera-frame point
        r0, t0 = poses_r[fr0], poses_t[fr0]
        pw = r0.T @ (pc - t0)                    # to world
        points.append(pw)
        seen = set()
        for fr, k in obs:
            if fr in seen:                       # one observation per frame
                continue
            seen.add(fr)
            cam_idx.append(fr)
            pt_idx.append(li)
            uvs.append((xs_np[fr][k], ys_np[fr][k]))
            ws.append(1.0)

    n_obs = len(cam_idx)
    prob = BAProblem(
        poses_r=jnp.asarray(poses_r), poses_t=jnp.asarray(poses_t),
        points=jnp.asarray(np.array(points, np.float32)),
        intr=intr_j,
        cam_idx=jnp.asarray(np.array(cam_idx, np.int32)),
        pt_idx=jnp.asarray(np.array(pt_idx, np.int32)),
        uv=jnp.asarray(np.array(uvs, np.float32)),
        w=jnp.asarray(np.array(ws, np.float32)),
    )
    res = bundle_adjust(prob, ba_cfg)
    return SfmReconstruction(poses_r=np.asarray(res.poses_r),
                             poses_t=np.asarray(res.poses_t),
                             points=np.asarray(res.points),
                             ba=res, n_tracks=len(tracks), n_obs=n_obs)
