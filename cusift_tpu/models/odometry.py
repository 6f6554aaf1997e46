"""Monocular visual odometry (KITTI frontend, BASELINE configs[4]).

New surface relative to the reference: cuSIFT's geometry stack is
depth-assisted (homography / RGB-D rigid, SURVEY.md C13-C15), so KITTI's
depth-free grayscale sequences need this module: per-pair essential-matrix
RANSAC (`ops/essential.py`), cheirality-checked decomposition, midpoint
triangulation, and scale-consistent chaining of the per-pair unit
translations via triangulated-depth ratios on features tracked across
three frames (the classic monocular scale-propagation scheme).

TPU shape: ONE jitted program per pair — extract + match + RANSAC +
triangulation + scale estimate — with a single packed fetch per frame
(same host-interface discipline as models/slam.py; the per-frame scalars
ride one small array through the tunnel, docs/kernels.md "Host
interface").  The absolute scale of the whole trajectory is unobservable
from a monocular camera; outputs are metrically consistent up to that one
global factor (evaluation aligns it, data/evaluation.py ``with_scale``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MatchConfig, RansacConfig, SiftConfig
from ..ops.essential import find_essential, triangulate_midpoint
from ..ops.match import match
from .sift import SiftFeatures, extract


class PairOdometry(NamedTuple):
    """Device-side result of one odometry pair step."""

    feats: SiftFeatures       # frame B features (carried to the next pair)
    r_rel: jnp.ndarray        # [3, 3] with x_b = R x_a + t
    t_rel: jnp.ndarray        # [3] globally-scaled translation
    scale: jnp.ndarray        # scalar applied to the unit translation
    depth: jnp.ndarray        # [N] triangulated depth per frame-B slot
    pts: jnp.ndarray          # [N, 3] frame-B camera-frame points
                              # (triangulated, global scale; z=0 unknown)
    num_inliers: jnp.ndarray  # int32
    scale_common: jnp.ndarray  # int32: tracked points used for the scale
    ok: jnp.ndarray           # bool: essential RANSAC succeeded


def _masked_median(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of vals[mask]; +inf-padded sort + middle index (static shape)."""
    n = vals.shape[0]
    cnt = jnp.sum(mask.astype(jnp.int32))
    s = jnp.sort(jnp.where(mask, vals, jnp.inf))
    mid = jnp.clip((cnt - 1) // 2, 0, n - 1)
    return s[mid]


@partial(jax.jit, static_argnames=("sift_cfg", "match_cfg", "ransac_cfg"))
def pair_step(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
              xy_a: jnp.ndarray, depth_a: jnp.ndarray,
              img_b: jnp.ndarray, intr: jnp.ndarray,
              prev_scale: jnp.ndarray,
              sift_cfg: SiftConfig = SiftConfig(),
              match_cfg: MatchConfig = MatchConfig(),
              ransac_cfg: RansacConfig = RansacConfig(),
              key: jax.Array | None = None,
              content=None) -> PairOdometry:
    """One monocular odometry step: previous features + new image.

    depth_a: [N] globally-scaled triangulated depth per frame-A slot from
    the previous pair (0 = unknown; all zeros on the first pair, which
    then anchors the global scale at |t| = 1).  `content`: optional
    traced [2] (h, w) of the true image content when img_b is padded to
    a canonical shape tier.
    """
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    fb = extract(img_b, sift_cfg)
    if content is not None:
        from .twoview import mask_to_content
        fb = mask_to_content(fb, content, sift_cfg.border)
    m = match(desc_a, valid_a, fb.desc, fb.valid, match_cfg)

    xa = jnp.stack([(xy_a[:, 0] - cx) / fx, (xy_a[:, 1] - cy) / fy], -1)
    xb_all = jnp.stack([(fb.x - cx) / fx, (fb.y - cy) / fy], -1)
    xb = xb_all[m.idx]

    res = find_essential(xa, xb, m.ok, ransac_cfg, key)
    _, za, zb = triangulate_midpoint(res.r, res.t, xa, xb)
    good = res.inliers & (za > 1e-6) & (zb > 1e-6)

    # scale chaining: features seen in the previous pair carry a global
    # depth in frame A; the fresh triangulation measures the same depth in
    # |t|=1 units, so the ratio's robust median is this pair's scale
    have_prev = good & (depth_a > 1e-6)
    ratio = depth_a / jnp.maximum(za, 1e-6)
    n_common = jnp.sum(have_prev.astype(jnp.int32))
    med = _masked_median(ratio, have_prev)
    scale_ok = (n_common >= 8) & jnp.isfinite(med) & (med > 1e-6)
    scale = jnp.where(scale_ok, med, prev_scale)

    # per-slot depth of frame B (global units) for the NEXT pair's chain;
    # scatter through the match index, last writer wins on collisions
    # (collisions only happen via cross-matched duplicates; harmless)
    depth_b = jnp.zeros(fb.valid.shape[0], jnp.float32)
    depth_b = depth_b.at[m.idx].set(jnp.where(good, zb * scale, 0.0),
                                    mode="drop")
    # camera-frame 3D points of frame B from the triangulated depths —
    # the monocular stand-in for RGB-D backprojections; feeds the same
    # windowed BA the SLAM backend uses (models/local_ba.py)
    pts_b = jnp.concatenate([xb_all, jnp.ones_like(xb_all[:, :1])], -1) \
        * depth_b[:, None]

    return PairOdometry(feats=fb, r_rel=res.r, t_rel=res.t * scale,
                        scale=scale, depth=depth_b, pts=pts_b,
                        num_inliers=res.num_inliers,
                        scale_common=n_common, ok=res.ok)


class MonoVO:
    """Host-side monocular odometry loop over an image iterable.

    Composes world-to-camera poses T_k = T_rel,k ∘ T_{k-1}; on RANSAC
    failure the previous relative motion is repeated (constant-velocity
    fallback) so one bad pair cannot break the chain.
    """

    def __init__(self, intr: np.ndarray,
                 sift_cfg: SiftConfig = SiftConfig(),
                 match_cfg: MatchConfig = MatchConfig(),
                 ransac_cfg: RansacConfig = RansacConfig(),
                 ba_window: int = 0, ba_every: int = 2,
                 pad_to_tier: bool = False):
        self.intr = jnp.asarray(np.asarray(intr, np.float32))
        # canonical shape tiers: arbitrary camera resolutions share one
        # compiled program per tier (utils/image.py); features landing in
        # the zero-pad apron are masked out after extraction
        self.pad_to_tier = pad_to_tier
        self._content = None
        self.sift_cfg = sift_cfg
        self.match_cfg = match_cfg
        self.ransac_cfg = ransac_cfg
        self.ba_window = ba_window       # frames; 0 disables windowed BA
        self.ba_every = max(1, ba_every)
        self.poses_r = [np.eye(3, dtype=np.float32)]
        self.poses_t = [np.zeros(3, np.float32)]
        self.stats = []
        self._feats = None
        self._depth = None
        self._scale = jnp.float32(1.0)
        self._last_rel = (np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32))
        self._key = jax.random.PRNGKey(ransac_cfg.seed)
        # device-side ring of (desc, valid, pts) for windowed BA
        self._ring: list[tuple] = []

    def _extract(self, dimg):
        f = extract(dimg, self.sift_cfg)
        if self._content is not None:
            from .twoview import mask_to_content
            f = mask_to_content(f, jnp.asarray(self._content),
                                self.sift_cfg.border)
        return f

    def process(self, img: np.ndarray) -> dict | None:
        """Feed the next grayscale frame ([H, W] float in [0, 1])."""
        img = np.asarray(img, np.float32)
        if self.pad_to_tier:
            from ..utils.image import pad_to_tier as _pad
            img, self._content = _pad(img)
        dimg = jnp.asarray(img)
        if self._feats is None:
            self._feats = self._extract(dimg)
            n = self._feats.valid.shape[0]
            self._depth = jnp.zeros(n, jnp.float32)
            if self.ba_window:
                self._ring.append((self._feats.desc, self._feats.valid,
                                   jnp.zeros((n, 3), jnp.float32)))
            return None
        self._key, sub = jax.random.split(self._key)
        fa = self._feats
        content = (jnp.asarray(self._content)
                   if self._content is not None else None)
        out = pair_step(fa.desc, fa.valid, jnp.stack([fa.x, fa.y], -1),
                        self._depth, dimg, self.intr, self._scale,
                        self.sift_cfg, self.match_cfg, self.ransac_cfg, sub,
                        content)
        # one packed fetch for every per-frame scalar (host-link discipline)
        packed = np.array(jnp.concatenate([
            out.r_rel.reshape(-1), out.t_rel,
            jnp.stack([out.scale, out.num_inliers.astype(jnp.float32),
                       out.scale_common.astype(jnp.float32),
                       out.ok.astype(jnp.float32)])]))
        r_rel = packed[:9].reshape(3, 3)
        t_rel = packed[9:12]
        scale, n_inl, n_common, ok = packed[12:16]
        if ok < 0.5:
            r_rel, t_rel = self._last_rel    # constant-velocity fallback
        else:
            self._last_rel = (r_rel, t_rel)
            self._scale = jnp.float32(scale)
        r_prev, t_prev = self.poses_r[-1], self.poses_t[-1]
        self.poses_r.append((r_rel @ r_prev).astype(np.float32))
        self.poses_t.append((r_rel @ t_prev + t_rel).astype(np.float32))
        self._feats = out.feats
        # depths triangulated from a REJECTED essential model are garbage:
        # zero the carried chain so the scale re-anchors from the next
        # successful pair instead of chaining through the bad model, and
        # keep the frame's BA observations masked out for the same reason
        self._depth = (out.depth if ok > 0.5
                       else jnp.zeros_like(out.depth))
        if self.ba_window:
            valid_pts = (out.feats.valid & (out.depth > 1e-6)
                         & jnp.bool_(ok > 0.5))
            self._ring.append((out.feats.desc, valid_pts, out.pts))
            self._ring = self._ring[-self.ba_window:]
            if (len(self._ring) == self.ba_window
                    and (len(self.poses_r) - 1) % self.ba_every == 0):
                self._window_ba()
        stat = dict(inliers=int(n_inl), scale=float(scale),
                    scale_common=int(n_common), ok=bool(ok > 0.5))
        self.stats.append(stat)
        return stat

    def _window_ba(self):
        """Bundle-adjust the last W frames over triangulated landmarks.

        The exact windowed-BA step the RGB-D SLAM backend runs
        (models/local_ba.py) with the monocular triangulated depths
        standing in for RGB-D backprojections; the two oldest window
        poses anchor the (scale-inclusive) gauge, so the chained
        monocular scale is preserved rather than re-ambiguated.
        """
        from .local_ba import window_ba
        from ..config import BAConfig

        w = self.ba_window
        kd = jnp.stack([r[0] for r in self._ring])
        kv = jnp.stack([r[1] for r in self._ring])
        kp = jnp.stack([r[2] for r in self._ring])
        idxs = np.arange(len(self.poses_r) - w, len(self.poses_r))
        r0 = jnp.asarray(np.stack([self.poses_r[i] for i in idxs]))
        t0 = jnp.asarray(np.stack([self.poses_t[i] for i in idxs]))
        r, t, c0, c1 = window_ba(
            kd, kv, kp, r0, t0, self.intr, jnp.ones(w, jnp.float32),
            self.match_cfg,
            BAConfig(max_iters=4, cg_iters=12, num_fixed_poses=2,
                     huber_delta=4.0))
        packed = np.array(jnp.concatenate([r.reshape(-1), t.reshape(-1)]))
        rs = packed[:w * 9].reshape(w, 3, 3)
        ts = packed[w * 9:].reshape(w, 3)
        for k, i in enumerate(idxs):
            self.poses_r[i] = rs[k].astype(np.float32)
            self.poses_t[i] = ts[k].astype(np.float32)
        self._last_ba = (float(c0), float(c1))

    def run(self, frames, max_frames: int | None = None) -> tuple:
        for i, img in enumerate(frames):
            if max_frames is not None and i >= max_frames:
                break
            self.process(img)
        return np.stack(self.poses_r), np.stack(self.poses_t)
