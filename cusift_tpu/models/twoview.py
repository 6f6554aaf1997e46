"""Two-view pipelines: extract + match + homography / rigid alignment.

Reference analog: the demo ``mainSift.cpp`` flow (SURVEY.md C16, §3.5) —
extract both images, match, fit a homography — plus cuSIFT's RGB-D rigid
alignment entry point.  Each pipeline is a single jitted program
(BASELINE configs[1]).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatchConfig, RansacConfig, SiftConfig
from ..ops.geometry import backproject
from ..ops.match import Matches, match
from ..ops.ransac import HomographyResult, RigidResult, find_homography, find_rigid
from .sift import SiftFeatures, extract


class TwoViewResult(NamedTuple):
    feats_a: SiftFeatures
    feats_b: SiftFeatures
    matches: Matches
    homography: HomographyResult


class RigidPairResult(NamedTuple):
    feats_a: SiftFeatures
    feats_b: SiftFeatures
    matches: Matches
    rigid: RigidResult


def _correspondences(fa: SiftFeatures, fb: SiftFeatures, m: Matches):
    """Matched point pairs [N, 2] in image coords + validity."""
    pa = jnp.stack([fa.x, fa.y], -1)
    pb = jnp.stack([fb.x[m.idx], fb.y[m.idx]], -1)
    return pa, pb, m.ok


def mask_to_content(f: SiftFeatures, content, border: int) -> SiftFeatures:
    """Invalidate features outside a [h, w] content region.

    Supports the canonical shape tiers (`utils/image.py:pad_to_tier`): an
    image zero-padded up to a tier produces spurious strong responses
    along the content/pad boundary; this masks them out.  `content` is a
    TRACED [2] array, so every image size within a tier shares one
    compiled program.
    """
    if content is None:
        return f
    h = content[0].astype(jnp.float32)
    w = content[1].astype(jnp.float32)
    b = float(border)
    valid = (f.valid & (f.x >= b) & (f.x < w - b)
             & (f.y >= b) & (f.y < h - b))
    return f._replace(valid=valid)


@partial(jax.jit, static_argnames=("sift_cfg", "match_cfg", "ransac_cfg"))
def match_pair(img_a: jnp.ndarray, img_b: jnp.ndarray,
               sift_cfg: SiftConfig = SiftConfig(),
               match_cfg: MatchConfig = MatchConfig(),
               ransac_cfg: RansacConfig = RansacConfig(),
               key: jax.Array | None = None,
               content_a=None, content_b=None) -> TwoViewResult:
    """Full grayscale pair pipeline -> features, matches, homography.

    content_a/content_b: optional (h, w) of the true image content when
    the inputs are tier-padded (see `mask_to_content`).
    """
    if content_a is not None:
        content_a = jnp.asarray(content_a)
    if content_b is not None:
        content_b = jnp.asarray(content_b)
    fa = mask_to_content(extract(img_a, sift_cfg), content_a,
                         sift_cfg.border)
    fb = mask_to_content(extract(img_b, sift_cfg), content_b,
                         sift_cfg.border)
    m = match(fa.desc, fa.valid, fb.desc, fb.valid, match_cfg)
    pa, pb, ok = _correspondences(fa, fb, m)
    h = find_homography(pa, pb, ok, ransac_cfg, key)
    return TwoViewResult(feats_a=fa, feats_b=fb, matches=m, homography=h)


@partial(jax.jit, static_argnames=("sift_cfg", "match_cfg", "ransac_cfg"))
def align_rgbd_pair(img_a: jnp.ndarray, depth_a: jnp.ndarray,
                    img_b: jnp.ndarray, depth_b: jnp.ndarray,
                    intrinsics: jnp.ndarray,
                    sift_cfg: SiftConfig = SiftConfig(),
                    match_cfg: MatchConfig = MatchConfig(),
                    ransac_cfg: RansacConfig = RansacConfig(),
                    key: jax.Array | None = None) -> RigidPairResult:
    """RGB-D pair -> rigid transform taking camera-A points to camera-B.

    intrinsics: [4] = (fx, fy, cx, cy).  Matches with invalid depth
    (<= 0) are masked out before RANSAC (cuSIFT C15 behaviour).
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    fa = extract(img_a, sift_cfg)
    fb = extract(img_b, sift_cfg)
    m = match(fa.desc, fa.valid, fb.desc, fb.valid, match_cfg)

    def depth_at(depth, xs, ys):
        xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, depth.shape[1] - 1)
        yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, depth.shape[0] - 1)
        return depth[yi, xi]

    da = depth_at(depth_a, fa.x, fa.y)
    db = depth_at(depth_b, fb.x[m.idx], fb.y[m.idx])
    pa3 = backproject(jnp.stack([fa.x, fa.y], -1), da, fx, fy, cx, cy)
    pb3 = backproject(jnp.stack([fb.x[m.idx], fb.y[m.idx]], -1), db, fx, fy, cx, cy)
    ok = m.ok & (da > 1e-6) & (db > 1e-6)
    rig = find_rigid(pa3, pb3, ok, ransac_cfg, key)
    return RigidPairResult(feats_a=fa, feats_b=fb, matches=m, rigid=rig)
