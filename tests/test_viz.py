"""Smoke tests for the visualisation overlays (reference demo parity)."""

import numpy as np
import jax.numpy as jnp

from cusift_tpu.config import SiftConfig, MatchConfig
from cusift_tpu.models.sift import extract
from cusift_tpu.ops.match import match
from cusift_tpu.utils.viz import draw_keypoints, draw_matches


def test_draw_overlays(tmp_path, test_image):
    cfg = SiftConfig(max_kpts=128, max_kpts_per_octave=64, num_octaves=3)
    f = extract(jnp.asarray(test_image), cfg)
    out = draw_keypoints(test_image, f, path=str(tmp_path / "kp.png"))
    assert out.shape == test_image.shape + (3,)
    assert (tmp_path / "kp.png").exists()

    m = match(f.desc, f.valid, f.desc, f.valid, MatchConfig(ratio_thresh=2.0))
    out2 = draw_matches(test_image, f, test_image, f, m,
                        path=str(tmp_path / "m.png"))
    assert out2.shape[0] == test_image.shape[0]
    assert out2.shape[1] == 2 * test_image.shape[1]
    assert (tmp_path / "m.png").exists()
