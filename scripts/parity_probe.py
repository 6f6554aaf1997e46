"""Decompose the cv2.SIFT parity gap (VERDICT r3 task 6; SURVEY §7 P2).

The parity row has sat at 84% keypoint overlap against the >= 85% exit
bar for two rounds, with the residual ATTRIBUTED to approx_max_k's 0.95
recall but never isolated.  This probe runs the parity config ablations
on the CPU backend and prints the overlap per variant:

  base      the measured parity config (upscale, approx top-k)
  exact     approx_topk=False — isolates the approx_max_k recall share
  bigbudget exact top-k + 2x per-octave budgets — isolates budget binding
  wideborder border=2 (cv2 uses the descriptor support, not a fixed 5 px
            margin; our border gate may reject edge keypoints cv2 keeps)
  all       every relaxation together — the residual after this is
            genuine algorithmic difference (threshold semantics, refine
            behaviour), i.e. the irreducible envelope gap

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
     PYTHONPATH=/root/repo:/root/repo/tests python scripts/parity_probe.py
"""

import json

import numpy as np

from cusift_tpu.config import SiftConfig, replace
from cusift_tpu.data.synthetic import textured_image
from cusift_tpu.models.sift import extract

from oracle import cosine, cv2_sift_oracle, greedy_keypoint_match

BASE = SiftConfig(max_kpts=4096, max_kpts_per_octave=2048, upscale=True)


def overlap_for(cfg: SiftConfig, img) -> dict:
    f = extract(img, cfg)
    v = np.asarray(f.valid)
    xy = np.stack([np.asarray(f.x)[v], np.asarray(f.y)[v]], -1)
    sg = np.asarray(f.sigma)[v]
    dsc = np.asarray(f.desc)[v]
    oxy, osig, _, odesc = cv2_sift_oracle(img)
    pairs = greedy_keypoint_match(oxy, xy, osig, sg)
    i, j = np.array(pairs).T
    cs = cosine(odesc[i], dsc[j])
    return dict(ours=int(v.sum()), cv2=len(oxy),
                overlap=round(len(pairs) / max(len(oxy), 1), 4),
                desc_cos_med=round(float(np.median(cs)), 4))


def main():
    img = textured_image(480, 640, seed=0, blobs=800, detail=0.25,
                         detail_octaves=4)
    variants = {
        "base": BASE,
        "exact": replace(BASE, approx_topk=False),
        "bigbudget": replace(BASE, approx_topk=False, max_kpts=8192,
                             max_kpts_per_octave=4096),
        "wideborder": replace(BASE, border=2),
        "all": replace(BASE, approx_topk=False, max_kpts=8192,
                       max_kpts_per_octave=4096, border=2),
    }
    for name, cfg in variants.items():
        print(name, json.dumps(overlap_for(cfg, img)), flush=True)


if __name__ == "__main__":
    main()
