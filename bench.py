"""Headline benchmark: SIFT extract + match throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric (BASELINE.md): keypoints/s/chip over the full extract+match pipeline
on a 640x480 pair.  vs_baseline is measured against the CudaSift-class GPU
figure reconstructed in BASELINE.md (~4k keypoints in ~5 ms on a GTX1080 =
8e5 keypoints/s; [KNOWLEDGE-LOW] order-of-magnitude calibration — the
reference's own published numbers are unavailable, see BASELINE.md).
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINE_KPTS_PER_S = 8.0e5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--max-kpts", type=int, default=2048)
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace into ./trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cusift_tpu.config import MatchConfig, SiftConfig
    from cusift_tpu.models.sift import extract
    from cusift_tpu.ops.match import match
    from cusift_tpu.data.synthetic import textured_image, warped_pair

    h, w = args.size
    img_a, img_b, _ = warped_pair(h, w, seed=1, blobs=2500)
    sift_cfg = SiftConfig(max_kpts=args.max_kpts,
                          max_kpts_per_octave=args.max_kpts // 2)
    match_cfg = MatchConfig()

    @jax.jit
    def step(a, b):
        fa = extract(a, sift_cfg)
        fb = extract(b, sift_cfg)
        m = match(fa.desc, fa.valid, fb.desc, fb.valid, match_cfg)
        return fa.count, fb.count, m.ok.sum()

    da = jnp.asarray(img_a)
    db = jnp.asarray(img_b)

    t0 = time.perf_counter()
    out = step(da, db)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    n_a, n_b, n_m = (int(x) for x in out)

    for _ in range(args.warmup):
        jax.block_until_ready(step(da, db))

    if args.profile:
        jax.profiler.start_trace("./trace")

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(step(da, db))
        times.append(time.perf_counter() - t0)

    if args.profile:
        jax.profiler.stop_trace()

    best = min(times)
    med = float(np.median(times))
    kpts_per_pair = n_a + n_b
    value = kpts_per_pair / med
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "compile_s": round(compile_s, 2),
        "pair_ms": round(med * 1e3, 3),
        "pair_ms_best": round(best * 1e3, 3),
        "kpts_a": n_a, "kpts_b": n_b, "matches": n_m,
        "frames_per_s": round(2.0 / med, 1),
    }), file=sys.stderr)
    print(json.dumps({
        "metric": "sift_extract_match_keypoints_per_s_per_chip",
        "value": round(value, 1),
        "unit": "keypoints/s",
        "vs_baseline": round(value / BASELINE_KPTS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
