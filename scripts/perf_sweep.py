"""Real-TPU throughput sweep over bench configurations (round-3 task 1).

Measures the batched extract+match pipeline (bench.py's headline shape)
under several (scene, budgets, batch) variants and prints one line per
variant: ms/frame, valid slots, kpts/s.  Timing per CLAUDE.md: queue N
dispatches, fetch one scalar.
"""

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from cusift_tpu.config import MatchConfig, SiftConfig, replace
from cusift_tpu.data.synthetic import warped_pair
from cusift_tpu.models.sift import extract_batch
from cusift_tpu.ops.match import match

H, W = 480, 640
match_cfg = MatchConfig()


def scene(batch, detail_octaves):
    frames = []
    for s in range((batch + 1) // 2):
        a, b, _ = warped_pair(H, W, seed=s, blobs=800, detail=0.25,
                              detail_octaves=detail_octaves)
        frames.extend([a, b])
    return jnp.asarray(np.stack(frames[:batch]))


def run(tag, cfg, batch, detail_octaves, iters=20):
    imgs = scene(batch, detail_octaves)

    @jax.jit
    def bstep(x):
        f = extract_batch(x, cfg)
        ms = [match(f.desc[i], f.valid[i], f.desc[i + 1], f.valid[i + 1],
                    match_cfg).ok.sum()
              for i in range(batch - 1)]
        return f.valid.sum(), jnp.stack(ms)

    t0 = time.perf_counter()
    total_kpts = int(bstep(imgs)[0])
    compile_s = time.perf_counter() - t0
    int(bstep(imgs)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = bstep(imgs)
    int(out[0])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "tag": tag, "batch": batch, "compile_s": round(compile_s, 1),
        "frame_ms": round(dt / batch * 1e3, 3), "valid_slots": total_kpts,
        "kpts_per_s": round(total_kpts / dt, 0),
        "vs_baseline": round(total_kpts / dt / 8e5, 3),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    base = SiftConfig(max_kpts=4096, max_kpts_per_octave=2048, upscale=True)
    trim = replace(base, octave_budgets=(2048, 1024, 256, 96, 32))
    variants = {
        "old-scene": (base, 8, 1),
        "ms-scene": (base, 8, 4),
        "trim": (trim, 8, 4),
        "trim-ds110": (replace(trim, desc_slot_factor=1.10), 8, 4),
        "trim-b16": (trim, 16, 4),
        "trim-b32": (trim, 32, 4),
    }
    for tag, (cfg, batch, d_oct) in variants.items():
        if args.only and tag not in args.only:
            continue
        run(tag, cfg, batch, d_oct, iters=args.iters)


if __name__ == "__main__":
    main()
