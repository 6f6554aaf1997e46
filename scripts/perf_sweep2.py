"""Round-3 sweep 2: clean reruns of the sweep-1 winners + refinements.

MUST run with an otherwise-idle host: the machine has ONE CPU core and
concurrent Python work inflates dispatch gaps between queued programs
(sweep-1's trim/b8 rows were polluted this way).
"""

import json
import sys
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


def scene(batch):
    frames = []
    for s in range((batch + 1) // 2):
        a, b, _ = warped_pair(H, W, seed=s, blobs=800, detail=0.25,
                              detail_octaves=4)
        frames.extend([a, b])
    return jnp.asarray(np.stack(frames[:batch]))


def run(tag, cfg, batch, iters=24):
    imgs = scene(batch)

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
    only = sys.argv[1:] or None
    base = SiftConfig(max_kpts=4096, max_kpts_per_octave=2048, upscale=True)
    trim = replace(base, octave_budgets=(2048, 1024, 256, 96, 32))
    ds110 = replace(trim, desc_slot_factor=1.10)
    k5 = SiftConfig(max_kpts=5120, max_kpts_per_octave=2560, upscale=True,
                    octave_budgets=(2560, 1280, 320, 96, 32))
    k6 = SiftConfig(max_kpts=6144, max_kpts_per_octave=3072, upscale=True,
                    octave_budgets=(3072, 1536, 384, 96, 32))
    variants = {
        "ds125-b8": (trim, 8),
        "k5120-b8": (k5, 8),
        "k6144-b8": (k6, 8),
        "k6144-b16": (k6, 16),
    }
    for tag, (cfg, batch) in variants.items():
        if only and tag not in only:
            continue
        run(tag, cfg, batch)


if __name__ == "__main__":
    main()
