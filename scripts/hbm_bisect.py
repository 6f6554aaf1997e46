"""Bisect the pallas_hbm remote-compile failure (VERDICT r3 task 1a).

Round 3 measured that the manual-output-DMA fused octave kernel
(`fused_octave(hbm_out=True)`) makes the axon remote-compile helper exit 1
(HTTP 500, no diagnostics).  This probe compiles kernel variants one per
subprocess (a compile crash must not poison the sweep) to localise which
ingredient the server rejects:

  control   pipelined kernel, tr=48 (known-good round-3 form)
  hbm48     manual output DMA at the known-good tile size
  hbm64/96/128  growing row tiles (the point of the manual DMA)

Usage (axon backend):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/hbm_bisect.py [variant]
With no argument, runs the sweep by re-invoking itself per variant.
"""

import json
import os
import subprocess
import sys
import time

VARIANTS = {
    "control": dict(tr=48, hbm_out=False),
    "hbm48": dict(tr=48, hbm_out=True),
    "hbm64": dict(tr=64, hbm_out=True),
    "hbm96": dict(tr=96, hbm_out=True),
    "hbm128": dict(tr=128, hbm_out=True),
    # batched forms: the batch rides the kernel grid (custom_vmap path);
    # cross-checked against per-image calls on the REAL chip (the round-3
    # ADVICE gap: that path was interpret-verified only)
    "batched4_hbm64": dict(tr=64, hbm_out=True, batch=4),
    "batched4_ctl": dict(tr=48, hbm_out=False, batch=4),
}


def run_variant(name: str) -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from cusift_tpu.config import SiftConfig
    from cusift_tpu.ops.pallas.octave import fused_octave

    kw = dict(VARIANTS[name])
    batch = kw.pop("batch", 0)
    cfg = SiftConfig()
    h, w = 960, 1280  # the 2x first octave — the dominant pyramid cost
    rng = np.random.default_rng(0)
    if batch:
        base = jnp.asarray(rng.random((batch, h, w), dtype=np.float32))
    else:
        base = jnp.asarray(rng.random((h, w), dtype=np.float32))

    t0 = time.perf_counter()
    samp, dog, score = fused_octave(base, cfg, h, w, **kw)
    # consume all three outputs so nothing is dead-code eliminated
    chk = float(jnp.sum(dog) + jnp.sum(samp) +
                jnp.sum(jnp.where(jnp.isfinite(score), score, 0.0)))
    compile_s = time.perf_counter() - t0
    if batch:
        # hardware parity: batched grid vs per-image calls, bit-identical
        s1, d1, c1 = fused_octave(base[0], cfg, h, w, **kw)
        same = (bool(jnp.all(samp[0] == s1)) and bool(jnp.all(dog[0] == d1))
                and bool(jnp.all(jnp.where(jnp.isfinite(score[0]),
                                           score[0], 0.0)
                                 == jnp.where(jnp.isfinite(c1), c1, 0.0))))
        print(json.dumps({"variant": name, "batch": batch,
                          "compile_s": round(compile_s, 1),
                          "parity_vs_single": same,
                          "checksum": round(chk, 1)}))
        return

    iters = 30
    for _ in range(3):
        samp, dog, score = fused_octave(base, cfg, h, w, **kw)
    float(jnp.sum(dog))
    t0 = time.perf_counter()
    for _ in range(iters):
        samp, dog, score = fused_octave(base, cfg, h, w, **kw)
    out = jnp.sum(dog) + jnp.sum(samp) + jnp.sum(
        jnp.where(jnp.isfinite(score), score, 0.0))
    float(out)  # in-order queue: one fetch completes all
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": name, "compile_s": round(compile_s, 1),
                      "octave_ms": round(dt * 1e3, 3),
                      "checksum": round(chk, 1)}))


def main() -> None:
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = os.environ.copy()
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    for name in VARIANTS:
        t0 = time.perf_counter()
        r = subprocess.run([sys.executable, __file__, name],
                           env=env, timeout=900,
                           capture_output=True, text=True)
        if r.returncode == 0:
            print(r.stdout.strip())
        else:
            tail = (r.stderr or "").strip().splitlines()[-6:]
            print(json.dumps({"variant": name, "rc": r.returncode,
                              "wall_s": round(time.perf_counter() - t0, 1),
                              "stderr_tail": tail}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
