"""Pyramid/score micro-variants on the real chip (round-3 endgame).

The dense stages (pyramid 1.04 + score 0.62 + topk 0.21 ms/frame at
batch 16) sit at 11-17% of HBM light (docs/kernels.md); this probe
measures the three candidate attacks WITHOUT paying a full-pipeline
compile per variant:

  A. build_pyramid as-is (baseline)
  B. _conv1d_mxu with output-layout window stacking (no moveaxis relayout)
  C. direct-from-base batched-level blurs (2 einsums/octave, not 12)
  D. extrema_score on a bf16 DoG copy (halves score+topk bytes)

Run bare (axon): PYTHONPATH=/root/repo:/root/.axon_site python
scripts/pyr_probe.py
"""

import argparse
import json
import math
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--variants", default="A,B,C,D,A2,B2,A3,E,F,G")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax import lax
    from cusift_tpu.config import SiftConfig
    from cusift_tpu.data.synthetic import warped_pair
    from cusift_tpu.ops.detect import extrema_score
    from cusift_tpu.ops.gaussian import (_band_matrix, _reflect_pad,
                                         gaussian_taps)
    from cusift_tpu.ops.pyramid import initial_level, octave_levels

    cfg = SiftConfig(max_kpts=4096, max_kpts_per_octave=2048,
                     octave_budgets=(2048, 1024, 256, 96, 32), upscale=True)
    h, w = args.size
    bsz = args.batch
    frames = []
    for s in range((bsz + 1) // 2):
        a, b, _ = warped_pair(h, w, seed=s, blobs=800, detail=0.25,
                              detail_octaves=4)
        frames.extend([a, b])
    imgs = jnp.asarray(np.stack(frames[:bsz]))

    # ---- variant helpers ------------------------------------------------

    def conv_mxu_v2(img, taps, axis, block=128):
        """Output-layout window stacking: no post-einsum moveaxis."""
        r = (taps.shape[0] - 1) // 2
        ax = axis % img.ndim
        n = img.shape[ax]
        nb = -(-n // block)
        x = _reflect_pad(img, r, ax)
        if nb * block != n:
            pad = [(0, 0)] * img.ndim
            pad[ax] = (0, nb * block - n)
            x = jnp.pad(x, pad)
        t = jnp.asarray(_band_matrix(taps, block))              # [win, B]
        win = block + 2 * r
        sl_all = [slice(None)] * img.ndim
        windows = []
        for b in range(nb):
            sl = list(sl_all)
            sl[ax] = slice(b * block, b * block + win)
            windows.append(x[tuple(sl)])
        if ax == img.ndim - 1:
            wst = jnp.stack(windows, axis=img.ndim - 1)          # [..., nb, win]
            out = jnp.einsum("...nk,kc->...nc", wst, t,
                             precision=jax.lax.Precision.HIGH,
                             preferred_element_type=jnp.float32)
            out = out.reshape(out.shape[:-2] + (nb * block,))
        else:
            wst = jnp.stack(windows, axis=img.ndim - 2)          # [..., nb, win, W]
            out = jnp.einsum("...nkw,kc->...ncw", wst, t,
                             precision=jax.lax.Precision.HIGH,
                             preferred_element_type=jnp.float32)
            out = out.reshape(out.shape[:-3] + (nb * block,) + out.shape[-1:])
        sl = list(sl_all)
        sl[ax] = slice(0, n)
        return out[tuple(sl)]

    def blur_v2(img, sigma):
        taps = gaussian_taps(sigma)
        return conv_mxu_v2(conv_mxu_v2(img, taps, -2), taps, -1)

    def octave_levels_v2(base, cfg):
        levels = [base]
        for s in cfg.incremental_sigmas():
            levels.append(blur_v2(levels[-1], s))
        return levels

    def octave_levels_direct(base, cfg, block=128):
        """All S+3 levels straight from the base: the level batch rides the
        einsum batch dim, one rows-einsum + one cols-einsum per octave."""
        sigmas = []
        acc = 0.0
        for s in cfg.incremental_sigmas():
            acc = math.sqrt(acc * acc + s * s)
            sigmas.append(acc)
        rmax = max(1, int(math.ceil(4.0 * sigmas[-1])))
        tapset = [gaussian_taps(s, rmax) for s in sigmas]
        tmats = jnp.asarray(np.stack([_band_matrix(t, block)
                                      for t in tapset]))        # [L, win, B]
        n_lev = len(sigmas)

        def pass_(x, axis, batched_in):
            ax = axis % x.ndim
            n = x.shape[ax]
            nb = -(-n // block)
            xp = _reflect_pad(x, rmax, ax)
            if nb * block != n:
                pad = [(0, 0)] * x.ndim
                pad[ax] = (0, nb * block - n)
                xp = jnp.pad(xp, pad)
            win = block + 2 * rmax
            sl_all = [slice(None)] * x.ndim
            windows = []
            for b in range(nb):
                sl = list(sl_all)
                sl[ax] = slice(b * block, b * block + win)
                windows.append(xp[tuple(sl)])
            if ax == x.ndim - 1:
                wst = jnp.stack(windows, axis=x.ndim - 1)        # [(l,)..., nb, win]
                eq = ("l...nk,lkc->l...nc" if batched_in
                      else "...nk,lkc->l...nc")
                out = jnp.einsum(eq, wst, tmats,
                                 precision=jax.lax.Precision.HIGH,
                                 preferred_element_type=jnp.float32)
                out = out.reshape(out.shape[:-2] + (nb * block,))
                lead = 0
            else:
                wst = jnp.stack(windows, axis=x.ndim - 2)        # [(l,)..., nb, win, W]
                eq = ("l...nkw,lkc->l...ncw" if batched_in
                      else "...nkw,lkc->l...ncw")
                out = jnp.einsum(eq, wst, tmats,
                                 precision=jax.lax.Precision.HIGH,
                                 preferred_element_type=jnp.float32)
                out = out.reshape(out.shape[:-3] + (nb * block,)
                                  + out.shape[-1:])
            sl = [slice(None)] * out.ndim
            sl[ax + (0 if batched_in else 1)] = slice(0, n)
            return out[tuple(sl)]

        blurred = pass_(pass_(base, -2, False), -1, True)        # [L, H, W]
        return jnp.concatenate([base[None], blurred], 0)         # [L+1, H, W]

    def pyr(one_levels):
        def fn(img):
            s_ = cfg.scales_per_octave
            n_oct = cfg.num_octaves_for(*img.shape)
            base = initial_level(img, cfg)
            acc = 0.0
            for _ in range(n_oct):
                if one_levels is octave_levels_direct:
                    gauss = one_levels(base, cfg)
                else:
                    gauss = jnp.stack(one_levels(base, cfg))
                dog = gauss[1:] - gauss[:-1]
                acc += jnp.sum(gauss[1:s_ + 1]) + jnp.sum(dog)
                base = gauss[s_][::2, ::2]
            return acc
        return fn

    def pyr_score(one_levels, score_dtype, consume_all=False):
        """consume_all sums samp+dog too — the fair baseline for the fused
        kernel variants, which must write all three outputs to HBM
        (XLA may elide samp/dog stores when only score is consumed)."""
        def fn(img):
            s_ = cfg.scales_per_octave
            n_oct = cfg.num_octaves_for(*img.shape)
            base = initial_level(img, cfg)
            acc = 0.0
            for _ in range(n_oct):
                if one_levels is octave_levels_direct:
                    gauss = one_levels(base, cfg)
                else:
                    gauss = jnp.stack(one_levels(base, cfg))
                dog = gauss[1:] - gauss[:-1]
                score = extrema_score(dog.astype(score_dtype), cfg)
                acc += jnp.sum(jnp.where(jnp.isfinite(score), score,
                                         0.0).astype(jnp.float32))
                if consume_all:
                    acc += jnp.sum(gauss[1:s_ + 1]) + jnp.sum(dog)
                base = gauss[s_][::2, ::2]
            return acc
        return fn

    def pyr_fused(tr, hbm):
        """Pyramid + score through the fused Pallas octave kernel
        (E: pipelined outputs at tr=48; F/G: manual HBM output DMA at
        tr=96/128 — the VMEM headroom freed by dropping double-buffered
        output blocks, docs/kernels.md).  Mirrors production's small-
        octave fallback (models/sift.py min(h,w)>=64)."""
        from cusift_tpu.ops.pallas.octave import fused_octave
        interp = jax.default_backend() != "tpu"

        def fn(img):
            s_ = cfg.scales_per_octave
            n_oct = cfg.num_octaves_for(*img.shape)
            base = initial_level(img, cfg)
            acc = 0.0
            for _ in range(n_oct):
                hh, ww = base.shape
                if min(hh, ww) >= 64:
                    samp, dog, score = fused_octave(base, cfg, hh, ww,
                                                    tr=tr, hbm_out=hbm,
                                                    interpret=interp)
                else:
                    gauss = jnp.stack(octave_levels(base, cfg))
                    dog = gauss[1:] - gauss[:-1]
                    samp = gauss[1:s_ + 1]
                    score = extrema_score(dog, cfg)
                acc += (jnp.sum(samp) + jnp.sum(dog)
                        + jnp.sum(jnp.where(jnp.isfinite(score), score, 0.0)))
                base = samp[s_ - 1][::2, ::2]
            return acc
        return fn

    variants = {
        "A": pyr(octave_levels),
        "B": pyr(octave_levels_v2),
        "C": pyr(octave_levels_direct),
        "A2": pyr_score(octave_levels, jnp.float32),
        "B2": pyr_score(octave_levels_v2, jnp.float32),
        "D": pyr_score(octave_levels, jnp.bfloat16),
        "A3": pyr_score(octave_levels, jnp.float32, consume_all=True),
        "E": pyr_fused(48, False),
        "F": pyr_fused(96, True),
        "G": pyr_fused(128, True),
    }

    def timed(fn, x):
        t0 = time.perf_counter()
        float(fn(x))
        compile_s = time.perf_counter() - t0
        float(fn(x))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x)
        float(out)
        return (time.perf_counter() - t0) / args.iters, compile_s

    # numeric parity spot-check on one image (CPU-precision tolerances
    # don't apply — we compare variants against the production chain)
    ref = octave_levels(initial_level(imgs[0], cfg), cfg)
    for name, lv_fn in (("B", octave_levels_v2), ("C", octave_levels_direct)):
        if name not in args.variants.split(","):
            continue
        got = lv_fn(initial_level(imgs[0], cfg), cfg)
        got = got if name == "C" else jnp.stack(got)
        err = float(jnp.max(jnp.abs(got - jnp.stack(ref))))
        print(json.dumps({"variant": name, "max_abs_err_vs_A": err}),
              flush=True)

    import jax
    for name in args.variants.split(","):
        fn = jax.jit(lambda ims, f=variants[name]: jnp.sum(jax.vmap(f)(ims)))
        try:
            dt, cs = timed(fn, imgs)
        except Exception as e:  # e.g. VMEM overflow at tr=128 — keep going
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        print(json.dumps({"variant": name,
                          "ms_total": round(dt * 1e3, 2),
                          "ms_per_frame": round(dt / bsz * 1e3, 3),
                          "compile_s": round(cs, 1)}), flush=True)


if __name__ == "__main__":
    main()
