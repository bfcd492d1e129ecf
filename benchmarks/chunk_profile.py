#!/usr/bin/env python
"""Per-stage SUBSTITUTION profile of the chunk-batched pipeline (TPU).

Where does the headline us/frame go?  Each arm runs the FULL pipeline
with exactly ONE stage replaced by a same-shape cheap stub; the arm's
slope delta against the unmodified pipeline prices that stage
IN-PIPELINE (the docs/BENCHMARKS.md ablation methodology — the tiled
histogram's 13 us/frame was measured this way).

Why not prefix ablation (this harness's original design): two failure
modes, both observed on the v5e relay in round 5 —
1. ISOLATED prefix graphs hit the pathological XLA layout choice
   CLAUDE.md documents for the vmapped pool (measured 5.2 s/call at
   chunk 128 for the stats prefix — 170x the full pipeline).
2. ``block_until_ready`` on a SMALL output through the relay returns at
   enqueue, not completion: a 50-call loop of the stats prefix "took"
   0.04 ms/call while the subsequent value fetch stalled 258 s.  Every
   arm here blocks on the large pcm output, which measures honestly
   (cross-checked: 6.08 ms/call at chunk 128 = bench.py's number).

The stub arm computes DIFFERENT (wrong) audio — it exists only to
price the stage; every stub preserves shapes/dtypes and keeps the
carry chain live (dedup defense).

Usage: python benchmarks/chunk_profile.py  (env: VAUDIO_BENCH_RES,
VAUDIO_BENCH_CHUNKS (default 16,128), VAUDIO_BENCH_ITERS,
VAUDIO_BENCH_SLOPE_REPS, VAUDIO_BENCH_JSON)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import _common
    _common.enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from vaudio.config import AuralizerConfig
    from vaudio.dsp import hann_window_norm, irfft_from_half, \
        sigmoid_normalize
    from vaudio.runtime.chunked import _batched_contraction
    from vaudio.runtime.step import default_params, init_carry
    from vaudio.synth import (SynthConstants, flatten_partials,
                              live_pan_from_params, partial_weights,
                              phase_advance)
    from vaudio.vision import frame_stats, hist_max_and_arg, \
        update_hues_from_stats

    res = os.environ.get("VAUDIO_BENCH_RES", "1080x1920")
    h, w = (int(x) for x in res.split("x"))
    chunks = [int(x) for x in
              os.environ.get("VAUDIO_BENCH_CHUNKS", "16,128").split(",")]
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "12"))
    n_reps = int(os.environ.get("VAUDIO_BENCH_SLOPE_REPS", "3"))
    _salt = (time.time_ns() ^ os.getpid()) % (1 << 20)
    cfg = AuralizerConfig(sample_rate=48000.0, channels=2)
    assert cfg.use_cumsum_phases, "profile mirrors the r5 default path"
    consts = SynthConstants.create(cfg)
    window = jnp.asarray(hann_window_norm(cfg.nfft))
    params = default_params(cfg)
    ch = cfg.channels
    hop = cfg.hop_size

    def pipeline(carry, frames, stub):
        """chunk_pipeline's default-config path (cumsum phases, XLA
        contraction, FFT irfft, no filters) with one stage stubbable.
        The FULL arm's slope cross-checks against bench.py's headline
        (they must agree within noise — both are the same graph)."""
        T = frames.shape[0]
        mixing = jnp.asarray(params["spectrum_mixing"], jnp.float32)
        two_pi = np.float32(2.0 * np.pi)

        if stub == "vision":
            # Price: mip pool + HSI + histogram + stencils INCLUDING
            # the 6.2 MB/frame HBM frame read.  The stub reads a 4x4
            # pixel slice (keeps a live frames dependence for the
            # dedup chain) and broadcasts same-shape stats.
            probe = frames[:, ::max(1, h // 4), ::max(1, w // 4), 0]
            probe = jnp.sum(probe.astype(jnp.int32), axis=(1, 2))  # (T,)
            hists = (probe[:, None, None] % 97 +
                     jnp.zeros((T, cfg.num_cells, 360), jnp.int32))
            grads_seq = (probe[:, None, None].astype(jnp.float32) * 1e-5
                         + jnp.zeros((T, cfg.num_cells, 4), jnp.float32))
        else:
            hists, grads_seq = jax.vmap(
                lambda f: frame_stats(f, cfg)[:2])(frames)
        max_vals, args = hist_max_and_arg(hists)

        if stub == "huescan":
            hues_seq = args.astype(jnp.int32) + carry.hues[None] % 7
            hues_last = hues_seq[-1]
        else:
            def hue_scan(h_prev, x):
                hues = update_hues_from_stats(x[0], x[1], h_prev,
                                              mixing, cfg)
                return hues, hues

            hues_last, hues_seq = jax.lax.scan(
                hue_scan, carry.hues, (max_vals, args), unroll=8)

        if stub == "phases":
            phases_seq = (jnp.mod(
                hues_seq[:, :, None].astype(jnp.float32) * 0.1
                + carry.phases[None], two_pi)
                .astype(jnp.float32))
        else:
            adv = jax.vmap(lambda hh: phase_advance(hh, cfg, consts))(
                hues_seq)
            prefix = jax.lax.associative_scan(
                lambda a, b: jnp.mod(a + b, two_pi),
                jnp.mod(adv, two_pi), axis=0)
            phases_seq = jnp.mod(carry.phases[None] + prefix,
                                 two_pi).astype(jnp.float32)
        phases_last = phases_seq[-1]

        pan = live_pan_from_params(cfg, params)

        def weights_one(hues, grads, phases):
            pf, w_re, w_im, inv_bw = partial_weights(hues, grads,
                                                     phases, cfg, consts)
            return flatten_partials(pf, w_re, w_im, inv_bw, cfg, pan=pan)

        if stub == "weights":
            NP = cfg.num_cells * cfg.phase_stride
            base = (hues_seq[:, :1].astype(jnp.float32)
                    + phases_seq[:, :1, 0])            # (T, 1)
            flat_pf = base + jnp.linspace(
                100.0, 8000.0, NP, dtype=jnp.float32)[None]
            flat_w = (base[..., None] * 1e-3 +
                      jnp.full((T, NP, 2 * ch), 1e-3, jnp.float32))
            flat_ibw = base * 0 + jnp.full((T, NP), 0.02, jnp.float32)
        else:
            flat_pf, flat_w, flat_ibw = jax.vmap(weights_one)(
                hues_seq, grads_seq, phases_seq)

        if stub == "contraction":
            F = cfg.num_bins
            cur = (jnp.sum(flat_w, axis=1)[:, None, :] * 1e-3
                   + flat_pf[:, :1, None] * 1e-6
                   + jnp.zeros((T, F, 2 * ch), jnp.float32))
        else:
            cur = _batched_contraction(flat_pf, flat_w, flat_ibw, cfg,
                                       consts, None)

        if ch == 2:
            cur = jnp.transpose(cur.reshape(T, -1, ch, 2), (0, 2, 1, 3))
        c = jnp.asarray(consts.static_cos)
        s = jnp.asarray(consts.static_sin)
        rot = jnp.stack([cur[..., 0] * c - cur[..., 1] * s,
                         cur[..., 0] * s + cur[..., 1] * c], axis=-1)

        if stub == "ema":
            spectra = rot * (1.0 - mixing) + carry.prev_spectrum[None] \
                * mixing
            prev_last = spectra[-1]
        else:
            def ema(prev, r):
                spec = (prev * mixing + r * (1.0 - mixing)).astype(
                    jnp.float32)
                return spec, spec

            prev_last, spectra = jax.lax.scan(ema, carry.prev_spectrum,
                                              rot, unroll=4)

        if stub == "irfft":
            # Same output shape from a cheap elementwise reshape of the
            # spectra (F = nfft/2 + 1 -> nfft by mirroring).
            re = spectra[..., 0]
            signals = jnp.concatenate([re, re, re],
                                      axis=-1)[..., :cfg.nfft]
        else:
            signals = jax.vmap(jax.vmap(
                lambda sp: irfft_from_half(sp[:, 0], sp[:, 1])))(spectra)

        if stub == "tail":
            pcm = jnp.swapaxes(signals[..., :hop], 1, 2)
            new_tail, running_max_last = carry.ola_tail, carry.running_max
        else:
            axes = tuple(range(1, signals.ndim))
            peaks = jnp.max(jnp.abs(signals), axis=axes) + \
                np.float32(1e-9)
            attack = jnp.asarray(params["attack"], jnp.float32)
            release = jnp.asarray(params["release"], jnp.float32)

            def agc_scan(rm, p):
                attacked = attack * p + (1.0 - attack) * rm
                released = release * p + (1.0 - release) * rm
                new_max = jnp.where(p > rm, attacked, released)
                return new_max.astype(jnp.float32), new_max

            running_max_last, new_maxes = jax.lax.scan(
                agc_scan, carry.running_max, peaks, unroll=8)
            norm_factor = jnp.clip(sigmoid_normalize(peaks, new_maxes),
                                   0.0, 1.0)
            norm_value = peaks / norm_factor
            scale = jnp.where(jnp.isfinite(1.0 / norm_value),
                              1.0 / norm_value, 0.0)
            bshape = (T,) + (1,) * (signals.ndim - 1)
            normalized = signals * scale.reshape(bshape)
            normalized = jnp.where(jnp.isfinite(normalized), normalized,
                                   0.0)
            fpeaks = jnp.max(jnp.abs(normalized), axis=axes)
            gains = 1.0 / (fpeaks + np.float32(1e-6))
            windowed = (normalized * gains.reshape(bshape)
                        * window).astype(jnp.float32)
            prev_tails = jnp.concatenate(
                [carry.ola_tail[None], windowed[:-1]], axis=0)
            pcm = (prev_tails[..., hop:] + windowed[..., :hop]
                   ).astype(jnp.float32)
            pcm = jnp.swapaxes(pcm, 1, 2)
            new_tail = windowed[-1]

        new_carry = carry._replace(hues=hues_last, phases=phases_last,
                                   prev_spectrum=prev_last,
                                   ola_tail=new_tail,
                                   running_max=running_max_last)
        return new_carry, pcm

    def measure(stub, label):
        step = jax.jit(lambda c, f: pipeline(c, f, stub))

        def bench_chunk(T, seed0):
            parts = [jax.random.bits(
                jax.random.PRNGKey(seed0 + 7919 * i),
                (min(8, T - i), h, w, 3), jnp.uint8)
                for i in range(0, T, 8)]
            frames = (jnp.concatenate(parts, axis=0)
                      if len(parts) > 1 else parts[0])
            del parts
            jax.block_until_ready(frames)
            carry = init_carry(cfg)
            t0 = time.perf_counter()
            carry, pcm = step(carry, frames)
            jax.block_until_ready(pcm)       # LARGE output: honest block
            dt = time.perf_counter() - t0
            if dt > 2.0:
                print(f"  (compile {label} chunk{T}: {dt:.1f}s)",
                      flush=True)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(iters):
                    carry, pcm = step(carry, frames)
                jax.block_until_ready(pcm)
                best = min(best,
                           (time.perf_counter() - t0) / iters * 1e3)
            return best

        slopes = []
        for rep in range(n_reps):
            t_small = bench_chunk(chunks[0], _salt + 7 + 13 * rep)
            t_big = bench_chunk(chunks[1], _salt + 100007 + 13 * rep)
            slopes.append((t_big - t_small)
                          / (chunks[1] - chunks[0]) * 1e3)
        us = statistics.median(slopes)
        print(f"{label:16s} {us:8.1f} us/frame   "
              f"(slopes {[round(s, 1) for s in slopes]})", flush=True)
        return us

    arms = ["full", "vision", "huescan", "phases", "weights",
            "contraction", "ema", "irfft", "tail"]
    measured = {}
    for arm in arms:
        measured[arm] = measure(None if arm == "full" else arm, arm)

    print("\nin-pipeline stage cost (full - stubbed):")
    stage_cost = {}
    for arm in arms[1:]:
        stage_cost[arm] = round(measured["full"] - measured[arm], 1)
        print(f"  {arm:16s} {stage_cost[arm]:7.1f} us/frame")
    resid = round(measured["full"] - sum(max(c, 0.0)
                                         for c in stage_cost.values()), 1)
    print(f"  {'(unattributed)':16s} {resid:7.1f} us/frame "
          f"(overlap between stages / dispatch gaps)")

    out = os.environ.get("VAUDIO_BENCH_JSON")
    if out:
        import json
        with open(out, "w") as f:
            json.dump({"resolution": res, "chunks": chunks,
                       "iters": iters, "reps": n_reps,
                       "method": "in-pipeline stub substitution, "
                                 "block-on-pcm",
                       "arm_us_per_frame": {k: round(v, 1)
                                            for k, v in measured.items()},
                       "stage_cost_us": stage_cost,
                       "unattributed_us": resid}, f, indent=1)
        print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
