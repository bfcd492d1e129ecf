#!/usr/bin/env python
"""Per-stage ablation profile of the chunk-batched pipeline (TPU).

Where does the headline ms/frame go?  Each variant runs a PREFIX of
chunk_pipeline's stages (vision stats -> hue/phase scan -> weights ->
contraction -> rotate/EMA -> irfft -> AGC/OLA); the slope between two
chunk sizes gives its marginal per-frame cost, and consecutive
differences isolate each stage.  Carries chain between calls (tunnel
dedup defense), frames are device-resident uint8 like bench.py.

Usage: python benchmarks/chunk_profile.py  (env: VAUDIO_BENCH_RES,
VAUDIO_BENCH_CHUNKS, VAUDIO_BENCH_ITERS as in bench.py)
"""

import os
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
    from vaudio.dsp import hann_window_norm, irfft_from_half
    from vaudio.runtime.chunked import _batched_contraction, chunk_pipeline
    from vaudio.runtime.step import default_params, init_carry
    from vaudio.synth import (SynthConstants, flatten_partials,
                              live_pan_from_params, partial_weights,
                              phase_accumulate)
    from vaudio.vision import (frame_stats, hist_max_and_arg,
                               update_hues_from_stats)

    res = os.environ.get("VAUDIO_BENCH_RES", "1080x1920")
    h, w = (int(x) for x in res.split("x"))
    chunks = [int(x) for x in
              os.environ.get("VAUDIO_BENCH_CHUNKS", "16,64").split(",")]
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "8"))
    _salt = (time.time_ns() ^ os.getpid()) % (1 << 20)  # defeat the
    # relay's CROSS-RUN dedup (identical seeds -> identical chains)
    cfg = AuralizerConfig(sample_rate=48000.0, channels=2)
    consts = SynthConstants.create(cfg)
    window = jnp.asarray(hann_window_norm(cfg.nfft))
    params = default_params(cfg)

    def prefix_fn(stage):
        """Return f(acc, carry, frames) running chunk stages up to
        `stage`; acc chains across calls so successive dispatches are
        never identical (tunnel dedup defense)."""
        mixing = jnp.float32(params["spectrum_mixing"])

        def fn(acc, carry, frames):
            T = frames.shape[0]
            hists, grads_seq = jax.vmap(
                lambda f: frame_stats(f, cfg)[:2])(frames)
            if stage == "A1_stats":
                return acc + jnp.sum(hists.astype(jnp.float32)) + \
                    jnp.sum(grads_seq), carry
            max_vals, args = hist_max_and_arg(hists)

            if cfg.use_cumsum_phases:
                # Mirror the round-5 production pass A (runtime.chunked):
                # serial scan for the hue EMA only, phases as a batched
                # mod-2pi prefix sum — profiled as separate stages.
                from vaudio.synth import phase_advance

                def hue_scan(h_prev, x):
                    hues = update_hues_from_stats(x[0], x[1], h_prev,
                                                  mixing, cfg)
                    return hues, hues

                hl, hues_seq = jax.lax.scan(hue_scan, carry.hues,
                                            (max_vals, args), unroll=8)
                if stage == "A2_scan":
                    return acc + jnp.sum(hues_seq.astype(jnp.float32)), \
                        carry._replace(hues=hl)
                two_pi = np.float32(2.0 * np.pi)
                adv = jax.vmap(lambda hh: phase_advance(hh, cfg, consts))(
                    hues_seq)
                prefix = jax.lax.associative_scan(
                    lambda a, b: jnp.mod(a + b, two_pi),
                    jnp.mod(adv, two_pi), axis=0)
                phases_seq = jnp.mod(carry.phases[None] + prefix,
                                     two_pi).astype(jnp.float32)
                carry = carry._replace(hues=hl, phases=phases_seq[-1])
                if stage == "A3_phases":
                    return acc + jnp.sum(phases_seq), carry
            else:
                def pass_a(c, x):
                    hues_prev, phases_prev = c
                    hues = update_hues_from_stats(x[0], x[1], hues_prev,
                                                  mixing, cfg)
                    phases = phase_accumulate(phases_prev, hues, cfg,
                                              consts)
                    return (hues, phases), (hues, phases)

                (hl, pl), (hues_seq, phases_seq) = jax.lax.scan(
                    pass_a, (carry.hues, carry.phases), (max_vals, args),
                    unroll=8)
                carry = carry._replace(hues=hl, phases=pl) if hasattr(
                    carry, "_replace") else carry
                if stage in ("A2_scan", "A3_phases"):
                    return acc + jnp.sum(hues_seq.astype(jnp.float32)) + \
                        jnp.sum(phases_seq), carry
            pan = live_pan_from_params(cfg, params)

            def weights_one(hues, grads, phases):
                pf, w_re, w_im, ibw = partial_weights(hues, grads, phases,
                                                      cfg, consts)
                return flatten_partials(pf, w_re, w_im, ibw, cfg, pan=pan)

            flat_pf, flat_w, flat_ibw = jax.vmap(weights_one)(
                hues_seq, grads_seq, phases_seq)
            if stage == "B1_weights":
                return acc + jnp.sum(flat_pf) + jnp.sum(flat_w), carry
            cur = _batched_contraction(flat_pf, flat_w, flat_ibw, cfg,
                                       consts, None)
            if stage == "B2_contraction":
                return acc + jnp.sum(cur), carry
            ch = cfg.channels
            if ch == 2:
                cur = jnp.transpose(cur.reshape(T, -1, ch, 2), (0, 2, 1, 3))
            c = jnp.asarray(consts.static_cos)
            s = jnp.asarray(consts.static_sin)
            rot = jnp.stack([cur[..., 0] * c - cur[..., 1] * s,
                             cur[..., 0] * s + cur[..., 1] * c], axis=-1)

            def ema(prev, r):
                spec = (prev * mixing + r * (1.0 - mixing)).astype(
                    jnp.float32)
                return spec, spec

            prev_last, spectra = jax.lax.scan(ema, carry.prev_spectrum, rot)
            carry = carry._replace(prev_spectrum=prev_last)
            if stage == "C1_rot_ema":
                return acc + jnp.sum(spectra), carry
            signals = jax.vmap(jax.vmap(
                lambda sp: irfft_from_half(sp[:, 0], sp[:, 1])))(spectra)
            if stage == "C2_irfft":
                return acc + jnp.sum(signals), carry
            raise ValueError(stage)

        return fn

    def measure(make_step, label):
        def bench_chunk(T, seed0):
            frames = jax.random.bits(jax.random.PRNGKey(seed0),
                                     (T, h, w, 3), jnp.uint8)
            jax.block_until_ready(frames)
            step = jax.jit(make_step)
            acc, carry = jnp.float32(0.0), init_carry(cfg)
            acc, carry = step(acc, carry, frames)
            jax.block_until_ready(acc)
            t0 = time.perf_counter()
            for i in range(iters):
                acc, carry = step(acc, carry, frames)
            jax.block_until_ready(acc)
            return (time.perf_counter() - t0) / iters * 1e3

        t_small = bench_chunk(chunks[0], _salt + 7)
        t_big = bench_chunk(chunks[1], _salt + 1007)
        us = (t_big - t_small) / (chunks[1] - chunks[0]) * 1e3
        print(f"{label:18s} {us:8.1f} us/frame   "
              f"(chunk{chunks[0]}={t_small:.1f}ms chunk{chunks[1]}="
              f"{t_big:.1f}ms)", flush=True)
        return us

    stages = ["A1_stats", "A2_scan", "A3_phases", "B1_weights",
              "B2_contraction", "C1_rot_ema", "C2_irfft"]
    cum = {}
    for st in stages:
        cum[st] = measure(prefix_fn(st), st)

    def full(acc, carry, frames):
        nc, out = chunk_pipeline(carry, frames, params, cfg, consts,
                                 window)
        return acc + jnp.sum(out["pcm"]), nc

    cum["FULL"] = measure(full, "FULL")

    print("\nper-stage marginal (consecutive differences):")
    prev = 0.0
    for st in stages + ["FULL"]:
        print(f"  {st:18s} +{cum[st] - prev:7.1f} us/frame")
        prev = cum[st]


if __name__ == "__main__":
    main()
