#!/usr/bin/env python
"""In-pipeline substitution cost of the chunk pipeline's THREE serial
scans (pass-A hue/phase, pass-C1 spectrum EMA, AGC scalar scan).

Method: the full stereo 1080p chunk pipeline vs a variant with all
three scans replaced by same-shape BATCHED stubs (pass-A -> hues from
argmax directly + phase cumsum-free fake; EMA -> elementwise mix;
AGC -> batched running-max fake).  The slope delta prices exactly the
serialization the scans impose — stage substitution, same methodology
as the docs/BENCHMARKS.md ablation.  Arms interleave in ONE process
with per-arm seed salts (relay dedup defense, CLAUDE.md).

NOTE: the stub arm computes DIFFERENT (wrong) audio — it exists only
to price the serial structure.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import _common
    _common.enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vaudio.config import AuralizerConfig
    from vaudio.dsp import hann_window_norm, irfft_from_half, \
        sigmoid_normalize
    from vaudio.runtime.chunked import _batched_contraction, chunk_pipeline
    from vaudio.runtime.step import default_params, init_carry
    from vaudio.synth import (SynthConstants, flatten_partials,
                              live_pan_from_params, partial_weights)
    from vaudio.vision import frame_stats, hist_max_and_arg

    res = os.environ.get("VAUDIO_BENCH_RES", "1080x1920")
    h, w = (int(x) for x in res.split("x"))
    chunks = [int(x) for x in
              os.environ.get("VAUDIO_BENCH_CHUNKS", "16,128").split(",")]
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "12"))
    n_reps = int(os.environ.get("VAUDIO_BENCH_SLOPE_REPS", "3"))
    salt = (time.time_ns() ^ os.getpid()) % (1 << 20)

    cfg = AuralizerConfig(sample_rate=48000.0, channels=2)
    consts = SynthConstants.create(cfg)
    window = jnp.asarray(hann_window_norm(cfg.nfft))
    params = default_params(cfg)
    ch = cfg.channels

    def noscan_pipeline(carry, frames):
        """chunk_pipeline with every serial scan replaced by a batched
        stub of the same shapes/dtypes (structure-pricing only)."""
        T = frames.shape[0]
        mixing = jnp.asarray(params["spectrum_mixing"], jnp.float32)

        def stats_one(frame):
            hist, grads, _ = frame_stats(frame, cfg)
            return hist, grads

        hists, grads_seq = jax.vmap(stats_one)(frames)
        max_vals, args = hist_max_and_arg(hists)

        # STUB pass A: hues straight from argmax (no EMA recurrence),
        # phases a per-frame function (no accumulation).
        hues_seq = args.astype(jnp.int32)
        phases_seq = (jnp.arange(T, dtype=jnp.float32)[:, None, None]
                      * jnp.ones((cfg.num_cells, cfg.phase_stride),
                                 jnp.float32) * 0.1)
        pan = live_pan_from_params(cfg, params)

        def weights_one(hues, grads, phases):
            pf, w_re, w_im, inv_bw = partial_weights(hues, grads, phases,
                                                     cfg, consts)
            return flatten_partials(pf, w_re, w_im, inv_bw, cfg, pan=pan)

        flat_pf, flat_w, flat_ibw = jax.vmap(weights_one)(
            hues_seq, grads_seq, phases_seq)
        cur = _batched_contraction(flat_pf, flat_w, flat_ibw, cfg, consts,
                                   None)
        if ch == 2:
            cur = jnp.transpose(cur.reshape(T, -1, ch, 2), (0, 2, 1, 3))
        c = jnp.asarray(consts.static_cos)
        s = jnp.asarray(consts.static_sin)
        rot = jnp.stack([cur[..., 0] * c - cur[..., 1] * s,
                         cur[..., 0] * s + cur[..., 1] * c], axis=-1)

        # STUB pass C1: elementwise mix with the carry (no recurrence).
        spectra = (carry.prev_spectrum[None] * mixing
                   + rot * (1.0 - mixing)).astype(jnp.float32)

        irfft_one = lambda sp: irfft_from_half(sp[:, 0], sp[:, 1])
        signals = (jax.vmap(jax.vmap(irfft_one))(spectra) if ch == 2
                   else jax.vmap(irfft_one)(spectra))

        # STUB AGC: batched (no running-max recurrence).
        axes = tuple(range(1, signals.ndim))
        peaks = jnp.max(jnp.abs(signals), axis=axes) + np.float32(1e-9)
        new_maxes = jnp.maximum(peaks, carry.running_max)
        norm_factor = jnp.clip(sigmoid_normalize(peaks, new_maxes), 0.0,
                               1.0)
        scale = norm_factor / peaks
        bshape = (T,) + (1,) * (signals.ndim - 1)
        normalized = signals * scale.reshape(bshape)

        hop = cfg.hop_size
        fpeaks = jnp.max(jnp.abs(normalized), axis=axes)
        gains = 1.0 / (fpeaks + np.float32(1e-6))
        windowed = (normalized * gains.reshape(bshape)
                    * window).astype(jnp.float32)
        prev_tails = jnp.concatenate(
            [carry.ola_tail[None], windowed[:-1]], axis=0)
        pcm = (prev_tails[..., hop:]
               + windowed[..., :hop]).astype(jnp.float32)
        if ch != 1:
            pcm = jnp.swapaxes(pcm, 1, 2)
        new_carry = carry._replace(
            hues=hues_seq[-1], prev_spectrum=spectra[-1],
            ola_tail=windowed[-1], running_max=new_maxes[-1])
        return new_carry, {"pcm": pcm}

    arms = {
        "full": jax.jit(lambda c, f: chunk_pipeline(c, f, params, cfg,
                                                    consts, window)),
        "noscan": jax.jit(noscan_pipeline),
    }
    names = list(arms)
    slopes = {n: [] for n in names}

    def bench_chunk(step, T, seed):
        parts = []
        for i in range(0, T, 8):
            n = min(8, T - i)
            parts.append(jax.random.bits(jax.random.PRNGKey(seed + i),
                                         (n, h, w, 3), jnp.uint8))
        frames = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                  else parts[0])
        jax.block_until_ready(frames)
        carry = init_carry(cfg)
        t0 = time.perf_counter()
        carry, outs = step(carry, frames)
        jax.block_until_ready(outs["pcm"])
        dt = time.perf_counter() - t0
        if dt > 2.0:
            print(f"  (compile chunk{T}: {dt:.1f}s)", flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, outs = step(carry, frames)
        jax.block_until_ready(outs["pcm"])
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"device={jax.devices()[0]} res={h}x{w} chunks={chunks}",
          flush=True)
    for rep in range(n_reps):
        order = names[rep % 2:] + names[:rep % 2]
        for name in order:
            a_ix = names.index(name)
            t_s = bench_chunk(arms[name], chunks[0],
                              salt + 17 * rep + 20011 * a_ix)
            t_b = bench_chunk(arms[name], chunks[1],
                              salt + 911 + 17 * rep + 20011 * a_ix)
            ms = (t_b - t_s) / (chunks[1] - chunks[0])
            slopes[name].append(ms)
            print(f"rep{rep} {name:8s} chunk{chunks[0]}={t_s:.1f}ms "
                  f"chunk{chunks[1]}={t_b:.1f}ms -> "
                  f"{ms * 1e3:.1f} us/frame", flush=True)
    for n in names:
        print(f"{n:8s} median {statistics.median(slopes[n]) * 1e3:.1f} "
              f"us/frame", flush=True)
    d = (statistics.median(slopes["full"])
         - statistics.median(slopes["noscan"])) * 1e3
    print(f"serial-scan structure cost: {d:.1f} us/frame", flush=True)


if __name__ == "__main__":
    main()
