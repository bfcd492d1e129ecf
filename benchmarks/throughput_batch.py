#!/usr/bin/env python
"""Batched multi-stream throughput on one chip (BASELINE config 5 building
block): vmap S concurrent 1080p streams through the fused step and report
aggregate frames/s and per-stream realtime factor.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# Per-process seed salt: the relay's dispatch dedup spans PROCESSES
# (CLAUDE.md) — a fixed PRNGKey would replay last run's whole chain.
_SALT = (time.time_ns() ^ os.getpid()) % (1 << 20)


def main():
    from vaudio.config import AuralizerConfig
    from vaudio.parallel import init_carry_batch, make_batched_step
    from vaudio.runtime.step import default_params
    from vaudio.dsp import hann_window_norm
    from vaudio.synth import SynthConstants
    from vaudio.runtime.step import frame_step

    res = os.environ.get("VAUDIO_BENCH_RES", "1080x1920")
    h, w = (int(x) for x in res.split("x"))
    n_streams = int(os.environ.get("VAUDIO_BENCH_STREAMS", "8"))
    unroll = int(os.environ.get("VAUDIO_BENCH_UNROLL", "1"))  # unroll>1 hurts batched: 2x the 8x-larger live intermediates
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "6"))

    cfg = AuralizerConfig(sample_rate=48000.0)
    consts = SynthConstants.create(cfg)
    window = jnp.asarray(hann_window_norm(cfg.nfft))
    params = default_params(cfg)

    def bench_T(T):
        # Device-resident uint8 frames; carry chains between calls (see
        # bench.py for the methodology rationale).
        frames = jax.random.bits(jax.random.PRNGKey(_SALT),
                                 (T, n_streams, h, w, 3), jnp.uint8)
        jax.block_until_ready(frames)

        @jax.jit
        def scan_chunk(carry, frames):
            def body(c, fr):
                step = jax.vmap(
                    lambda cc, f: frame_step(cc, f, params, cfg, consts,
                                             window),
                    in_axes=(0, 0))
                return step(c, fr)
            return jax.lax.scan(body, carry, frames, unroll=unroll)

        carry = init_carry_batch(cfg, n_streams)
        carry, outs = scan_chunk(carry, frames)
        jax.block_until_ready(outs["pcm"])
        t0 = time.perf_counter()
        for i in range(iters):
            carry, outs = scan_chunk(carry, frames)
        jax.block_until_ready(outs["pcm"])
        return (time.perf_counter() - t0) / iters * 1e3

    t_small, t_big = bench_T(2), bench_T(8)
    ms_per_batch_frame = (t_big - t_small) / 6
    agg_fps = n_streams * 1000.0 / ms_per_batch_frame
    per_stream_rtf = (1000.0 / ms_per_batch_frame) / cfg.video_fps
    print(f"[scan]    {n_streams} streams @ {h}x{w}: "
          f"{ms_per_batch_frame:.3f} ms/batched-frame, "
          f"aggregate {agg_fps:.0f} frames/s, "
          f"per-stream {per_stream_rtf:.1f}x realtime")

    # Chunk-batched variant: vmap(chunk_pipeline) over streams — each
    # stream's synthesis runs as one frame-batched Pallas contraction.
    from vaudio.runtime.chunked import chunk_pipeline

    def bench_chunked_T(T):
        frames = jax.random.bits(jax.random.PRNGKey(_SALT + 1),
                                 (n_streams, T, h, w, 3), jnp.uint8)
        jax.block_until_ready(frames)

        @jax.jit
        def run(carry, frames):
            step = jax.vmap(
                lambda cc, fr: chunk_pipeline(cc, fr, params, cfg, consts,
                                              window),
                in_axes=(0, 0))
            return step(carry, frames)

        carry = init_carry_batch(cfg, n_streams)
        carry, outs = run(carry, frames)
        jax.block_until_ready(outs["pcm"])
        t0 = time.perf_counter()
        for i in range(iters):
            carry, outs = run(carry, frames)
        jax.block_until_ready(outs["pcm"])
        return (time.perf_counter() - t0) / iters * 1e3

    t_small, t_big = bench_chunked_T(2), bench_chunked_T(8)
    ms_c = (t_big - t_small) / 6
    print(f"[chunked] {n_streams} streams @ {h}x{w}: "
          f"{ms_c:.3f} ms/batched-frame, "
          f"aggregate {n_streams * 1000.0 / ms_c:.0f} frames/s, "
          f"per-stream {(1000.0 / ms_c) / cfg.video_fps:.1f}x realtime")


if __name__ == "__main__":
    main()
