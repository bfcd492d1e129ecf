#!/usr/bin/env python
"""Headline benchmark: real-time factor sonifying 1080p30 video to 48 kHz
PCM on one chip (BASELINE.json north star: >= 10x real time per v5e chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 10 — the ratio to the north-star target (the
reference publishes no numbers of its own; see BASELINE.md).

Methodology: frames are generated on-device inside the jit (ingest is a
separately-reported secondary number) and the full fused frame step is
scanned over them; the reported per-frame time is the SLOPE between a small
and a large chunk, which cancels per-dispatch overhead (the TPU tunnel used
in CI adds ~5 ms/call and dedupes identical dispatches, so naive per-call
timing is unreliable — chained carries defeat the dedup).

Environment overrides:
  VAUDIO_BENCH_RES=HxW      frame resolution   (default 1080x1920)
  VAUDIO_BENCH_CHUNKS=a,b   slope chunk sizes  (default 8,32)
  VAUDIO_BENCH_ITERS=N      timed repetitions  (default 6)
  VAUDIO_BENCH_PALLAS=0/1   use the Pallas synthesis kernel
"""

import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from vaudio.config import AuralizerConfig
    from vaudio.dsp import hann_window_norm
    from vaudio.runtime.step import default_params, frame_step, init_carry
    from vaudio.synth import SynthConstants

    res = os.environ.get("VAUDIO_BENCH_RES", "1080x1920")
    h, w = (int(x) for x in res.split("x"))
    chunks = [int(x) for x in
              os.environ.get("VAUDIO_BENCH_CHUNKS", "8,32").split(",")]
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "6"))
    use_pallas = os.environ.get("VAUDIO_BENCH_PALLAS", "0") == "1"

    cfg = AuralizerConfig(sample_rate=48000.0, use_pallas=use_pallas)
    consts = SynthConstants.create(cfg)
    window = jnp.asarray(hann_window_norm(cfg.nfft))
    params = default_params(cfg)

    backend = jax.default_backend()
    dev = jax.devices()[0]
    log(f"bench: backend={backend} device={dev} frame={h}x{w} "
        f"chunks={chunks} pallas={use_pallas}")

    # One executable with a RUNTIME trip count: n is a dynamic fori_loop
    # bound, so both chunk sizes share a single (expensive, remotely
    # cached) compile.
    @jax.jit
    def run_n(carry, seed, n):
        def body(i, c):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed * 131 + i)
            frame = jax.random.uniform(key, (h, w, 3), jnp.float32)
            c2, _out = frame_step(c, frame, params, cfg, consts, window)
            return c2
        return jax.lax.fori_loop(0, n, body, carry)

    def bench_chunk(T, seed0):
        carry = init_carry(cfg)
        t0 = time.perf_counter()
        carry = run_n(carry, seed0, T)
        jax.block_until_ready(carry.running_max)
        log(f"bench: chunk{T} first call (incl. compile) "
            f"{time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(iters):
            carry = run_n(carry, seed0 + i + 1, T)
        jax.block_until_ready(carry.running_max)
        return (time.perf_counter() - t0) / iters * 1e3  # ms/call

    t_small = bench_chunk(chunks[0], 0)
    t_big = bench_chunk(chunks[1], 1000)
    ms_per_frame = (t_big - t_small) / (chunks[1] - chunks[0])
    dispatch_ms = t_small - chunks[0] * ms_per_frame
    fps = 1000.0 / ms_per_frame
    rtf = fps / cfg.video_fps
    log(f"bench: chunk{chunks[0]}={t_small:.1f}ms chunk{chunks[1]}="
        f"{t_big:.1f}ms -> {ms_per_frame:.3f} ms/frame "
        f"(per-dispatch overhead ~{dispatch_ms:.1f}ms)")
    log(f"bench: {fps:.0f} frames/s = {rtf:.1f}x realtime @30fps; audio "
        f"out {fps * cfg.hop_size / 1e6:.2f} Msamples/s")

    print(json.dumps({
        "metric": "realtime_factor_1080p30_to_48kHz_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
