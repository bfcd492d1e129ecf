#!/usr/bin/env python
"""Headline benchmark: real-time factor sonifying 1080p30 video to 48 kHz
PCM on one chip (BASELINE.json north star: >= 10x real time per v5e chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 10 — the ratio to the north-star target (the
reference publishes no numbers of its own; see BASELINE.md).

Environment overrides:
  VAUDIO_BENCH_RES=HxW      frame resolution   (default 1080x1920)
  VAUDIO_BENCH_FRAMES=N     frames per chunk   (default 16)
  VAUDIO_BENCH_SECONDS=S    target measured seconds (default 5)
  VAUDIO_BENCH_PALLAS=0/1   use the Pallas synthesis kernel
"""

import json
import os
import sys
import time

import numpy as np


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
    chunk = int(os.environ.get("VAUDIO_BENCH_FRAMES", "16"))
    target_s = float(os.environ.get("VAUDIO_BENCH_SECONDS", "5"))
    use_pallas = os.environ.get("VAUDIO_BENCH_PALLAS", "0") == "1"

    cfg = AuralizerConfig(sample_rate=48000.0, use_pallas=use_pallas)
    consts = SynthConstants.create(cfg)
    window = jnp.asarray(hann_window_norm(cfg.nfft))
    params = default_params(cfg)

    backend = jax.default_backend()
    dev = jax.devices()[0]
    log(f"bench: backend={backend} device={dev} frame={h}x{w} "
        f"chunk={chunk} pallas={use_pallas}")

    # Device-resident random frames (the steady-state serving path keeps
    # frames on-device via prefetch; H2D ingest is benchmarked separately
    # in benchmarks/).
    key = jax.random.PRNGKey(0)
    frames = jax.random.uniform(key, (chunk, h, w, 3), jnp.float32)
    jax.block_until_ready(frames)

    def body(c, f):
        return frame_step(c, f, params, cfg, consts, window)

    @jax.jit
    def scan_chunk(carry, frames):
        return jax.lax.scan(body, carry, frames)

    carry = init_carry(cfg)
    t0 = time.perf_counter()
    carry, outs = scan_chunk(carry, frames)
    jax.block_until_ready(outs["pcm"])
    compile_s = time.perf_counter() - t0
    log(f"bench: first chunk (incl. compile) {compile_s:.2f}s")

    # Calibrate iteration count for ~target_s of measurement.
    t0 = time.perf_counter()
    carry, outs = scan_chunk(carry, frames)
    jax.block_until_ready(outs["pcm"])
    per_chunk = time.perf_counter() - t0
    iters = max(1, int(target_s / max(per_chunk, 1e-6)))
    iters = min(iters, 512)
    log(f"bench: {per_chunk * 1e3:.1f} ms/chunk -> {iters} iters")

    t0 = time.perf_counter()
    for _ in range(iters):
        carry, outs = scan_chunk(carry, frames)
    jax.block_until_ready(outs["pcm"])
    dt = time.perf_counter() - t0

    frames_done = chunk * iters
    fps = frames_done / dt
    rtf = fps / cfg.video_fps
    ms_per_frame = 1000.0 / fps
    audio_rate = fps * cfg.hop_size
    log(f"bench: {fps:.1f} frames/s = {rtf:.2f}x realtime @30fps, "
        f"{ms_per_frame:.3f} ms/frame, {audio_rate / 1e6:.2f} Msamples/s "
        f"audio generated")

    print(json.dumps({
        "metric": "realtime_factor_1080p30_to_48kHz_per_chip",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
