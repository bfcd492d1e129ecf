#!/usr/bin/env python
"""Scan path vs chunk-batched pipeline at the headline config
(1080p30 u8 frames -> 48 kHz), slope method, on-device frames.

Prints per-frame marginal times for both paths and both pallas settings.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import _common
    _common.enable_compile_cache()

    from vaudio.config import AuralizerConfig
    from vaudio.dsp import hann_window_norm
    from vaudio.runtime.chunked import chunk_pipeline
    from vaudio.runtime.step import default_params, frame_step, init_carry
    from vaudio.synth import SynthConstants

    res = os.environ.get("VAUDIO_BENCH_RES", "1080x1920")
    h, w = (int(x) for x in res.split("x"))
    channels = int(os.environ.get("VAUDIO_BENCH_CHANNELS", "2"))
    chunks = os.environ.get("VAUDIO_BENCH_CHUNKS", "32,128")
    T_LO, T_HI = (int(x) for x in chunks.split(","))
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "12"))

    cfg = AuralizerConfig(sample_rate=48000.0, channels=channels)
    consts = SynthConstants.create(cfg)
    window = jnp.asarray(hann_window_norm(cfg.nfft))
    params = default_params(cfg)
    print(f"device={jax.devices()[0]} frame={h}x{w} ch={channels}",
          file=sys.stderr)

    _SALT = (time.time_ns() ^ os.getpid()) % (1 << 20)  # cross-run dedup salt

    def frames_for(T, seed):
        # Generate in <=8-frame slices: threefry's u32 intermediates are
        # 4x the u8 output and OOM at 4K x 64 frames in one shot.
        parts = []
        for i in range(0, T, 8):
            n = min(8, T - i)
            parts.append(jax.random.bits(jax.random.PRNGKey(_SALT + seed + i),
                                         (n, h, w, 3), jnp.uint8))
        fr = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        jax.block_until_ready(fr)
        return fr

    def time_fn(fn, T, seed0):
        frames = frames_for(T, seed0)
        carry = init_carry(cfg)
        carry, out = fn(carry, frames)
        jax.block_until_ready(out["pcm"])
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, out = fn(carry, frames)
        jax.block_until_ready(out["pcm"])
        return (time.perf_counter() - t0) / iters * 1e3

    def slope(fn, label):
        lo = time_fn(fn, T_LO, 0)
        hi = time_fn(fn, T_HI, 1000)
        ms = (hi - lo) / (T_HI - T_LO)
        rtf = 1000.0 / ms / cfg.video_fps
        print(f"{label}: {lo:.1f}ms@{T_LO} {hi:.1f}ms@{T_HI} -> "
              f"{ms * 1e3:.0f} us/frame = {rtf:.0f}x realtime",
              file=sys.stderr)
        return ms

    @jax.jit
    def scan_path(carry, frames):
        def body(c, f):
            return frame_step(c, f, params, cfg, consts, window)
        return jax.lax.scan(body, carry, frames, unroll=4)

    results = {"scan_jnp_us": slope(scan_path, "scan (jnp, unroll=4)")}

    for pallas in (False, True):
        @jax.jit
        def chunk_path(carry, frames, _p=pallas):
            return chunk_pipeline(carry, frames, params, cfg, consts,
                                  window, use_pallas=_p)
        key = f"chunked_{'pallas' if pallas else 'jnp'}_us"
        results[key] = slope(chunk_path,
                             f"chunked ({'pallas' if pallas else 'jnp'})")

    import json
    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
