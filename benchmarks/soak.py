#!/usr/bin/env python
"""Long-run DSP-state stability soak (VERDICT r1 item 10).

Streams N frames (default 100k ≈ 55 minutes of video ≈ 1.16 h of audio)
at 64x64 through the scan runtime in chunks, asserting the recurrent
state stays healthy the whole way:

* PCM finite and within the post-OLA amplitude bound every chunk;
* the AGC envelope (running_max) bounded — no slow blow-up or collapse
  (SoundEngine.swift:412-426's running max is the state most exposed to
  drift);
* phase accumulators within [0, 2pi) — the mod-2pi wrap never degrades
  (SoundEngine.swift:257-286);
* OLA tail finite.

Usage: python benchmarks/soak.py
  VAUDIO_SOAK_FRAMES=N      total frames (default 100000)
  VAUDIO_SOAK_BUDGET_S=S    wall-clock bound, 0 = none (default 0)
  VAUDIO_SOAK_CHUNK=T       frames per device dispatch (default 2000)
  VAUDIO_SOAK_SIZE=S        frame side (default 256 — large enough that
                            cells pass the count>20 hue gate, so the hue
                            EMA and full synthesis run; 64 keeps the
                            CPU-bounded CI variant cheap)
  VAUDIO_SOAK_OUT=path      write the summary JSON artifact

Exits non-zero on the first health violation; prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_soak(total_frames: int = 100_000, budget_s: float = 0.0,
             chunk: int = 2000, size: int = 256, seed: int = 0,
             log=print) -> dict:
    """Run the soak; returns the summary dict (raises AssertionError on a
    health violation)."""
    import jax
    import jax.numpy as jnp

    from vaudio.config import AuralizerConfig
    from vaudio.dsp import hann_window_norm
    from vaudio.runtime.step import (default_params, frame_step,
                                     init_carry)
    from vaudio.synth import SynthConstants

    cfg = AuralizerConfig()
    consts = SynthConstants.create(cfg)
    window = jnp.asarray(hann_window_norm(cfg.nfft))
    params = default_params(cfg)

    # A bank of varied frames reused cyclically: content changes per frame
    # (hue jumps exercise the phase/EMA paths) without host regeneration.
    rng = np.random.default_rng(seed)
    bank = rng.integers(0, 256, (chunk, size, size, 3), dtype=np.uint8)
    frames = jax.device_put(jnp.asarray(bank))

    @jax.jit
    def scan_chunk(carry, frames):
        def body(c, f):
            return frame_step(c, f, params, cfg, consts, window)
        return jax.lax.scan(body, carry, frames)

    carry = init_carry(cfg)
    done = 0
    timed_from = 0
    t0 = time.monotonic()
    max_envelope = 0.0
    two_pi = 2.0 * np.pi
    while done < total_frames:
        # The wall-clock budget excludes the first chunk's compile time
        # (restart the clock after it) so a bounded CI run still covers
        # thousands of steady-state frames.
        if done == chunk:
            t0 = time.monotonic()
            timed_from = done
        if budget_s and done > 0 and time.monotonic() - t0 > budget_s:
            break
        carry, outs = scan_chunk(carry, frames)
        pcm = np.asarray(outs["pcm"])
        done += chunk

        # --- health assertions ---
        assert np.all(np.isfinite(pcm)), f"non-finite PCM at {done}"
        peak = float(np.abs(pcm).max())
        # Per-frame OLA renormalizes to peak 1; two overlapped windows of
        # the normalized Hann (sqrt(2/3)*2 amplitude) bound the output.
        assert peak <= 4.0, f"PCM peak {peak} blown up at {done}"
        rm = float(np.asarray(carry.running_max))
        assert np.isfinite(rm) and 1e-6 < rm < 1e6, \
            f"AGC envelope {rm} unhealthy at {done}"
        max_envelope = max(max_envelope, rm)
        ph = np.asarray(carry.phases)
        assert np.all((ph >= 0.0) & (ph < two_pi + 1e-4)), \
            f"phase accumulator left [0, 2pi) at {done}"
        assert np.all(np.isfinite(np.asarray(carry.ola_tail))), \
            f"non-finite OLA tail at {done}"

    dt = time.monotonic() - t0
    timed = done - (timed_from if done > chunk else 0)
    summary = {
        "metric": "soak_frames_healthy",
        "frames": done,
        "audio_seconds": round(done * cfg.hop_size / cfg.sample_rate, 1),
        "wall_s": round(dt, 1),
        "fps": round(timed / dt, 1) if dt > 0 else None,
        "agc_envelope_max": float(f"{max_envelope:.4g}"),
        "ok": True,
    }
    log(json.dumps(summary))
    out_path = os.environ.get("VAUDIO_SOAK_OUT", "")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    run_soak(
        total_frames=int(os.environ.get("VAUDIO_SOAK_FRAMES", "100000")),
        budget_s=float(os.environ.get("VAUDIO_SOAK_BUDGET_S", "0")),
        chunk=int(os.environ.get("VAUDIO_SOAK_CHUNK", "2000")),
        size=int(os.environ.get("VAUDIO_SOAK_SIZE", "256")),
    )
