#!/usr/bin/env python
"""Long-run DSP-state stability soak (VERDICT r1 item 10, realism r2 #2).

Streams N frames (default 100k ≈ 55 minutes of video ≈ 1.16 h of audio)
through the scan runtime in chunks, asserting the recurrent state stays
healthy the whole way:

* PCM finite, within the post-OLA amplitude bound, and with NON-TRIVIAL
  RMS every chunk — the synthesis path is actually producing audio;
* the hue EMA actually moves: input frames are structured (per-cell
  solid colors cycling through the hue wheel) so every cell passes the
  count>20 histogram gate (VisionEngine.swift:263-269) and the smoothed
  hues change across the run — asserted, not assumed;
* the AGC envelope (running_max) bounded in a realistic-signal range —
  no slow blow-up or collapse (SoundEngine.swift:412-426's running max
  is the state most exposed to drift);
* phase accumulators within [0, 2pi) — the mod-2pi wrap never degrades
  (SoundEngine.swift:257-286);
* OLA tail finite.

Input realism: each frame is a 4x4 grid of solid-color cells; the base
hue advances a small irrational-ish step per frame (several full hue
cycles per chunk) and each cell carries a fixed hue offset, so the hue
argmax, EMA recurrence, per-cell f0 mapping and full synthesis all run
at realistic amplitudes.  Three hue-offset banks alternate so
consecutive chunks end in different hue states (a single reused bank
would make every chunk end identically — the EMA forgets its start
within a chunk).

Usage: python benchmarks/soak.py
  VAUDIO_SOAK_FRAMES=N      total frames (default 100000)
  VAUDIO_SOAK_BUDGET_S=S    wall-clock bound, 0 = none (default 0)
  VAUDIO_SOAK_CHUNK=T       frames per device dispatch (default 2000)
  VAUDIO_SOAK_SIZE=S        frame side, or HxW (default 256: mip-3
                            gives 64 px/cell, comfortably past the
                            count>20 hue gate for solid cells; the
                            production shape is 1080x1920)
  VAUDIO_SOAK_RUNTIME=R     scan (default) or chunked — the batched
                            production pipeline (Pallas pool + tiled
                            histogram engage at 1080p)
  VAUDIO_SOAK_MIP=L         mip level (default 3; the CPU-bounded CI
                            variant uses size 64 + mip 1 for the same
                            64 px/cell gate margin at 9x less pixel work)
  VAUDIO_SOAK_OUT=path      write the summary JSON artifact

Exits non-zero on the first health violation; prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_bank(chunk: int, size, bank_idx: int, grid: int = 4
               ) -> np.ndarray:
    """u8[chunk, h, w, 3] of per-cell solid colors (``size``: int side
    or an (h, w) pair).

    Frame ``i`` of bank ``b`` uses base hue ``(b*chunk + i) * step`` with
    a fixed per-cell offset — deterministic, structured, hue-cycling
    content (the tutorial screen's solid-color harness semantics,
    Tutorial/TutorialStart.swift:109-124, tiled per cell)."""
    from vaudio.utils.render import hsb_to_rgb_array
    h, w = (size, size) if isinstance(size, int) else size
    step = 0.003819            # ~7.6 hue cycles per 2000-frame chunk
    idx = np.arange(bank_idx * chunk, (bank_idx + 1) * chunk)
    base = (idx * step) % 1.0
    cell_off = (np.arange(grid * grid, dtype=np.float64)
                .reshape(grid, grid) / 20.0)
    hues = (base[:, None, None] + cell_off) % 1.0
    rgb8 = (hsb_to_rgb_array(hues.astype(np.float32)) * 255.0 + 0.5
            ).astype(np.uint8)                       # (chunk, g, g, 3)
    return np.repeat(np.repeat(rgb8, h // grid, axis=1), w // grid, axis=2)


def run_soak(total_frames: int = 100_000, budget_s: float = 0.0,
             chunk: int = 2000, size=256, mip_level: int = 3,
             n_banks: int = 3, runtime: str = "scan", log=print) -> dict:
    """Run the soak; returns the summary dict (raises AssertionError on a
    health violation).

    ``size``: int side or an (h, w) pair (the production 1080p shape is
    (1080, 1920), where the int8 Pallas pool and the tiled histogram
    fast paths actually engage).  ``runtime``: "scan" (per-frame
    lax.scan, the CI default) or "chunked" (runtime.chunked — the
    production batched pipeline; the same health surface, exercised
    through the deployment path)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vaudio.config import AuralizerConfig
    from vaudio.dsp import hann_window_norm
    from vaudio.runtime.step import (default_params, frame_step,
                                     init_carry)
    from vaudio.synth import SynthConstants

    h, w = (size, size) if isinstance(size, int) else size
    cfg = dataclasses.replace(AuralizerConfig(), mip_level=mip_level)
    mip_px_per_cell = ((h >> mip_level) * (w >> mip_level)
                       // cfg.num_cells)
    assert mip_px_per_cell > cfg.hist_count_gate, \
        (f"soak input would not pass the hue gate: {mip_px_per_cell} "
         f"mip px/cell <= gate {cfg.hist_count_gate}")
    consts = SynthConstants.create(cfg)
    window = jnp.asarray(hann_window_norm(cfg.nfft))
    params = default_params(cfg)

    banks = [jax.device_put(jnp.asarray(build_bank(chunk, (h, w), b)))
             for b in range(n_banks)]

    if runtime == "chunked":
        from vaudio.runtime.chunked import chunk_pipeline

        @jax.jit
        def scan_chunk(carry, frames):
            return chunk_pipeline(carry, frames, params, cfg, consts,
                                  window)
    else:
        @jax.jit
        def scan_chunk(carry, frames):
            def body(c, f):
                return frame_step(c, f, params, cfg, consts, window)
            return jax.lax.scan(body, carry, frames)

    carry = init_carry(cfg)
    done = 0
    timed_from = 0
    t0 = time.monotonic()
    max_envelope, min_envelope = 0.0, float("inf")
    min_rms = float("inf")
    hue_states = set()
    two_pi = 2.0 * np.pi
    chunk_i = 0
    while done < total_frames:
        # The wall-clock budget excludes the first chunk's compile time
        # (restart the clock after it) so a bounded CI run still covers
        # thousands of steady-state frames.
        if done == chunk:
            t0 = time.monotonic()
            timed_from = done
        if budget_s and done > 0 and time.monotonic() - t0 > budget_s:
            break
        carry, outs = scan_chunk(carry, banks[chunk_i % n_banks])
        chunk_i += 1
        pcm = np.asarray(outs["pcm"])
        done += chunk

        # --- health assertions ---
        assert np.all(np.isfinite(pcm)), f"non-finite PCM at {done}"
        peak = float(np.abs(pcm).max())
        # Per-frame OLA renormalizes to peak 1; two overlapped windows of
        # the normalized Hann (sqrt(2/3)*2 amplitude) bound the output.
        assert peak <= 4.0, f"PCM peak {peak} blown up at {done}"
        rms = float(np.sqrt(np.mean(np.square(pcm))))
        min_rms = min(min_rms, rms)
        # Solid-color cells above the hue gate must synthesize real
        # audio — a near-silent chunk means the hue path died (the r2
        # soak's failure mode: gate never opened, agc_envelope 3e-5).
        assert rms > 1e-2, f"near-silent chunk (rms {rms:.2e}) at {done}"
        # Envelope scale note: active full synthesis sits near ~3e-5 in
        # absolute terms (per-cell 1/16 normalization spread over a
        # 4096-pt frame) — the bound guards drift/blow-up/collapse, not
        # absolute loudness; loudness is asserted via PCM RMS above.
        rm = float(np.asarray(carry.running_max))
        assert np.isfinite(rm) and 1e-8 < rm < 1e3, \
            f"AGC envelope {rm} unhealthy at {done}"
        max_envelope = max(max_envelope, rm)
        min_envelope = min(min_envelope, rm)
        ph = np.asarray(carry.phases)
        assert np.all((ph >= 0.0) & (ph < two_pi + 1e-4)), \
            f"phase accumulator left [0, 2pi) at {done}"
        assert np.all(np.isfinite(np.asarray(carry.ola_tail))), \
            f"non-finite OLA tail at {done}"
        hue_states.add(tuple(np.asarray(carry.hues).tolist()))

    # The hue EMA must actually have moved: different chunk-end states
    # (offset banks guarantee distinct targets) and non-degenerate hues.
    n_chunks = done // chunk
    assert len(hue_states) >= min(n_chunks, 2), \
        f"hue EMA frozen: {len(hue_states)} distinct states in " \
        f"{n_chunks} chunks"
    assert any(any(h != 0 for h in s) for s in hue_states), \
        "hues never left 0 — the histogram gate never opened"

    dt = time.monotonic() - t0
    timed = done - (timed_from if done > chunk else 0)
    summary = {
        "metric": "soak_frames_healthy",
        "frames": done,
        "size": f"{h}x{w}",
        "runtime": runtime,
        "mip_level": mip_level,
        "audio_seconds": round(done * cfg.hop_size / cfg.sample_rate, 1),
        "wall_s": round(dt, 1),
        "fps": round(timed / dt, 1) if dt > 0 else None,
        "agc_envelope_max": float(f"{max_envelope:.4g}"),
        "agc_envelope_min": float(f"{min_envelope:.4g}"),
        "pcm_rms_min": float(f"{min_rms:.4g}"),
        "distinct_hue_states": len(hue_states),
        "ok": True,
    }
    log(json.dumps(summary))
    out_path = os.environ.get("VAUDIO_SOAK_OUT", "")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    size_env = os.environ.get("VAUDIO_SOAK_SIZE", "256")
    size = (tuple(int(x) for x in size_env.split("x"))
            if "x" in size_env else int(size_env))
    run_soak(
        total_frames=int(os.environ.get("VAUDIO_SOAK_FRAMES", "100000")),
        budget_s=float(os.environ.get("VAUDIO_SOAK_BUDGET_S", "0")),
        chunk=int(os.environ.get("VAUDIO_SOAK_CHUNK", "2000")),
        size=size,
        mip_level=int(os.environ.get("VAUDIO_SOAK_MIP", "3")),
        runtime=os.environ.get("VAUDIO_SOAK_RUNTIME", "scan"),
    )
