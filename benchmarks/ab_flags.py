#!/usr/bin/env python
"""Same-session A/B of AuralizerConfig perf flags on the stereo chunked
headline config (TPU).

Runs each named flag combo through the full chunk pipeline in ONE
process with INTERLEAVED slope reps (combo order re-randomized per rep),
so tunnel drift hits all arms equally — the round-3 A/B methodology
(docs/BENCHMARKS.md).  Carries chain between calls (dedup defense);
seeds are salted per process (the relay dedup spans processes).

Slope statistics are the HARDENED bench.py set (commit 54e8e88 — the
round-4 artifact was judged unusable without them: a 1321.82 us garbage
slope sat in the median set next to 27.93 and 33.99): each timed point
is the MIN of two loops (host pauses only inflate), reps extend
adaptively until every arm's middle-3 positive slopes agree within
``VAUDIO_BENCH_STABLE_FRAC`` of their median (default 0.15 — tighter
than bench.py's 0.4 because an A/B must resolve ~10% differences), and
each arm records its valid-slope count + a ``stable`` flag so a
degraded-host artifact is distinguishable from a clean one.

Usage:  python benchmarks/ab_flags.py [combo ...]
  combo names: baseline, matmul_ema, fast_acos, both, default,
               cumsum_phases, serial_phases, matmul_irfft,
               matmul_ema_r5, phase_lut, quant_f32, quant_int8;
               with VAUDIO_AB_MODE=scan also scan_default,
               scan_pallas, scan_pallas_audio, scan_both_pallas,
               scan_unroll4/12/16, scan_block8/16
Env: VAUDIO_BENCH_RES (1080x1920), VAUDIO_BENCH_CHUNKS (16,128),
     VAUDIO_BENCH_ITERS (12), VAUDIO_BENCH_SLOPE_REPS (3),
     VAUDIO_BENCH_MAX_REPS (8), VAUDIO_BENCH_STABLE_FRAC (0.15),
     VAUDIO_AB_MODE (chunked|scan — scan wraps frame_step in the
     unrolled lax.scan bench.py measures as scan_path_x_realtime),
     VAUDIO_BENCH_JSON (artifact path)
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Arms pin EVERY flag they differ on explicitly, so they keep meaning
# the same thing when an AuralizerConfig default flips (fast_hue_acos
# became the default after this harness's first run).
COMBOS = {
    "baseline": {"use_matmul_ema": False, "fast_hue_acos": False},
    "matmul_ema": {"use_matmul_ema": True, "fast_hue_acos": False},
    "fast_acos": {"use_matmul_ema": False, "fast_hue_acos": True},
    "both": {"use_matmul_ema": True, "fast_hue_acos": True},
    "default": {},   # whatever AuralizerConfig currently defaults to
    # Round-4 candidate: phase accumulation as a batched prefix sum
    # outside the serial hue scan (vs the current default arm).
    # Resolved round 5 (AB_FLAGS_r05.json): 22% win, now the default.
    "cumsum_phases": {"use_cumsum_phases": True},
    "serial_phases": {"use_cumsum_phases": False},
    # Round-5 re-tests: both measured a WASH against the 37 us pipeline
    # (r03) — but the cumsum flip shrank the serial region, so the
    # overlap structure those verdicts rested on changed.
    "matmul_irfft": {"use_matmul_irfft": True},
    "matmul_ema_r5": {"use_matmul_ema": True},
    # Round-5 profile-driven candidate (CHUNK_PROFILE_r05.json priced
    # the phase stage ~9 us/frame): phase advance as a (360, P) table
    # gather instead of per-frame exp2 + bin snap (bit-identical).
    "phase_lut": {"use_phase_lut": True},
    # Strict-parity quantized chain: f32 emulation vs the round-5
    # all-integer int8 MXU chain (config.quantize_mips_int8).
    "quant_f32": {"quantize_mips": True},
    "quant_int8": {"quantize_mips": True, "quantize_mips_int8": True},
    # Scan-path arms (VAUDIO_AB_MODE=scan): per-frame dispatch is
    # scheduling-gap-bound, so the candidates are the fused Pallas
    # kernels (fewer, larger in-loop kernels) and the unroll factor.
    # "_unroll" is harness-level (lax.scan unroll), not an
    # AuralizerConfig field.
    "scan_default": {},
    "scan_pallas": {"use_pallas": True},
    "scan_pallas_audio": {"use_pallas_audio": True},
    "scan_both_pallas": {"use_pallas": True, "use_pallas_audio": True},
    "scan_unroll4": {"_unroll": 4},
    "scan_unroll12": {"_unroll": 12},
    "scan_unroll16": {"_unroll": 16},
    # Blocked sub-chunks (VERDICT r4 item 5): one device-side lax.scan
    # whose body is the chunk pipeline over a fixed block — batched
    # contraction/irfft/OLA at block granularity, whole clip in one
    # dispatch (runtime.chunked.blocked_pipeline).
    "scan_block8": {"_block": 8},
    "scan_block16": {"_block": 16},
}


def main():
    import _common
    _common.enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from vaudio.config import AuralizerConfig
    from vaudio.dsp import hann_window_norm
    from vaudio.runtime.chunked import blocked_pipeline, chunk_pipeline
    from vaudio.runtime.step import default_params, frame_step, init_carry
    from vaudio.synth import SynthConstants

    mode = os.environ.get("VAUDIO_AB_MODE", "chunked")
    names = sys.argv[1:] or \
        [n for n in COMBOS if n.startswith("scan_") == (mode == "scan")]
    res = os.environ.get("VAUDIO_BENCH_RES", "1080x1920")
    h, w = (int(x) for x in res.split("x"))
    chunks = [int(x) for x in
              os.environ.get("VAUDIO_BENCH_CHUNKS", "16,128").split(",")]
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "12"))
    n_reps = int(os.environ.get("VAUDIO_BENCH_SLOPE_REPS", "3"))
    max_reps = int(os.environ.get("VAUDIO_BENCH_MAX_REPS", "8"))
    stable_frac = float(os.environ.get("VAUDIO_BENCH_STABLE_FRAC",
                                       "0.15"))
    salt = (time.time_ns() ^ os.getpid()) % (1 << 20)

    print(f"device={jax.devices()[0]} res={h}x{w} chunks={chunks} "
          f"iters={iters} reps={n_reps} combos={names}", flush=True)

    arms = {}
    for name in names:
        combo = dict(COMBOS[name])
        unroll = combo.pop("_unroll", 8)
        block = combo.pop("_block", 0)
        cfg = AuralizerConfig(sample_rate=48000.0, channels=2, **combo)
        consts = SynthConstants.create(cfg)
        window = jnp.asarray(hann_window_norm(cfg.nfft))
        params = default_params(cfg)

        def make_step(cfg=cfg, consts=consts, window=window,
                      params=params, unroll=unroll, block=block):
            if mode == "scan" and block:
                @jax.jit
                def step(carry, frames):
                    return blocked_pipeline(carry, frames, params, cfg,
                                            consts, window, block=block)
            elif mode == "scan":
                @jax.jit
                def step(carry, frames):
                    def body(c, f):
                        return frame_step(c, f, params, cfg, consts,
                                          window)
                    return jax.lax.scan(body, carry, frames,
                                        unroll=unroll)
            else:
                @jax.jit
                def step(carry, frames):
                    return chunk_pipeline(carry, frames, params, cfg,
                                          consts, window)
            return step

        arms[name] = {"cfg": cfg, "step": make_step(), "slopes": []}

    def bench_chunk(arm, T, seed):
        parts = []
        for i in range(0, T, 8):
            n = min(8, T - i)
            parts.append(jax.random.bits(jax.random.PRNGKey(seed + i),
                                         (n, h, w, 3), jnp.uint8))
        frames = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                  else parts[0])
        jax.block_until_ready(frames)
        carry = init_carry(arm["cfg"])
        t0 = time.perf_counter()
        carry, outs = arm["step"](carry, frames)
        jax.block_until_ready(outs["pcm"])
        dt = time.perf_counter() - t0
        if dt > 2.0:
            print(f"  (compile chunk{T}: {dt:.1f}s)", flush=True)
        # MIN of two timed loops (bench.py commit 54e8e88): host pauses
        # (GC, relay hiccups) only ever INFLATE a loop, so the min is
        # the better estimator of the true per-call time.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                carry, outs = arm["step"](carry, frames)
            jax.block_until_ready(outs["pcm"])
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best

    def mid3(slopes):
        """The middle-3 of the sorted positive slopes (or fewer)."""
        valid = sorted(s for s in slopes if s > 0)
        return valid[(len(valid) - 3) // 2:][:3] if len(valid) >= 3 \
            else valid

    def arm_stable(slopes):
        valid = [s for s in slopes if s > 0]
        if len(valid) < 3:
            return False
        m = mid3(slopes)
        return (m[-1] - m[0]) <= stable_frac * statistics.median(valid)

    # Adaptive interleaved reps: keep running full rounds (every arm
    # once, rotated order) until EVERY arm's middle-3 positive slopes
    # agree within stable_frac of its median, or the rep budget runs
    # out.  All arms get the same number of rounds so drift stays
    # balanced.
    rep = 0
    while True:
        # Rotate combo order so drift within a rep is not correlated
        # with a fixed arm position.
        order = names[rep % len(names):] + names[:rep % len(names)]
        for name in order:
            arm = arms[name]
            # Seed salted per (rep, ARM): two arms with identical configs
            # (hence identical compiled graphs) must never replay each
            # other's dispatch chain byte-for-byte, or the relay's dedup
            # hands the later arm a bogus-fast slope.
            a_ix = names.index(name)
            t_small = bench_chunk(arm, chunks[0],
                                  salt + 13 * rep + 10007 * a_ix)
            t_big = bench_chunk(arm, chunks[1],
                                salt + 997 + 13 * rep + 10007 * a_ix)
            ms = (t_big - t_small) / (chunks[1] - chunks[0])
            arm["slopes"].append(ms)
            print(f"rep{rep} {name:12s} chunk{chunks[0]}={t_small:.1f}ms "
                  f"chunk{chunks[1]}={t_big:.1f}ms -> "
                  f"{ms * 1e3:.1f} us/frame", flush=True)
        rep += 1
        if rep >= n_reps and all(arm_stable(arms[n]["slopes"])
                                 for n in names):
            break
        if rep >= max_reps:
            break
        if rep >= n_reps:
            bad = [n for n in names if not arm_stable(arms[n]["slopes"])]
            print(f"unstable arms {bad} — extra rep", flush=True)

    record = {"resolution": f"{h}x{w}", "chunks": chunks, "iters": iters,
              "slope_reps": rep, "stable_frac": stable_frac, "mode": mode,
              "device": str(jax.devices()[0]), "arms": {}}
    for name in names:
        slopes = arms[name]["slopes"]
        valid = [s for s in slopes if s > 0]
        stable = arm_stable(slopes)
        # Reported number: median of the middle-3 positive slopes —
        # identical to the plain median when stable, and outlier-trimmed
        # when the gate never passed (ADVICE r04: never let a 40x
        # garbage slope into the median set).
        m = mid3(slopes)
        ms = statistics.median(m) if m else float("nan")
        rtf = (1000.0 / ms) / 30.0 if ms == ms and ms > 0 else 0.0
        print(f"{name:12s} median {ms * 1e3:.1f} us/frame = "
              f"{rtf:.0f}x realtime "
              f"({'stable' if stable else 'UNSTABLE'}, "
              f"{len(valid)}/{len(slopes)} valid slopes "
              f"{[round(s * 1e3, 1) for s in slopes]})",
              flush=True)
        record["arms"][name] = {
            "us_per_frame": round(ms * 1e3, 2),
            "x_realtime": round(rtf, 1),
            "stable": stable,
            "valid_reps": len(valid),
            "slopes_us": [round(s * 1e3, 2) for s in slopes]}

    out = os.environ.get("VAUDIO_BENCH_JSON")
    if out:
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
