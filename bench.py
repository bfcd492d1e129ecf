#!/usr/bin/env python
"""Headline benchmark: real-time factor sonifying 1080p30 video to 48 kHz
STEREO PCM on one chip (BASELINE.json north star: >= 10x real time per
v5e chip, 48 kHz stereo).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus a
``mono_x_realtime`` key (the reference's own output is mono 44.1 kHz —
SoundEngine.swift:165 — so both operating points are recorded).
``vs_baseline`` is value / 10 — the ratio to the north-star target (the
reference publishes no numbers of its own; see BASELINE.md).

Methodology: uint8 frames are pre-generated DEVICE-RESIDENT (the
steady-state serving configuration, where ingest DMA overlaps compute;
H2D cost is characterized separately in benchmarks/latency.py) and run
through the chunk-batched pipeline (runtime.chunked: serial scan only for
vision/EMA/phases, ONE frame-batched Pallas contraction for the heavy
synthesis stage); the sequential scan path — dispatched as
blocked sub-chunks of 8 by default, see VAUDIO_BENCH_SCAN_BLOCK — is
co-measured as ``scan_path_x_realtime``.  The reported per-frame time is the SLOPE
between a small and a large chunk length, which cancels per-dispatch
overhead (the TPU tunnel used in CI adds ~5 ms/call and dedupes identical
dispatches, so naive per-call timing is unreliable — chained carries
defeat the dedup).

Environment overrides:
  VAUDIO_BENCH_RES=HxW      frame resolution   (default 1080x1920)
  VAUDIO_BENCH_CHUNKS=a,b   slope chunk sizes  (default 16,128; the
                            112-frame delta keeps the signal ~4 ms,
                            an order above the tunnel's ms-level
                            call-time jitter — 48-frame deltas
                            occasionally collapsed, see BENCH_r02)
  VAUDIO_BENCH_ITERS=N      timed repetitions  (default 8)
  VAUDIO_BENCH_PALLAS=0/1   use the Pallas synthesis kernel
  VAUDIO_BENCH_PALLAS_AUDIO=0/1  use the Pallas AGC+OLA kernel
  VAUDIO_BENCH_PALLAS_POOL=0/1   fused Pallas mip-pool kernel (default 1)
  VAUDIO_BENCH_PALLAS_VISION=0/1 fused vision-epilogue kernel (default 0:
                                 measured 2.1x SLOWER in-pipeline even
                                 frame-blocked — see docs/BENCHMARKS.md)
  VAUDIO_BENCH_MATMUL_IRFFT=0/1  dense MXU IDFT instead of the XLA FFT
  VAUDIO_BENCH_MATMUL_EMA=0/1    spectrum EMA as one triangular MXU
                                 matmul instead of the serial scan
  VAUDIO_BENCH_FAST_ACOS=0/1     polynomial hue arccos (<=2e-8 rad;
                                 default 1 = the config default)
  VAUDIO_BENCH_CHANNELS=1/2 stereo (default) or mono headline config
  VAUDIO_BENCH_QUANTIZE=0/1 strict-parity 8-bit mip chain
                            (cfg.quantize_mips; disables the int8 pool
                            fast paths by construction)
  VAUDIO_BENCH_QUANTIZE_INT8=0/1 all-integer quantized chain
                            (cfg.quantize_mips_int8; needs QUANTIZE=1)
  VAUDIO_BENCH_MONO=0/1     also measure the mono config (default 1)
  VAUDIO_BENCH_SCAN=0/1     also measure the sequential scan path (default 1)
  VAUDIO_BENCH_SCAN_BLOCK=N scan-path dispatch granularity (default 8:
                            blocked sub-chunks — a device-side lax.scan
                            of chunk_pipeline bodies, runtime.chunked.
                            blocked_pipeline; 0/1 = the per-frame
                            frame_step scan.  AB_FLAGS_r05_scan.json:
                            per-frame 71.4 us/frame (467x) vs blocked-8
                            42.0 (793x) — batching the contraction/
                            irfft/OLA at block granularity removes the
                            per-frame scheduling gaps)
  VAUDIO_BENCH_UNROLL=N     scan unroll factor (default 8; measured
                            sweep at 1080p stereo: 4 -> 73 us/frame,
                            8 -> 65, 16 -> 81 — larger unrolls blow
                            the live-intermediate footprint)
  VAUDIO_JAX_CACHE=dir      persistent compile cache location
"""

import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax

    # Persistent compile cache: the 1080p scan graph takes minutes to
    # compile through the remote-compile tunnel; cache it on disk so
    # repeated bench runs (and the CI driver) skip the compile.
    cache_dir = os.environ.get("VAUDIO_JAX_CACHE",
                               "/root/repo/.jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # cache is best-effort
        log(f"bench: compile cache unavailable: {e}")

    import jax.numpy as jnp

    from vaudio.config import AuralizerConfig
    from vaudio.dsp import hann_window_norm
    from vaudio.runtime.step import default_params, frame_step, init_carry
    from vaudio.synth import SynthConstants

    # Fail fast (instead of hanging indefinitely) when the TPU relay is
    # unreachable: backend init is run on a watchdog thread.  An outage
    # observed in round 3 left jax.devices() blocked >25 min before
    # erroring; a driver-run bench should report the outage and exit.
    init_timeout = float(os.environ.get("VAUDIO_BENCH_INIT_TIMEOUT",
                                        "900"))
    import threading
    init_result = {}

    def _init_backend():
        try:
            init_result["devices"] = jax.devices()
        except Exception as e:
            init_result["error"] = e

    t = threading.Thread(target=_init_backend, daemon=True)
    t.start()
    t.join(timeout=init_timeout)
    if t.is_alive():
        log(f"bench: TPU backend init did not complete within "
            f"{init_timeout:.0f}s — relay/device unavailable; aborting "
            "(no JSON emitted; rerun when the backend is reachable)")
        os._exit(2)
    if "error" in init_result:
        log(f"bench: TPU backend init failed: {init_result['error']}")
        return 2
    log(f"bench: devices {init_result['devices']}")

    res = os.environ.get("VAUDIO_BENCH_RES", "1080x1920")
    h, w = (int(x) for x in res.split("x"))
    chunks = [int(x) for x in
              os.environ.get("VAUDIO_BENCH_CHUNKS", "16,128").split(",")]
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "12"))
    use_pallas = os.environ.get("VAUDIO_BENCH_PALLAS", "0") == "1"
    use_pallas_audio = os.environ.get("VAUDIO_BENCH_PALLAS_AUDIO",
                                      "0") == "1"
    use_pallas_pool = os.environ.get("VAUDIO_BENCH_PALLAS_POOL",
                                     "1") == "1"
    use_pallas_vision = os.environ.get("VAUDIO_BENCH_PALLAS_VISION",
                                       "0") == "1"
    matmul_irfft = os.environ.get("VAUDIO_BENCH_MATMUL_IRFFT", "0") == "1"
    matmul_ema = os.environ.get("VAUDIO_BENCH_MATMUL_EMA", "0") == "1"
    # Default "1" tracks the AuralizerConfig default (fast_hue_acos=True)
    # so bench.py measures what production runs.
    fast_acos = os.environ.get("VAUDIO_BENCH_FAST_ACOS", "1") == "1"
    quantize = os.environ.get("VAUDIO_BENCH_QUANTIZE", "0") == "1"
    quantize_int8 = os.environ.get("VAUDIO_BENCH_QUANTIZE_INT8",
                                   "0") == "1"
    channels = int(os.environ.get("VAUDIO_BENCH_CHANNELS", "2"))
    also_mono = os.environ.get("VAUDIO_BENCH_MONO", "1") == "1" \
        and channels == 2
    unroll = int(os.environ.get("VAUDIO_BENCH_UNROLL", "8"))
    scan_block = int(os.environ.get("VAUDIO_BENCH_SCAN_BLOCK", "8"))

    backend = jax.default_backend()
    dev = jax.devices()[0]
    log(f"bench: backend={backend} device={dev} frame={h}x{w} "
        f"chunks={chunks} pallas={use_pallas} pallas_audio="
        f"{use_pallas_audio} pallas_pool={use_pallas_pool} "
        f"pallas_vision={use_pallas_vision}")

    def measure(ch, mode="chunked"):
        """``mode``: 'chunked' = the chunk-batched pipeline (serial scan
        only for vision/EMA/phases, ONE frame-batched Pallas contraction
        for the heavy stage — runtime.chunked, measured 3x the scan path
        at 1080p); 'scan' = the per-frame lax.scan of frame_step (the
        streaming single-frame building block)."""
        cfg = AuralizerConfig(sample_rate=48000.0, use_pallas=use_pallas,
                              use_pallas_audio=use_pallas_audio,
                              use_pallas_pool=use_pallas_pool,
                              use_pallas_vision=use_pallas_vision,
                              use_matmul_irfft=matmul_irfft,
                              use_matmul_ema=matmul_ema,
                              fast_hue_acos=fast_acos,
                              quantize_mips=quantize,
                              quantize_mips_int8=quantize_int8,
                              channels=ch)
        consts = SynthConstants.create(cfg)
        window = jnp.asarray(hann_window_norm(cfg.nfft))
        params = default_params(cfg)
        if mode == "chunked":
            from vaudio.runtime.chunked import chunk_pipeline

        # lax.scan with a static length per chunk size.  (A dynamic-trip-
        # count fori_loop would need only one compile, but compiles
        # pathologically slowly on this toolchain; the second scan length
        # hits the remote compile cache and costs only seconds.)
        def bench_chunk(T, seed0):
            # Frames are uint8 (the camera-native ingest dtype; the step
            # normalizes on device) and DEVICE-RESIDENT before timing
            # starts: the measured region is exactly the frame->audio
            # pipeline, the steady-state serving configuration where
            # ingest DMA overlaps compute.  (Generating frames inside the
            # jit instead was measured to cost more than the whole
            # pipeline: f32 threefry ~0.13 ms/frame vs 0.10 ms of actual
            # work.)  Carries chain between calls, which defeats the
            # tunnel's identical-dispatch dedup.
            # Generate in <=8-frame slices: threefry's u32 intermediates
            # are 4x the u8 output and RESOURCE_EXHAUST the chip in one
            # shot at 4K x 64 frames (observed), let alone 1080p x 128.
            parts = []
            for i in range(0, T, 8):
                n = min(8, T - i)
                parts.append(jax.random.bits(
                    jax.random.PRNGKey(seed0 + 7919 * i),
                    (n, h, w, 3), jnp.uint8))
            frames = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                      else parts[0])
            del parts
            jax.block_until_ready(frames)

            if mode == "chunked":
                @jax.jit
                def scan_chunk(carry, frames):
                    return chunk_pipeline(carry, frames, params, cfg,
                                          consts, window)
            elif scan_block > 1:
                from vaudio.runtime.chunked import blocked_pipeline

                @jax.jit
                def scan_chunk(carry, frames):
                    return blocked_pipeline(carry, frames, params, cfg,
                                            consts, window,
                                            block=scan_block)
            else:
                @jax.jit
                def scan_chunk(carry, frames):
                    def body(c, f):
                        return frame_step(c, f, params, cfg, consts,
                                          window)
                    # unroll lets XLA overlap kernels across iterations —
                    # the single-stream step is scheduling-gap-bound.
                    return jax.lax.scan(body, carry, frames,
                                        unroll=unroll)

            carry = init_carry(cfg)
            t0 = time.perf_counter()
            carry, outs = scan_chunk(carry, frames)
            jax.block_until_ready(outs["pcm"])
            log(f"bench[ch={ch},{mode}]: chunk{T} first call (incl. "
                f"compile) {time.perf_counter() - t0:.1f}s")
            # MIN of two timed loops: host pauses (GC, relay hiccups —
            # worst on 1-vCPU containers) only ever INFLATE a loop, so
            # the min is the better estimator of the true per-call time.
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for i in range(iters):
                    carry, outs = scan_chunk(carry, frames)
                jax.block_until_ready(outs["pcm"])
                best = min(best,
                           (time.perf_counter() - t0) / iters * 1e3)
            return best  # ms/call

        # The tunnel's per-call latency jitters by milliseconds between
        # runs; at the original 48-frame delta that was the same
        # magnitude as the signal (BENCH_r02 rep2 collapsed to
        # 4 us/frame), hence the 112-frame default delta AND the
        # MEDIAN of several interleaved slope estimates (compiles are
        # shared; each extra estimate is only `iters` timed calls).
        #
        # Per-PROCESS seed salt: the carry chain defeats dedup WITHIN a
        # run, but with fixed seeds the whole dispatch sequence is
        # byte-identical across bench runs of the same build, and the
        # relay's dedup spans processes — repeat runs measured partially
        # deduped (free) dispatches, inflating results by up to 6%
        # (and once yielding an absurd 5815x mono). Salting the RNG
        # seeds makes every run's chain unique.
        n_reps = int(os.environ.get("VAUDIO_BENCH_SLOPE_REPS", "3"))
        max_reps = int(os.environ.get("VAUDIO_BENCH_MAX_REPS", "8"))
        salt = (time.time_ns() ^ os.getpid()) % (1 << 20)
        import statistics

        # Adaptive reps with positive-slope filtering: a noisy host or a
        # relay hiccup can inflate EITHER endpoint of a slope pair, so a
        # single rep can come out negative (observed on a 1-vCPU host:
        # mono median -1 us/frame — nonsense that must never reach the
        # artifact).  Keep sampling until >= 3 positive slopes agree
        # within 40% of their median, or the rep budget runs out; the
        # reported number is the median of the positive slopes.
        slopes: list = []
        rep = 0
        stable = False

        def mid3(ss):
            v = sorted(s for s in ss if s > 0)
            return v[(len(v) - 3) // 2:][:3] if len(v) >= 3 else v

        while True:
            t_small = bench_chunk(chunks[0], salt + rep)
            t_big = bench_chunk(chunks[1], salt + 1000 + rep)
            ms = (t_big - t_small) / (chunks[1] - chunks[0])
            log(f"bench[ch={ch},{mode}] rep{rep}: "
                f"chunk{chunks[0]}={t_small:.1f}ms "
                f"chunk{chunks[1]}={t_big:.1f}ms -> {ms * 1e3:.0f} "
                f"us/frame")
            slopes.append(ms)
            rep += 1
            valid = sorted(s for s in slopes if s > 0)
            if rep >= n_reps and len(valid) >= 3:
                med = statistics.median(valid)
                mid = mid3(slopes)
                if (mid[-1] - mid[0]) <= 0.4 * med:
                    stable = True
                    break
                log(f"bench[ch={ch},{mode}]: slopes unstable "
                    f"({[round(s * 1e3) for s in valid]} us) — extra rep")
            if rep >= max_reps:
                break
        valid = [s for s in slopes if s > 0]
        fallback = False
        if valid:
            # Median of the middle-3 positive slopes: identical to the
            # plain median when the stability gate passed, outlier-
            # trimmed when it never did (so a noise-deflated-but-
            # positive slope can't drag the reported number; ADVICE r04).
            ms_per_frame = statistics.median(mid3(slopes))
        else:
            # Last resort (every slope came out <= 0): report the best
            # whole-call time per frame at the large chunk — an honest
            # UPPER bound (includes per-dispatch overhead), never
            # garbage-negative.
            fallback = True
            ms_per_frame = bench_chunk(chunks[1], salt + 4242) / chunks[1]
        fps = 1000.0 / ms_per_frame
        rtf = fps / cfg.video_fps
        if fallback:
            log(f"bench[ch={ch},{mode}]: all {rep} slopes non-positive; "
                f"per-call UPPER BOUND {ms_per_frame:.3f} ms/frame "
                f"(NOT a slope) -> {fps:.0f} frames/s = {rtf:.1f}x "
                f"realtime @30fps")
        else:
            log(f"bench[ch={ch},{mode}]: median {ms_per_frame:.3f} "
                f"ms/frame over {len(valid)}/{rep} slopes "
                f"({'stable' if stable else 'UNSTABLE'}) -> "
                f"{fps:.0f} frames/s = {rtf:.1f}x "
                f"realtime @30fps; audio out "
                f"{fps * cfg.hop_size * ch / 1e6:.2f} Msamples/s")
        quality = {"slopes_us": [round(s * 1e3, 2) for s in slopes],
                   "valid_reps": len(valid), "stable": stable,
                   "fallback_upper_bound": fallback}
        return rtf, ms_per_frame, quality

    rtf, ms_per_frame, quality = measure(channels, "chunked")
    # Machine-checkable roofline claim (docs/BENCHMARKS.md "Where the
    # 0.037 ms goes"): the static floor is the u8 frame read out of HBM
    # (bytes / peak BW; v5e ~819 GB/s, override via VAUDIO_BENCH_HBM_GBS)
    # plus the parity-mandated spectrum peak evaluation (~1.0 M
    # windowed-sinc evals/frame, VPU-bound, measured 10 us by stub
    # substitution).  pct_of_floor = floor / measured — 100% would be
    # speed-of-light for this workload's exact math.
    hbm_gbs_peak = float(os.environ.get("VAUDIO_BENCH_HBM_GBS", "819"))
    frame_bytes = h * w * 3
    frame_read_floor_us = frame_bytes / (hbm_gbs_peak * 1e3)
    spectrum_floor_us = 10.0
    static_floor_us = frame_read_floor_us + spectrum_floor_us
    us_per_frame = ms_per_frame * 1e3
    record = {
        "metric": ("realtime_factor_1080p30_to_48kHz_stereo_per_chip"
                   if channels == 2 else
                   "realtime_factor_1080p30_to_48kHz_per_chip"),
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 3),
        "us_per_frame": round(us_per_frame, 2),
        "static_floor_us": round(static_floor_us, 2),
        "pct_of_floor": round(100.0 * static_floor_us / us_per_frame, 1),
        "ingest_hbm_gbs": round(frame_bytes / (us_per_frame * 1e3), 1),
        # Measurement-quality markers (ADVICE r04): a degraded-host
        # fallback or an unstable median must be distinguishable from a
        # clean slope measurement downstream.
        "stable": quality["stable"],
        "valid_reps": quality["valid_reps"],
        "slopes_us": quality["slopes_us"],
    }
    if quality["fallback_upper_bound"]:
        record["fallback_upper_bound"] = True
    if quantize:
        record["quantize_mips"] = True   # strict-parity 8-bit mip chain
    if os.environ.get("VAUDIO_BENCH_SCAN", "1") == "1":
        s_rtf, _, s_q = measure(channels, "scan")
        record["scan_path_x_realtime"] = round(s_rtf, 2)
        record["scan_stable"] = s_q["stable"]
        # Dispatch granularity of the sequential scan measured above
        # (>1 = blocked sub-chunks; the pure per-frame number lives in
        # benchmarks/AB_FLAGS_r05_scan.json as scan_default).
        record["scan_block"] = scan_block
    if also_mono:
        m_rtf, _, m_q = measure(1, "chunked")
        record["mono_x_realtime"] = round(m_rtf, 2)
        record["mono_stable"] = m_q["stable"]
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
