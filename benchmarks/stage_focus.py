#!/usr/bin/env python
"""Focused slope measurements of individual chunk-pipeline stages (TPU).

Dedup defense: every variant's INPUT depends on a carried accumulator
(x + acc * 1e-12), so successive dispatches are never byte-identical and
form a serial chain — per CLAUDE.md the tunnel dedupes identical
dispatches and per-call timing of pure functions lies.

Prints marginal us/frame for:
  contraction_pallas / contraction_jnp (K=4, the stereo chunk shape)
  vision_full (frame_stats on u8 1080p)  + its pieces:
  vision_mip, vision_hsi, vision_hist, vision_grads

Env: VAUDIO_BENCH_RES, VAUDIO_BENCH_CHUNKS, VAUDIO_BENCH_ITERS.
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
    from vaudio.ops import hann_peak_weighted_sum_batched
    from vaudio.dsp import hann_sinc_peak_fast
    from vaudio.vision import features as vf

    res = os.environ.get("VAUDIO_BENCH_RES", "1080x1920")
    h, w = (int(x) for x in res.split("x"))
    chunks = [int(x) for x in
              os.environ.get("VAUDIO_BENCH_CHUNKS", "16,64").split(",")]
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "8"))
    cfg = AuralizerConfig(sample_rate=48000.0, channels=2)
    F = cfg.num_bins
    NP = 496
    K = 4
    freqs = jnp.asarray(cfg.bin_frequencies())

    def measure(label, make_inputs, fn):
        """fn(acc, *inputs) -> new finite acc scalar."""
        def bench_chunk(T, seed):
            inputs = make_inputs(T, seed)
            jax.block_until_ready(inputs)
            step = jax.jit(fn)
            acc = jnp.float32(0.0)
            acc = step(acc, *inputs)
            jax.block_until_ready(acc)
            t0 = time.perf_counter()
            for _ in range(iters):
                acc = step(acc, *inputs)
            jax.block_until_ready(acc)
            if not np.isfinite(float(acc)):
                print(f"  WARNING {label}: acc went non-finite "
                      f"(dedup defense broken)", flush=True)
            return (time.perf_counter() - t0) / iters * 1e3

        salt = (time.time_ns() ^ os.getpid()) % (1 << 20)  # defeat the
        # relay's CROSS-RUN dedup (identical seeds -> identical chains)
        t_small = bench_chunk(chunks[0], salt + 3)
        t_big = bench_chunk(chunks[1], salt + 1003)
        us = (t_big - t_small) / (chunks[1] - chunks[0]) * 1e3
        print(f"{label:20s} {us:8.1f} us/frame  (chunk{chunks[0]}="
              f"{t_small:.2f}ms chunk{chunks[1]}={t_big:.2f}ms)",
              flush=True)
        return us

    def finite(x):
        return jnp.tanh(jnp.nan_to_num(x, 0.0, 0.0, 0.0) * 1e-9)

    # ---- contraction, K=4 ----
    def contraction_inputs(T, seed):
        k = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(k, 3)
        pf = jax.random.uniform(k1, (T, NP), jnp.float32, 100.0, 20000.0)
        wts = jax.random.normal(k2, (T, NP, K), jnp.float32)
        ibw = jnp.broadcast_to(
            jnp.where(jax.random.bernoulli(k3, 0.2, (T, NP)),
                      jnp.float32(0.2), jnp.float32(1.0)), (T, NP))
        return pf, wts, ibw

    hann_mult = np.float32(1.0 / cfg.bin_width)

    def pallas_fn(acc, pf, wts, ibw):
        out = hann_peak_weighted_sum_batched(
            freqs, pf + acc * 1e-12, ibw * hann_mult, wts, num_bins=F)
        return acc + finite(jnp.sum(out))

    def jnp_fn(acc, pf, wts, ibw):
        def one(pf1, scale1, w1):
            d = (freqs[:, None] - pf1[None, :]) * scale1[None, :]
            W = hann_sinc_peak_fast(d)
            return jax.lax.dot_general(
                W, w1, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # match production
        out = jax.vmap(one)(pf + acc * 1e-12, ibw * hann_mult, wts)
        return acc + finite(jnp.sum(out))

    # VAUDIO_STAGES: comma list filtering which measurements run (each
    # isolated graph costs minutes of remote compile on first run).
    stages = os.environ.get("VAUDIO_STAGES", "all")

    def want(name):
        return stages == "all" or name in stages.split(",")

    if want("contraction"):
        measure("contraction_pallas", contraction_inputs, pallas_fn)
        measure("contraction_jnp", contraction_inputs, jnp_fn)

    # ---- vision stats on u8 frames ----
    def frames_u8(T, seed):
        return (jax.random.bits(jax.random.PRNGKey(seed), (T, h, w, 3),
                                jnp.uint8),)

    # Chain through the REDUCTION, never the frames: XORing the carry
    # into the u8 input forces a fresh 200 MB temp per call and produced
    # pathological 25 s/call timings (see pool_compare below).
    def vision_full(acc, frames):
        hists, grads = jax.vmap(lambda f: vf.frame_stats(f, cfg)[:2])(
            frames)
        return jnp.tanh(acc + finite(jnp.sum(hists.astype(jnp.float32))
                                     + jnp.sum(grads)))

    def mip_only(acc, frames):
        planes = jnp.transpose(frames, (0, 3, 1, 2))
        mips = jax.vmap(lambda p: vf.mip_downsample_planes(
            p, cfg.mip_level, scale=1.0 / 255.0))(planes)
        return jnp.tanh(acc + finite(jnp.sum(mips)))

    def mips_dev(T, seed):
        return (jax.random.uniform(jax.random.PRNGKey(seed),
                                   (T, 3, h >> 3, w >> 3), jnp.float32),)

    def hsi_only(acc, mips):
        mips = mips + acc * 1e-12
        out = jax.vmap(lambda m: jnp.stack(
            vf.rgb_to_hsi_planes(m[0], m[1], m[2])))(mips)
        return acc + finite(jnp.sum(out))

    def hist_only(acc, mips):
        mips = mips + acc * 1e-12
        out = jax.vmap(lambda m: vf.hue_histogram_planes(
            *vf.rgb_to_hsi_planes(m[0], m[1], m[2]), cfg))(mips)
        return acc + finite(jnp.sum(out.astype(jnp.float32)))

    def grads_only(acc, mips):
        mips = mips + acc * 1e-12
        out = jax.vmap(lambda m: vf.cell_gradient_stats_planes(
            vf.feature_stencil_plane(m[2]), cfg))(mips)
        return acc + finite(jnp.sum(out))

    if want("vision"):
        measure("vision_full_u8", frames_u8, vision_full)
        measure("vision_mip_u8", frames_u8, mip_only)
        measure("vision_hsi", mips_dev, hsi_only)
        measure("vision_hsi+hist", mips_dev, hist_only)
        measure("vision_grads", mips_dev, grads_only)


def pool_compare():
    """Slope-compare the fused Pallas mip-pool kernel vs the XLA path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vaudio.ops import mip_pool_pallas
    from vaudio.vision import features as vf

    res = os.environ.get("VAUDIO_BENCH_RES", "1080x1920")
    h, w = (int(x) for x in res.split("x"))
    chunks = [int(x) for x in
              os.environ.get("VAUDIO_BENCH_CHUNKS", "32,128").split(",")]
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "8"))

    def measure(label, fn):
        # Chain the accumulator through the REDUCTION only (bench.py's
        # validated pattern: frames stay constant device buffers, the
        # carry makes every dispatch unique so the relay can't dedup).
        # An earlier variant XORed acc into the frames; that forced a
        # fresh 200 MB u8 temp per call and produced pathological
        # 25 s/call timings at chunk 32 — never perturb the large input.
        def bench_chunk(T, seed):
            frames = jax.random.bits(jax.random.PRNGKey(seed),
                                     (T, 3, h, w), jnp.uint8)
            jax.block_until_ready(frames)
            step = jax.jit(fn)
            acc = step(jnp.float32(0.0), frames)
            jax.block_until_ready(acc)
            t0 = time.perf_counter()
            for _ in range(iters):
                acc = step(acc, frames)
            jax.block_until_ready(acc)
            assert np.isfinite(float(acc))
            return (time.perf_counter() - t0) / iters * 1e3

        salt = (time.time_ns() ^ os.getpid()) % (1 << 20)
        t_small = bench_chunk(chunks[0], salt + 11)
        t_big = bench_chunk(chunks[1], salt + 1011)
        us = (t_big - t_small) / (chunks[1] - chunks[0]) * 1e3
        print(f"{label:20s} {us:8.1f} us/frame  (chunk{chunks[0]}="
              f"{t_small:.2f}ms chunk{chunks[1]}={t_big:.2f}ms)",
              flush=True)

    def xla_pool(acc, frames):
        out = jax.vmap(lambda p: vf.mip_downsample_planes(
            p, 3, scale=1.0 / 255.0))(frames)
        return jnp.tanh(acc + jnp.sum(out) * 1e-9)

    def pallas_pool(acc, frames):
        out = jax.vmap(lambda p: mip_pool_pallas(
            p, 3, scale=1.0 / 255.0))(frames)
        return jnp.tanh(acc + jnp.sum(out) * 1e-9)

    measure("pool_xla", xla_pool)
    measure("pool_pallas", pallas_pool)


if __name__ == "__main__":
    if os.environ.get("VAUDIO_FOCUS") == "pool":
        pool_compare()
    else:
        main()
