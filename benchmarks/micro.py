#!/usr/bin/env python
"""Per-stage microbenchmarks on the current backend.

Times each pipeline stage in isolation (jitted, steady-state) to locate the
frame-step bottleneck.  Run on TPU: ``python benchmarks/micro.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=50, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from vaudio.config import AuralizerConfig, LiveParams
    from vaudio.dsp import agc_normalize, hann_window_norm, irfft_from_half, \
        overlap_add
    from vaudio.synth import SynthConstants, build_spectrum, phase_accumulate
    from vaudio.vision import features as vf
    from vaudio.vision import extract_features

    cfg = AuralizerConfig(sample_rate=48000.0)
    consts = SynthConstants.create(cfg)
    window = jnp.asarray(hann_window_norm(cfg.nfft))
    h, w = (1080, 1920) if len(sys.argv) < 2 else \
        (int(x) for x in sys.argv[1].split("x"))

    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (h, w, 3), jnp.float32)
    hues = jnp.zeros(16, jnp.int32)
    grads = jnp.full((16, 4), 0.2, jnp.float32)
    phases = jnp.zeros((16, 32), jnp.float32)
    prev = jnp.zeros((cfg.num_bins, 2), jnp.float32)
    signal = jax.random.normal(key, (cfg.nfft,), jnp.float32)
    tail = jnp.zeros((cfg.nfft,), jnp.float32)

    mip = jax.jit(lambda f: vf.mip_downsample(f, cfg.mip_level))
    print(f"mip_downsample      {timeit(mip, frame):8.3f} ms")

    mip_img = mip(frame)
    hsi = jax.jit(vf.rgb_to_hsi)
    print(f"rgb_to_hsi          {timeit(hsi, mip_img):8.3f} ms")

    hsi_img = hsi(mip_img)
    hsi_rot = vf.rotate_cw(hsi_img)
    for method in ("matmul", "scatter"):
        fn = jax.jit(lambda x, m=method: vf.hue_histogram(x, cfg, method=m))
        print(f"hue_histogram:{method:8s}{timeit(fn, hsi_rot):8.3f} ms")

    sten = jax.jit(vf.feature_stencil)
    print(f"feature_stencil     {timeit(sten, hsi_img):8.3f} ms")

    feats = vf.rotate_cw(sten(hsi_img))
    gstat = jax.jit(lambda x: vf.cell_gradient_stats(x, cfg))
    print(f"cell_grad_stats     {timeit(gstat, feats[..., 2, :]):8.3f} ms")

    vis = jax.jit(lambda f, h: extract_features(f, h, jnp.float32(0.9),
                                                cfg)[:2])
    print(f"extract_features    {timeit(vis, frame, hues):8.3f} ms")

    pacc = jax.jit(lambda p, h: phase_accumulate(p, h, cfg, consts))
    print(f"phase_accumulate    {timeit(pacc, phases, hues):8.3f} ms")

    for use_pallas in (False, True):
        fn = jax.jit(lambda hu, g, p, pr, up=use_pallas: build_spectrum(
            hu, g, p, pr, jnp.float32(0.9), cfg, consts, use_pallas=up))
        label = "pallas" if use_pallas else "jnp"
        try:
            print(f"build_spectrum:{label:5s}{timeit(fn, hues, grads, phases, prev):8.3f} ms")
        except Exception as e:
            print(f"build_spectrum:{label:5s} FAILED: {e}")

    spec = build_spectrum(hues, grads, phases, prev, jnp.float32(0.9), cfg,
                          consts)
    ifft = jax.jit(lambda s: irfft_from_half(s[:, 0], s[:, 1]))
    print(f"irfft               {timeit(ifft, spec):8.3f} ms")

    agc = jax.jit(lambda s: agc_normalize(s, jnp.float32(1.0),
                                          jnp.float32(1.0), jnp.float32(1.0)))
    print(f"agc                 {timeit(agc, signal):8.3f} ms")

    ola = jax.jit(lambda s, t: overlap_add(s, t, window))
    print(f"overlap_add         {timeit(ola, signal, tail):8.3f} ms")

    # Full step (scan-free single dispatch)
    from vaudio.runtime import make_step, init_carry
    step = make_step(cfg)
    carry = init_carry(cfg)
    params = LiveParams().as_arrays()

    def full(frame):
        c, out = step(init_carry(cfg), frame, params)
        return out["pcm"]
    # time with fresh carry to avoid donation invalidation
    print(f"full step (dispatch){timeit(full, frame, iters=20):8.3f} ms")


if __name__ == "__main__":
    main()
