#!/usr/bin/env python
"""Slope-based component profiling.

The axon tunnel dedupes identical dispatches and adds ~5 ms per call, so
per-call timing lies.  This harness scans a component over T distinct
inputs inside ONE jit and reports the slope between two T values — the true
marginal per-iteration device cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def slope_time(make_inputs, fn, t_small=4, t_big=16, iters=4):
    """Time fn scanned over T inputs; returns marginal ms/iteration.

    make_inputs(T) -> pytree with leading T axis; fn(x_t) -> array(s).
    """
    def run(T):
        xs = make_inputs(T)

        @jax.jit
        def scanned(acc, xs):
            def body(c, x):
                out = fn(x)
                # fold output into carry so nothing is DCE'd
                s = jax.tree.reduce(
                    lambda a, b: a + b,
                    jax.tree.map(lambda o: jnp.sum(o.astype(jnp.float32)),
                                 out))
                return c + s, ()
            c, _ = jax.lax.scan(body, acc, xs)
            return c * jnp.float32(1e-6)
        # Chain the accumulator through every call: each dispatch has
        # distinct inputs, defeating the remote runtime's dedup cache.
        acc = scanned(jnp.float32(0.0), xs)
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = scanned(acc, xs)
        jax.block_until_ready(acc)
        return (time.perf_counter() - t0) / iters * 1e3

    ts = run(t_small)
    tb = run(t_big)
    return (tb - ts) / (t_big - t_small)


def main():
    from vaudio.config import AuralizerConfig
    from vaudio.vision import features as vf

    cfg = AuralizerConfig(sample_rate=48000.0)
    h, w = (1080, 1920)
    key = jax.random.PRNGKey((time.time_ns() ^ os.getpid()) % (1 << 20))  # cross-run dedup salt (CLAUDE.md)

    def frames(T):
        return jax.random.uniform(key, (T, h, w, 3), jnp.float32)

    def planes(T):
        return jax.random.uniform(key, (T, 3, h, w), jnp.float32)

    def mips(T):
        return jax.random.uniform(key, (T, 3, h // 8, w // 8), jnp.float32)

    results = {}
    results["transpose(2,0,1)"] = slope_time(
        frames, lambda f: jnp.transpose(f, (2, 0, 1)))
    results["mip_planes"] = slope_time(
        planes, lambda p: vf.mip_downsample_planes(p, 3))
    results["hsi_planes"] = slope_time(
        mips, lambda m: jnp.stack(vf.rgb_to_hsi_planes(m[0], m[1], m[2])))
    results["histogram"] = slope_time(
        mips, lambda m: vf.hue_histogram_planes(
            *vf.rgb_to_hsi_planes(m[0], m[1], m[2]), cfg))
    results["stencil+grads"] = slope_time(
        mips, lambda m: vf.cell_gradient_stats_planes(
            vf.feature_stencil_plane(m[2]), cfg))
    results["extract_features"] = slope_time(
        frames, lambda f: vf.extract_features(
            f, jnp.zeros(16, jnp.int32), jnp.float32(0.9), cfg)[:2])

    for k, v in results.items():
        print(f"{k:22s} {v:8.3f} ms/frame")


if __name__ == "__main__":
    main()
