#!/usr/bin/env python
"""Pallas-vs-XLA sweep for the spectrum synthesis stage (VERDICT r1
item 6: find the configuration where the Pallas kernel earns its place,
or produce the decisive measurement that it doesn't).

Isolates the heavy stage — raw spectrum contraction spectrum[F, K] =
W(d) @ weights for NP = 496 partials over F = 2047 bins — and measures
the per-frame cost under each execution shape:

* ``jnp_scan``      one XLA-fused contraction per frame in lax.scan
                    (the shipped default path);
* ``pallas_scan``   one pallas_call per frame in lax.scan (the shipped
                    use_pallas=True path, per-invocation overhead exposed);
* ``jnp_batch_T``   one big XLA contraction over T frames at once;
* ``pallas_batch_T``one pallas_call with a (T, bins) grid — the
                    per-invocation overhead amortized T-fold.

All timings use the SLOPE method (two frame counts per path, marginal
per-frame time = delta/delta-frames): the CI tunnel adds ~25-30 ms of
fixed per-dispatch cost that otherwise swamps the tens-of-microseconds
kernel differences.  Varied inputs defeat the tunnel's dedup; compile
excluded.  Prints one JSON line and writes benchmarks/PALLAS_SWEEP.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("VAUDIO_JAX_CACHE", "/root/repo/.jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from vaudio.config import AuralizerConfig
    from vaudio.dsp import hann_sinc_peak_fast
    from vaudio.ops import (hann_peak_weighted_sum,
                            hann_peak_weighted_sum_batched)

    cfg = AuralizerConfig(sample_rate=48000.0)
    F = cfg.num_bins
    NP = 496
    freqs = jnp.asarray(cfg.bin_frequencies())
    hann_mult = np.float32(1.0 / cfg.bin_width)
    interpret = jax.default_backend() == "cpu"

    rng = np.random.default_rng(0)

    def gen(T):
        pf = rng.uniform(20, 20000, (T, NP)).astype(np.float32)
        scale = (hann_mult * rng.choice([1.0, 0.2], (T, NP))
                 ).astype(np.float32)
        w = rng.normal(0, 0.1, (T, NP, 2)).astype(np.float32)
        return jnp.asarray(pf), jnp.asarray(scale), jnp.asarray(w)

    def timeit(fn, args_list):
        """Median wall time over varied pre-staged inputs."""
        out = fn(*args_list[0])                       # compile
        jax.block_until_ready(out)
        times = []
        for args in args_list[1:]:
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) * 1e3          # ms/call

    def jnp_contract(pf, scale, w):
        d = (freqs[:, None] - pf[None, :]) * scale[None, :]
        W = hann_sinc_peak_fast(d)
        return jax.lax.dot_general(
            W, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    results = {}
    T_LO, T_HI = 32, 256
    n_reps = 8

    def marginal(fn, label):
        """Slope ms/frame between T_LO- and T_HI-frame dispatches."""
        lo_args = [gen(T_LO) for _ in range(n_reps)]
        hi_args = [gen(T_HI) for _ in range(n_reps)]
        t_lo = timeit(fn, lo_args)
        t_hi = timeit(fn, hi_args)
        ms = (t_hi - t_lo) / (T_HI - T_LO)
        log(f"{label}: {t_lo:.2f} ms @T={T_LO}, {t_hi:.2f} ms @T={T_HI} "
            f"-> {ms * 1e3:.1f} us/frame")
        return ms

    # --- per-frame paths inside lax.scan (compiled loop, one dispatch) ---
    @jax.jit
    def scan_jnp(pf, scale, w):
        def body(c, x):
            return c, jnp_contract(*x)
        return jax.lax.scan(body, 0, (pf, scale, w))[1]

    @jax.jit
    def scan_pallas(pf, scale, w):
        def body(c, x):
            return c, hann_peak_weighted_sum(freqs, x[0], x[1], x[2],
                                             num_bins=F,
                                             interpret=interpret)
        return jax.lax.scan(body, 0, (pf, scale, w))[1]

    results["jnp_scan_ms_per_frame"] = marginal(scan_jnp, "jnp scan")
    results["pallas_scan_ms_per_frame"] = marginal(scan_pallas,
                                                   "pallas scan")

    # --- batched paths: all T frames in one dispatch, no scan ---
    @jax.jit
    def batch_jnp(pf, scale, w):
        return jax.vmap(jnp_contract)(pf, scale, w)

    def batch_pallas(pf, scale, w):
        return hann_peak_weighted_sum_batched(freqs, pf, scale, w,
                                              num_bins=F,
                                              interpret=interpret)

    results["jnp_batch_ms_per_frame"] = marginal(batch_jnp, "jnp batch")
    results["pallas_batch_ms_per_frame"] = marginal(batch_pallas,
                                                    "pallas batch")

    wins = {k: v for k, v in results.items() if k.startswith("pallas")
            and results[k.replace("pallas", "jnp")] > v}
    artifact = {
        "backend": str(jax.devices()[0]),
        "stage": "spectrum contraction (F=2047, NP=496, K=2)",
        "results_ms_per_frame": {k: round(v, 4)
                                 for k, v in results.items()},
        "pallas_wins": sorted(wins),
    }
    print(json.dumps(artifact))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "PALLAS_SWEEP.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
