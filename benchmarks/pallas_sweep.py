#!/usr/bin/env python
"""Pallas-vs-XLA sweep for the spectrum synthesis stage.

Isolates the heavy stage — raw spectrum contraction spectrum[F, K] =
W(d) @ weights for NP = 496 partials over F = 2047 bins — and measures
the per-frame cost under each execution shape:

* ``jnp_scan``      one XLA-fused contraction per frame in lax.scan;
* ``pallas_scan``   one pallas_call per frame in lax.scan
                    (per-invocation overhead exposed);
* ``jnp_batch``     one big XLA contraction over T frames at once;
* ``pallas_batch``  one pallas_call with a (T, bins) grid.

Methodology (v2 — supersedes the round-2 artifact): marginal per-frame
time is the SLOPE between two chunk sizes, with every dispatch CHAINED
through an accumulator that feeds back into the next call's inputs
(pf + acc*1e-12).  The chain defeats both the tunnel's identical-dispatch
dedup AND cross-call overlap, so the number is true serial latency per
frame — the quantity the pipeline actually pays.  The first version of
this harness timed individual ~5 ms tunnel calls with varied inputs and
took medians; the sub-millisecond kernel signal drowned in dispatch
noise and produced a bogus 3.5 us/frame for pallas_batch (55 G
transcendentals/s — not physical for a VPU).  Numbers from this harness
land at ~20-25 ops/element, which is physically plausible for a VPU
running a transcendental-heavy inner loop.

Prints one JSON line and writes benchmarks/PALLAS_SWEEP.json.
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

    import _common
    _common.enable_compile_cache()

    from vaudio.config import AuralizerConfig
    from vaudio.dsp import hann_sinc_peak_fast
    from vaudio.ops import (hann_peak_weighted_sum,
                            hann_peak_weighted_sum_batched)

    cfg = AuralizerConfig(sample_rate=48000.0)
    F = cfg.num_bins
    NP = 496
    K = int(os.environ.get("VAUDIO_SWEEP_K", "2"))
    freqs = jnp.asarray(cfg.bin_frequencies())
    hann_mult = np.float32(1.0 / cfg.bin_width)
    interpret = jax.default_backend() == "cpu"
    T_LO, T_HI = (int(x) for x in
                  os.environ.get("VAUDIO_BENCH_CHUNKS", "16,64").split(","))
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "8"))

    def gen(T, seed):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        pf = jax.random.uniform(k1, (T, NP), jnp.float32, 100.0, 20000.0)
        scale = hann_mult * jnp.where(
            jax.random.bernoulli(k3, 0.2, (T, NP)),
            jnp.float32(0.2), jnp.float32(1.0))
        w = 0.1 * jax.random.normal(k2, (T, NP, K), jnp.float32)
        return pf, scale, w

    def measure(fn, label):
        """fn(acc, pf, scale, w) -> finite acc.  Chained serial slope."""
        def run(T, seed):
            args = gen(T, seed)
            jax.block_until_ready(args)
            step = jax.jit(fn)
            acc = step(jnp.float32(0.0), *args)
            jax.block_until_ready(acc)
            t0 = time.perf_counter()
            for _ in range(iters):
                acc = step(acc, *args)
            jax.block_until_ready(acc)
            assert np.isfinite(float(acc)), f"{label}: acc non-finite"
            return (time.perf_counter() - t0) / iters * 1e3

        t_lo = run(T_LO, 5)
        t_hi = run(T_HI, 1005)
        ms = (t_hi - t_lo) / (T_HI - T_LO)
        log(f"{label}: {t_lo:.2f} ms @T={T_LO}, {t_hi:.2f} ms @T={T_HI} "
            f"-> {ms * 1e3:.1f} us/frame")
        return ms

    def finite(x):
        return jnp.tanh(jnp.nan_to_num(x, 0.0, 0.0, 0.0) * 1e-9)

    def jnp_contract(pf, scale, w):
        d = (freqs[:, None] - pf[None, :]) * scale[None, :]
        W = hann_sinc_peak_fast(d)
        return jax.lax.dot_general(
            W, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # match production
        # (synth.contract_spectrum pins HIGHEST; the Pallas arm always
        # ran exact f32 — both arms must measure the same math)

    results = {}

    # --- per-frame paths inside lax.scan (compiled loop, one dispatch) ---
    def scan_jnp(acc, pf, scale, w):
        def body(c, x):
            return c + finite(jnp.sum(jnp_contract(x[0] + c * 1e-12,
                                                   x[1], x[2]))), ()
        return jax.lax.scan(body, acc, (pf, scale, w))[0]

    def scan_pallas(acc, pf, scale, w):
        def body(c, x):
            out = hann_peak_weighted_sum(freqs, x[0] + c * 1e-12, x[1],
                                         x[2], num_bins=F,
                                         interpret=interpret)
            return c + finite(jnp.sum(out)), ()
        return jax.lax.scan(body, acc, (pf, scale, w))[0]

    results["jnp_scan_ms_per_frame"] = measure(scan_jnp, "jnp scan")
    results["pallas_scan_ms_per_frame"] = measure(scan_pallas,
                                                  "pallas scan")

    # --- batched paths: all T frames in one dispatch, no scan ---
    def batch_jnp(acc, pf, scale, w):
        out = jax.vmap(jnp_contract)(pf + acc * 1e-12, scale, w)
        return acc + finite(jnp.sum(out))

    def batch_pallas(acc, pf, scale, w):
        out = hann_peak_weighted_sum_batched(freqs, pf + acc * 1e-12,
                                             scale, w, num_bins=F,
                                             interpret=interpret)
        return acc + finite(jnp.sum(out))

    results["jnp_batch_ms_per_frame"] = measure(batch_jnp, "jnp batch")
    results["pallas_batch_ms_per_frame"] = measure(batch_pallas,
                                                   "pallas batch")

    wins = {k: v for k, v in results.items() if k.startswith("pallas")
            and results[k.replace("pallas", "jnp")] > v}
    artifact = {
        "backend": str(jax.devices()[0]),
        "stage": f"spectrum contraction (F={F}, NP={NP}, K={K})",
        "methodology": "chained-slope v2 (serial latency; see docstring)",
        "results_ms_per_frame": {k: round(v, 4)
                                 for k, v in results.items()},
        "pallas_wins": sorted(wins),
    }
    print(json.dumps(artifact))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"PALLAS_SWEEP{'' if K == 2 else '_K%d' % K}.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
