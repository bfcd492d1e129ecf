#!/usr/bin/env python
"""IRFFT-vs-matmul-IDFT slope experiment (TPU).

The substitution profile (docs/BENCHMARKS.md) prices the batched 4096-pt
irfft at ~5 us/frame — XLA's TPU FFT is the weakest of the remaining
stages.  The classic TPU alternative is to put the transform on the MXU:

* ``dense``    — x = re @ C - im @ S with C/S the (F, N) inverse-DFT
  cosine/sine matrices (67 MB of f32 weights; read once per chunk, so
  ~1.3 us/frame of HBM traffic amortized over T=64 frames + ~1 us of
  f32-HIGHEST MXU time).
* ``twostage`` — Cooley-Tukey N = 64x64: two complex (64, 64) matmul
  stages with twiddles (tiny weights, ~6 MFLOP/frame).

Measured with the chained-slope method (carry-perturbed inputs defeat
the relay dedup; marginal us/frame from two batch sizes), plus an f64
NumPy oracle accuracy audit of each variant.

Production shapes: half-spectra f32[T, ch, F] with F = 2047, N = 4096.

Env: VAUDIO_BENCH_CHUNKS (default 16,64), VAUDIO_BENCH_ITERS (8).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import _common
    _common.enable_compile_cache()

    import jax.numpy as jnp

    from vaudio.config import AuralizerConfig

    cfg = AuralizerConfig(sample_rate=48000.0, channels=2)
    F = cfg.num_bins                     # 2047
    N = cfg.nfft                         # 4096
    CH = cfg.channels
    chunks = [int(x) for x in
              os.environ.get("VAUDIO_BENCH_CHUNKS", "16,64").split(",")]
    iters = int(os.environ.get("VAUDIO_BENCH_ITERS", "8"))
    HI = jax.lax.Precision.HIGHEST

    # --- weights (f64 -> f32) --------------------------------------------
    k = np.arange(1, F + 1, dtype=np.float64)[:, None]
    n = np.arange(N, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / N
    Cd = jnp.asarray((2.0 / N) * np.cos(ang), jnp.float32)   # (F, N)
    Sd = jnp.asarray((2.0 / N) * np.sin(ang), jnp.float32)

    N1 = N2 = 64
    k1 = np.arange(N1, dtype=np.float64)
    n1 = np.arange(N1, dtype=np.float64)
    E1 = np.exp(2j * np.pi * np.outer(k1, n1) / N1)          # (k1, n1)
    k2 = np.arange(N2, dtype=np.float64)
    n2 = np.arange(N2, dtype=np.float64)
    E2 = np.exp(2j * np.pi * np.outer(k2, n2) / N2)          # (k2, n2)
    Tw = np.exp(2j * np.pi * np.outer(n1, k2) / N)           # (n1, k2)
    E1re, E1im = (jnp.asarray(E1.real, jnp.float32),
                  jnp.asarray(E1.imag, jnp.float32))
    E2re, E2im = (jnp.asarray(E2.real, jnp.float32),
                  jnp.asarray(E2.imag, jnp.float32))
    Twre, Twim = (jnp.asarray(Tw.real, jnp.float32),
                  jnp.asarray(Tw.imag, jnp.float32))

    # --- variants: half_re/half_im [..., F] -> pcm [..., N] --------------

    def irfft_fft(hre, him):
        zero = jnp.zeros(hre.shape[:-1] + (1,), jnp.complex64)
        half = hre.astype(jnp.complex64) + 1j * him.astype(jnp.complex64)
        rspec = jnp.concatenate([zero, half, zero], axis=-1)
        return jnp.fft.irfft(rspec, n=N, axis=-1).astype(jnp.float32)

    def irfft_dense(hre, him):
        return (jnp.matmul(hre, Cd, precision=HI)
                - jnp.matmul(him, Sd, precision=HI))

    def irfft_twostage(hre, him):
        # Hermitian closure to the full N-bin spectrum, then
        # x[n1 + 64*n2] = Re{ E2^T @ [ (E1^T-stage) * twiddle ] } / N
        # (1/N folded into the final real-part stage; 2/N shortcut does
        # not apply because the mirrored half carries the factor 2).
        zero = jnp.zeros(hre.shape[:-1] + (1,), jnp.float32)
        fre = jnp.concatenate([zero, hre, zero, hre[..., ::-1]], axis=-1)
        fim = jnp.concatenate([zero, him, zero, -him[..., ::-1]], axis=-1)
        Xre = fre.reshape(fre.shape[:-1] + (N1, N2))   # [.., k1, k2]
        Xim = fim.reshape(fim.shape[:-1] + (N1, N2))
        # stage 1: A[n1, k2] = sum_k1 X[k1, k2] E1[k1, n1]
        Are = (jnp.einsum("...kc,kn->...nc", Xre, E1re, precision=HI)
               - jnp.einsum("...kc,kn->...nc", Xim, E1im, precision=HI))
        Aim = (jnp.einsum("...kc,kn->...nc", Xre, E1im, precision=HI)
               + jnp.einsum("...kc,kn->...nc", Xim, E1re, precision=HI))
        # twiddle (n1, k2)
        Bre = Are * Twre - Aim * Twim
        Bim = Are * Twim + Aim * Twre
        # stage 2 (real part only): x[n1, n2] = sum_k2 B[n1,k2] E2[k2,n2]
        xmat = (jnp.einsum("...nc,cm->...nm", Bre, E2re, precision=HI)
                - jnp.einsum("...nc,cm->...nm", Bim, E2im, precision=HI))
        # n = n1 + N1*n2 -> swap to [.., n2, n1] then flatten
        x = jnp.swapaxes(xmat, -1, -2).reshape(xmat.shape[:-2] + (N,))
        return (x / N).astype(jnp.float32)

    # --- accuracy audit vs f64 oracle ------------------------------------
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    hre = rng.standard_normal((3, CH, F)).astype(np.float32) * 0.01
    him = rng.standard_normal((3, CH, F)).astype(np.float32) * 0.01
    full = np.zeros((3, CH, N // 2 + 1), np.complex128)
    full[..., 1:F + 1] = hre.astype(np.float64) + 1j * him.astype(np.float64)
    oracle = np.fft.irfft(full, n=N, axis=-1)
    scale = np.abs(oracle).max()
    errs = {}
    for name, fn in (("fft", irfft_fft), ("dense", irfft_dense),
                     ("twostage", irfft_twostage)):
        got = np.asarray(jax.jit(fn)(jnp.asarray(hre), jnp.asarray(him)))
        errs[name] = float(np.abs(got - oracle).max() / scale)
    log(f"accuracy (rel to peak, f64 oracle): {errs}")

    # --- chained slopes ---------------------------------------------------
    def measure(name, fn):
        def bench(T, seed):
            r = np.random.default_rng(seed
                                      ^ int.from_bytes(os.urandom(2),
                                                       "little"))
            a = jnp.asarray(r.standard_normal((T, CH, F)), jnp.float32)
            b = jnp.asarray(r.standard_normal((T, CH, F)), jnp.float32)
            jax.block_until_ready((a, b))

            @jax.jit
            def step(acc, a, b):
                out = fn(a + acc * 1e-12, b - acc * 1e-12)
                return jnp.tanh(jnp.sum(out) * 1e-6)

            acc = jnp.float32(0.0)
            acc = step(acc, a, b)
            jax.block_until_ready(acc)
            t0 = time.perf_counter()
            for _ in range(iters):
                acc = step(acc, a, b)
            jax.block_until_ready(acc)
            return (time.perf_counter() - t0) / iters * 1e3

        t_small = [bench(chunks[0], s) for s in (11, 12, 13)]
        t_big = [bench(chunks[1], s) for s in (21, 22, 23)]
        us = (np.median(t_big) - np.median(t_small)) \
            / (chunks[1] - chunks[0]) * 1e3
        log(f"{name}: chunk{chunks[0]} {np.median(t_small):.3f} ms, "
            f"chunk{chunks[1]} {np.median(t_big):.3f} ms -> "
            f"{us:.2f} us/frame")
        return us

    results = {name: round(measure(name, fn), 2)
               for name, fn in (("fft", irfft_fft),
                                ("dense", irfft_dense),
                                ("twostage", irfft_twostage))}
    import json
    print(json.dumps({"us_per_frame": results, "rel_err": errs,
                      "shapes": f"[T,{CH},{F}] -> [T,{CH},{N}]"}))


if __name__ == "__main__":
    main()
