"""Fused Pallas spectrum-synthesis kernel.

TPU-native equivalent of ``computeSpectrum``
(Metal Functions/SpectrumCompute.metal:82-214).  The Metal kernel runs one
thread per frequency bin with a serial 31-partial x 16-cell loop; here the
whole (bins x partials) peak evaluation + complex weighting + reduction is
one VMEM-resident Pallas program:

* partials live on the sublane axis (496 -> padded 512), bins on the lane
  axis (2047 -> padded 2048), tiled along bins;
* the Hann-window spectral peak W(d) = 0.5 sinc(d) - 0.25 (sinc(d-1) +
  sinc(d+1)) is evaluated with ONE sin per element instead of three, via
  sin(pi(d +- 1)) = -sin(pi d):

      W(d) = sin(pi d) * [ 0.5/(pi d) + 0.25/(pi(d-1)) + 0.25/(pi(d+1)) ]

  with exact limits patched at d in {0, +-1} — a 3x cut in transcendental
  work (the kernel's FLOP bottleneck);
* the weighted reduction over partials happens in-register; only the F x 2
  result is written back.

Per-frame scalar work (fundamental snapping, gains, phases — 16x31 values)
stays in the XLA graph (vaudio.synth.partial_weights); this kernel does the
1M-element heavy stage.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vaudio.config import AuralizerConfig

_PI = np.float32(np.pi)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


from vaudio.dsp import hann_sinc_peak_fast as _hann_peak_from_d  # noqa: E402


def _spectrum_kernel(freqs_ref, pf_ref, scale_ref, w_ref, out_ref):
    """One bin-tile: out[K, TILE_B] += partials' weighted peaks.

    K = 2 for mono (re, im), 4 for stereo (L_re, L_im, R_re, R_im).
    The peak matrix is evaluated on the VPU (one sine per element) and the
    weighted partial-sum contracts on the MXU: (K, NP) @ (NP, TILE_B)."""
    f = freqs_ref[0, :]                       # (TILE_B,)
    pf = pf_ref[0, :]                         # (NP,)
    scale = scale_ref[0, :]                   # (NP,)
    d = (f[None, :] - pf[:, None]) * scale[:, None]   # (NP, TILE_B)
    w = _hann_peak_from_d(d)
    out_ref[...] = jax.lax.dot_general(
        w_ref[...], w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # fp32 contract (Mosaic);
    # TPU DEFAULT = bf16 operand rounding — see vision/features._EXACT


@functools.partial(jax.jit, static_argnames=("num_bins", "tile_b",
                                             "interpret"))
def hann_peak_weighted_sum(freqs, pfreq, scale, weights, num_bins: int,
                           tile_b: int = 512, interpret: bool = False):
    """spectrum[f, :] = sum_p W((freqs[f]-pfreq[p])*scale[p]) * weights[p,:]

    Args:
      freqs:   f32[F] bin frequencies.
      pfreq:   f32[NP] partial frequencies.
      scale:   f32[NP] per-partial distance scale (hann_mult / bandwidth).
      weights: f32[NP, K] complex weights, K = 2*channels columns.
    Returns: f32[F, K].
    """
    F = num_bins
    np_raw = pfreq.shape[0]
    K = weights.shape[1]
    NP = _round_up(np_raw, 8)
    FP = _round_up(F, tile_b)

    freqs_p = jnp.zeros((1, FP), jnp.float32).at[0, :F].set(freqs)
    pf_p = jnp.zeros((1, NP), jnp.float32).at[0, :np_raw].set(pfreq)
    # Padded partials: scale 0 makes d == 0 -> W = 0.5, but weight 0 kills
    # the contribution.
    scale_p = jnp.zeros((1, NP), jnp.float32).at[0, :np_raw].set(scale)
    w_p = jnp.zeros((K, NP), jnp.float32).at[:, :np_raw].set(weights.T)

    grid = (FP // tile_b,)
    out = pl.pallas_call(
        _spectrum_kernel,
        out_shape=jax.ShapeDtypeStruct((K, FP), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, tile_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=10 * NP * FP,
            bytes_accessed=4 * (FP + 3 * NP + 2 * FP),
            transcendentals=NP * FP,
        ),
        interpret=interpret,
    )(freqs_p, pf_p, scale_p, w_p)
    return out[:, :F].T                       # (F, 2)


def _spectrum_kernel_batched(freqs_ref, pf_ref, scale_ref, w_ref, out_ref):
    """One (frame, bin-tile) grid cell — identical math to
    :func:`_spectrum_kernel` with the frame index supplied by the grid.

    Per-frame operands carry a singleton middle axis ((T, 1, NP) blocks of
    (1, 1, NP)) so every block's trailing two dims equal the array's —
    the Mosaic lowering's tiling requirement."""
    f = freqs_ref[0, :]                       # (TILE_B,)
    pf = pf_ref[0, 0, :]                      # (NP,)
    scale = scale_ref[0, 0, :]                # (NP,)
    d = (f[None, :] - pf[:, None]) * scale[:, None]   # (NP, TILE_B)
    w = _hann_peak_from_d(d)
    out_ref[0] = jax.lax.dot_general(
        w_ref[0], w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # fp32 contract (Mosaic)


@functools.partial(jax.jit, static_argnames=("num_bins", "tile_b",
                                             "interpret"))
def hann_peak_weighted_sum_batched(freqs, pfreq, scale, weights,
                                   num_bins: int, tile_b: int = 512,
                                   interpret: bool = False):
    """Frame-batched variant: ONE pallas_call computes T frames' raw
    spectra — the fixed per-invocation dispatch overhead (~75 us on the
    measured runtime, docs/BENCHMARKS.md) amortizes T-fold.  Usable by any
    path that has all frames' partial weights at hand before the
    sequential EMA (the chunked/offline pipelines; the EMA and audio tail
    stay in a cheap scan).

    Args:
      freqs:   f32[F] bin frequencies (shared across frames).
      pfreq:   f32[T, NP]; scale: f32[T, NP]; weights: f32[T, NP, K].
    Returns: f32[T, F, K].
    """
    F = num_bins
    T, np_raw = pfreq.shape
    K = weights.shape[2]
    NP = _round_up(np_raw, 8)
    FP = _round_up(F, tile_b)

    freqs_p = jnp.zeros((1, FP), jnp.float32).at[0, :F].set(freqs)
    pf_p = jnp.zeros((T, 1, NP), jnp.float32).at[:, 0, :np_raw].set(pfreq)
    scale_p = jnp.zeros((T, 1, NP), jnp.float32).at[:, 0, :np_raw].set(
        scale)
    w_p = jnp.zeros((T, K, NP), jnp.float32).at[:, :, :np_raw].set(
        jnp.swapaxes(weights, 1, 2))

    grid = (T, FP // tile_b)
    out = pl.pallas_call(
        _spectrum_kernel_batched,
        out_shape=jax.ShapeDtypeStruct((T, K, FP), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b), lambda t, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NP), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NP), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, NP), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, tile_b), lambda t, i: (t, 0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=10 * NP * FP * T,
            bytes_accessed=4 * T * (FP + 3 * NP + 2 * FP),
            transcendentals=T * NP * FP,
        ),
        interpret=interpret,
    )(freqs_p, pf_p, scale_p, w_p)
    return jnp.swapaxes(out[:, :, :F], 1, 2)  # (T, F, K)


def spectrum_pallas(flat_pf, flat_w, flat_inv_bw, cfg: AuralizerConfig,
                    consts, interpret: Optional[bool] = None):
    """Drop-in replacement for the jnp peak-stamping contraction in
    vaudio.synth.build_spectrum (pre-rotation, pre-smoothing stage).

    Args:
      flat_pf: f32[NP] partial frequencies;
      flat_w: f32[NP, 2] complex weights;
      flat_inv_bw: f32[NP] 1/bandwidth per partial.
    Returns: f32[F, 2].
    """
    if interpret is None:
        # Compile on real TPU backends (including the 'axon' tunnel
        # platform); interpret elsewhere (CPU tests).
        interpret = jax.default_backend() in ("cpu",)
    hann_mult = np.float32(1.0 / cfg.bin_width)
    scale = flat_inv_bw * hann_mult
    return hann_peak_weighted_sum(
        jnp.asarray(consts.freqs), flat_pf, scale, flat_w,
        num_bins=cfg.num_bins, interpret=interpret)
