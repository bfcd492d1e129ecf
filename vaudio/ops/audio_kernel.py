"""Fused AGC + overlap-add Pallas kernel.

The audio tail of the frame step (SoundEngine.swift:412-428,231-254) is a
chain of tiny ops — two peak reductions, a sigmoid, two scalar broadcasts,
a window multiply and a hop-sized add — that XLA emits as ~10 separate
kernels; at ~20 us of launch overhead each this dominates the whole frame
step once the heavy stages are optimized.  This kernel does the entire
stage in ONE VMEM-resident program:

    frame_peak  = max|sig| + 1e-9
    running_max = attack/release EMA of frame_peak      (scalar carry)
    sig        /= frame_peak / clamp(sigmoid(frame_peak/running_max), 0, 1)
    gain        = 1 / (max|sig'| + 1e-6)                (OLA renorm quirk)
    windowed    = sig' * gain * hann
    pcm         = tail[hop:] + windowed[:hop]
    tail'       = windowed

Shapes are reshaped to (rows, 512) lanes-friendly blocks.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 512


def _agc_ola_kernel(sig_ref, tail_ref, window_ref, rmax_ref, attack_ref,
                    release_ref, pcm_ref, new_tail_ref, new_rmax_ref):
    sig = sig_ref[...]                       # (R, 512)
    tail = tail_ref[...]
    window = window_ref[...]
    rmax = rmax_ref[0]
    attack = attack_ref[0]
    release = release_ref[0]

    # --- AGC (dsp.agc_normalize semantics) ---
    frame_peak = jnp.max(jnp.abs(sig)) + np.float32(1e-9)
    attacked = attack * frame_peak + (1.0 - attack) * rmax
    released = release * frame_peak + (1.0 - release) * rmax
    new_max = jnp.where(frame_peak > rmax, attacked, released)

    scaled = frame_peak / new_max
    k = np.float32(2.0)
    g = 1.0 / (1.0 + jnp.exp(-k * (scaled - 0.5)))
    g0 = np.float32(1.0 / (1.0 + np.exp(1.0)))
    g1 = np.float32(1.0 / (1.0 + np.exp(-1.0)))
    norm_factor = jnp.clip((g - g0) / (g1 - g0), 0.0, 1.0)
    norm_value = frame_peak / norm_factor
    normalized = sig / norm_value
    normalized = jnp.where(jnp.isfinite(normalized), normalized, 0.0)

    # --- OLA (dsp.overlap_add semantics) ---
    peak2 = jnp.max(jnp.abs(normalized))
    gain = 1.0 / (peak2 + np.float32(1e-6))
    windowed = normalized * gain * window     # (C, R, 512)

    rows = sig.shape[1]
    half = rows // 2
    pcm_ref[...] = tail[:, half:, :] + windowed[:, :half, :]
    new_tail_ref[...] = windowed
    new_rmax_ref[0] = new_max


def agc_overlap_add(signal, ola_tail, window, running_max, attack, release,
                    interpret=None):
    """Fused equivalent of dsp.agc_normalize + dsp.overlap_add.

    Args:
      signal, ola_tail: f32[nfft] (mono) or f32[C, nfft] (stereo — AGC/OLA
        gains are global across channels, preserving the image).
      window: f32[nfft].
      running_max, attack, release: f32 scalars.
    Returns: (pcm f32[(C,) nfft//2], new_tail like signal,
              new_running_max f32[]).
    """
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    nfft = signal.shape[-1]
    assert nfft % (2 * _LANES) == 0, nfft
    rows = nfft // _LANES
    mono = signal.ndim == 1
    ch = 1 if mono else signal.shape[0]

    sig3 = signal.reshape(ch, rows, _LANES)
    tail3 = ola_tail.reshape(ch, rows, _LANES)
    win3 = jnp.broadcast_to(window.reshape(1, rows, _LANES),
                            (ch, rows, _LANES))
    scalars = [jnp.reshape(running_max, (1,)).astype(jnp.float32),
               jnp.reshape(attack, (1,)).astype(jnp.float32),
               jnp.reshape(release, (1,)).astype(jnp.float32)]

    pcm, new_tail, new_rmax = pl.pallas_call(
        _agc_ola_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ch, rows // 2, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((ch, rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(sig3, tail3, win3, *scalars)
    if mono:
        return (pcm.reshape(nfft // 2), new_tail.reshape(nfft),
                new_rmax.reshape(()))
    return (pcm.reshape(ch, nfft // 2), new_tail.reshape(ch, nfft),
            new_rmax.reshape(()))
