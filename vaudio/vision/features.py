"""Frame feature extraction as pure jnp functions.

The reference splits this work across a GPU mip/blit pass, two Metal compute
kernels and two hot CPU loops with three host<->device bounces
(VisionEngine.swift:91-316).  Here the whole thing is one fused XLA graph:
device-resident from frame tensor to the 16 hues + 16 gradient vectors.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vaudio.config import AuralizerConfig

_TWO_PI = np.float32(2.0 * np.pi)


# ---------------------------------------------------------------------------
# Color space
# ---------------------------------------------------------------------------

def rgb_to_hsi(rgb):
    """RGB -> HSI exactly as the Metal helper (convolveFeatures.metal:14-38).

    I = mean(r,g,b); S = 1 - min/I (0 where I<=0);
    H = acos-formula angle normalized to [0,1], 0 where the denominator
    vanishes (grey pixels).  The acos argument is clamped to [-1,1] — Metal
    leaves it UB outside that range; clamping is the only well-defined
    reading and matches the mathematically exact value.

    Args: rgb: f32[..., 3] in [0, 1].
    Returns: f32[..., 3] with channels (H, S, I).
    """
    rgb = jnp.asarray(rgb, dtype=jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]

    i = (r + g + b) / 3.0
    min_val = jnp.minimum(r, jnp.minimum(g, b))
    s = jnp.where(i > 0.0, 1.0 - min_val / jnp.where(i > 0.0, i, 1.0), 0.0)

    num = 0.5 * ((r - g) + (r - b))
    den = jnp.sqrt((r - g) ** 2 + (r - b) * (g - b))
    safe_den = jnp.where(den != 0.0, den, 1.0)
    theta = jnp.arccos(jnp.clip(num / safe_den, -1.0, 1.0))
    h = jnp.where(b <= g, theta, _TWO_PI - theta) / _TWO_PI
    h = jnp.where(den != 0.0, h, 0.0)

    return jnp.stack([h, s, i], axis=-1)


# ---------------------------------------------------------------------------
# Mip pyramid
# ---------------------------------------------------------------------------

def mip_downsample(frame, level: int, quantize: bool = False):
    """Downsample by 2**level per axis via repeated 2x2 mean pooling.

    Equivalent of the blit ``generateMipmaps`` + sampling at ``level``
    (VisionEngine.swift:152-173,189-192; the kernels sample texel centers of
    the mip level, so linear filtering reduces to exact mip texels).

    ``quantize=True`` additionally rounds each level to 8-bit steps, which is
    what a bgra8Unorm mip chain does on Metal (parity knob; default off for
    full f32 precision).

    Args: frame: f32[H, W, C] with H, W divisible by 2**level.
    """
    frame = jnp.asarray(frame, dtype=jnp.float32)
    h, w = frame.shape[0], frame.shape[1]
    if h % (1 << level) or w % (1 << level):
        raise ValueError(
            f"frame dims ({h},{w}) must be divisible by 2^{level}; pad or "
            f"crop the source (reference uses width>>level truncation)")
    x = frame
    for _ in range(level):
        hh, ww = x.shape[0] // 2, x.shape[1] // 2
        x = x.reshape(hh, 2, ww, 2, -1).mean(axis=(1, 3))
        if quantize:
            x = jnp.round(x * 255.0) / 255.0
    return x.reshape(h >> level, w >> level, frame.shape[-1])


# ---------------------------------------------------------------------------
# Rotation
# ---------------------------------------------------------------------------

def rotate_cw(x):
    """The kernels' rotated output indexing (convolveFeatures.metal:53-59):
    out[rotY, rotX] with rotX = (H-1) - y, rotY = x, i.e. a 90-degree
    clockwise rotation.  (H, W, ...) -> (W, H, ...).
    """
    return jnp.rot90(x, k=-1, axes=(0, 1))


# ---------------------------------------------------------------------------
# 3x3 mode stencils
# ---------------------------------------------------------------------------

# The four zero-sum masks, written as k[dy+1][dx+1] from the tap/weight
# vectors in convolveFeatures.metal:94-113 (taps i{x}{y}: x = left..right,
# y = top..bottom).
MODE_KERNELS = np.array(
    [
        # breathing (center-surround)
        [[-1, 0, -1],
         [0, 4, 0],
         [-1, 0, -1]],
        # "vertical tilt" (a horizontal-direction gradient; reference name kept)
        [[1, 0, -1],
         [1, 0, -1],
         [1, 0, -1]],
        # "horizontal tilt" (vertical-direction gradient)
        [[-1, -1, -1],
         [0, 0, 0],
         [1, 1, 1]],
        # saddle (diagonal)
        [[1, 0, -1],
         [0, 0, 0],
         [-1, 0, 1]],
    ],
    dtype=np.float32,
)  # (4 modes, 3, 3)


def feature_stencil(hsi):
    """Apply the four 3x3 mode masks to each HSI channel.

    Fused equivalent of the ``convolveFeatures`` kernel body
    (convolveFeatures.metal:40-130) *before* its rotated write: returns in
    image orientation; apply :func:`rotate_cw` for buffer-layout parity.

    Borders are clamp-to-edge, matching the Metal sampler.

    Args: hsi: f32[H, W, 3].
    Returns: f32[H, W, 3, 4] — (pixel, channel, mode).
    """
    hsi = jnp.asarray(hsi, dtype=jnp.float32)
    h, w = hsi.shape[0], hsi.shape[1]
    padded = jnp.pad(hsi, ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = jnp.zeros((h, w, 3, 4), dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            weights = MODE_KERNELS[:, dy, dx]  # (4,)
            if not np.any(weights):
                continue
            tap = padded[dy:dy + h, dx:dx + w, :]  # (h, w, 3)
            out = out + tap[..., None] * weights
    return out


# ---------------------------------------------------------------------------
# Hue histogram (atomics-free)
# ---------------------------------------------------------------------------

def _cell_ids(shape_rot: Tuple[int, int], grid: int):
    """Per-pixel 4x4 cell index on the *rotated* image, matching
    calculateHueHistogram's integer arithmetic
    (convolveFeatures.metal:155-157): row = ry*4/W, col = rx*4/H where the
    rotated image has shape (W, H)."""
    wm, hm = shape_rot
    row = (jax.lax.broadcasted_iota(jnp.int32, (wm, hm), 0) * grid) // wm
    col = (jax.lax.broadcasted_iota(jnp.int32, (wm, hm), 1) * grid) // hm
    return row * grid + col


def hue_histogram(hsi_rot, cfg: AuralizerConfig, method: str = "matmul"):
    """Per-cell hue histogram over gated pixels.

    Equivalent of ``calculateHueHistogram`` (convolveFeatures.metal:132-165)
    with the atomic scatter-add re-expressed without atomics:

    * ``matmul`` (default): hist = cell_onehot^T @ bin_onehot — a single
      (cells x pixels) @ (pixels x bins) MXU contraction.  This is the
      idiomatic TPU histogram: the outer product of two one-hot encodings
      summed over pixels IS the joint histogram.
    * ``scatter``: XLA scatter-add on a flat (cells*bins) table.

    Pixels are gated on ``S > 0 and I > 0.1`` (convolveFeatures.metal:154).
    Bin = floor(H * 359) of 360 bins (convolveFeatures.metal:159).

    Args: hsi_rot: f32[Wm, Hm, 3] — the *rotated* mip HSI image.
    Returns: f32[num_cells, num_hue_bins] counts.
    """
    hsi_rot = jnp.asarray(hsi_rot, dtype=jnp.float32)
    wm, hm = hsi_rot.shape[0], hsi_rot.shape[1]
    grid = cfg.grid_size
    bins = cfg.num_hue_bins
    cells = cfg.num_cells

    h = hsi_rot[..., 0]
    s = hsi_rot[..., 1]
    i = hsi_rot[..., 2]
    gate = (s > cfg.saturation_gate) & (i > cfg.intensity_gate)
    bin_idx = jnp.clip((h * np.float32(bins - 1)).astype(jnp.int32),
                       0, bins - 1)
    cell_idx = _cell_ids((wm, hm), grid)

    if method == "matmul":
        p = wm * hm
        gate_f = gate.reshape(p).astype(jnp.float32)
        cell_oh = jax.nn.one_hot(cell_idx.reshape(p), cells,
                                 dtype=jnp.float32) * gate_f[:, None]
        bin_oh = jax.nn.one_hot(bin_idx.reshape(p), bins, dtype=jnp.float32)
        return jax.lax.dot_general(
            cell_oh, bin_oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    elif method == "scatter":
        flat = (cell_idx * bins + bin_idx).reshape(-1)
        upd = gate.reshape(-1).astype(jnp.float32)
        hist = jnp.zeros((cells * bins,), jnp.float32).at[flat].add(upd)
        return hist.reshape(cells, bins)
    raise ValueError(f"unknown histogram method {method!r}")


def update_hues(hist, prev_hues, mixing, cfg: AuralizerConfig):
    """Per-cell dominant-hue argmax, gated and EMA-smoothed.

    Reproduces the CPU reduction at VisionEngine.swift:255-271: for each
    cell, if max count > 20, the new hue is
    ``int32(prev*mix + argmax*(1-mix))`` (truncating), else unchanged.
    First-maximum tie-break matches Swift's ``max(by:)``.

    Args:
      hist: f32[cells, bins]; prev_hues: i32[cells]; mixing: f32 scalar.
    Returns: i32[cells].
    """
    max_val = jnp.max(hist, axis=1)
    arg = jnp.argmax(hist, axis=1).astype(jnp.float32)
    mixed = prev_hues.astype(jnp.float32) * mixing + arg * (1.0 - mixing)
    new = mixed.astype(jnp.int32)  # truncation, as Swift Int32(Float)
    return jnp.where(max_val > np.float32(cfg.hist_count_gate), new,
                     prev_hues).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Gradient statistics
# ---------------------------------------------------------------------------

def cell_gradient_stats(intensity_feat_rot, cfg: AuralizerConfig):
    """Aggregate the intensity-channel mode maps into 16 per-cell vectors.

    Reproduces VisionEngine.swift:273-295: stats are (RMS of breathing,
    mean|vTilt|, mean|hTilt|, max|saddle|).

    Cell assignment depends on ``cfg.linear_cell_grads``:

    * True (reference behavior, SURVEY §2.2 quirk): cells are contiguous
      1/16 slices of the flattened rotated buffer — horizontal bands of the
      rotated image, NOT the 4x4 grid; the last cell absorbs the remainder
      (VisionEngine.swift:278-283).
    * False (clean mode): the same 4x4 spatial tiling the histogram uses.

    Args: intensity_feat_rot: f32[Wm, Hm, 4] (rotated orientation).
    Returns: f32[num_cells, 4].
    """
    x = jnp.asarray(intensity_feat_rot, dtype=jnp.float32)
    wm, hm = x.shape[0], x.shape[1]
    p = wm * hm
    cells = cfg.num_cells
    flat = x.reshape(p, 4)

    if cfg.linear_cell_grads:
        per = p // cells
        stats = []
        for c in range(cells):
            start = c * per
            end = p if c == cells - 1 else (c + 1) * per
            sl = flat[start:end]
            n = np.float32(end - start)
            stats.append(jnp.stack([
                jnp.sqrt(jnp.sum(sl[:, 0] * sl[:, 0]) / n),
                jnp.sum(jnp.abs(sl[:, 1])) / n,
                jnp.sum(jnp.abs(sl[:, 2])) / n,
                jnp.max(jnp.abs(sl[:, 3])),
            ]))
        return jnp.stack(stats)

    # Clean mode: 4x4 spatial tiling via one-hot segment reductions.
    cell_idx = _cell_ids((wm, hm), cfg.grid_size).reshape(p)
    oh = jax.nn.one_hot(cell_idx, cells, dtype=jnp.float32)  # (p, cells)
    counts = jnp.sum(oh, axis=0)  # (cells,)
    sq = oh.T @ (flat[:, 0] * flat[:, 0])
    ay = oh.T @ jnp.abs(flat[:, 1])
    az = oh.T @ jnp.abs(flat[:, 2])
    aw = jnp.max(jnp.where(oh.T > 0, jnp.abs(flat[:, 3])[None, :], 0.0),
                 axis=1)
    return jnp.stack([jnp.sqrt(sq / counts), ay / counts, az / counts, aw],
                     axis=1)


# ---------------------------------------------------------------------------
# Full vision step
# ---------------------------------------------------------------------------

def extract_features(frame, prev_hues, mixing, cfg: AuralizerConfig,
                     compute_debug_maps: bool = False):
    """Full L2 pass: frame -> (hues i32[16], grads f32[16,4], debug dict).

    One fused graph replacing the reference's two command buffers + two CPU
    reduction loops (VisionEngine.swift:91-316).

    Args:
      frame: f32[H, W, 3] RGB in [0,1].
      prev_hues: i32[16] carried hue state.
      mixing: f32 scalar EMA coefficient (VisionEngine.spectrumMixing).
      compute_debug_maps: also return the hue/saturation mode maps that the
        reference exposes on its debug screen (DebuggingView heatmaps).
    """
    mip = mip_downsample(frame, cfg.mip_level, cfg.quantize_mips)
    hsi = rgb_to_hsi(mip)
    hsi_rot = rotate_cw(hsi)

    hist = hue_histogram(hsi_rot, cfg)
    hues = update_hues(hist, prev_hues, mixing, cfg)

    feats = feature_stencil(hsi)              # (h, w, 3, 4)
    feats_rot = rotate_cw(feats)              # (w, h, 3, 4)
    grads = cell_gradient_stats(feats_rot[..., 2, :], cfg)

    debug = {"histogram": hist}
    if compute_debug_maps:
        debug.update(
            hue_map=feats_rot[..., 0, :],
            saturation_map=feats_rot[..., 1, :],
            intensity_map=feats_rot[..., 2, :],
            mip_hsi=hsi,
        )
    return hues, grads, debug
