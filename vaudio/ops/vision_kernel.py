"""Fused Pallas vision-epilogue kernel: mip RGB planes -> per-cell hue
histogram + gradient stats in ONE pass through VMEM.

After the mip pool, the remaining vision stages are all tiny (the mip is
135x240 at 1080p, 270x480 at 4K) but numerous: HSI conversion (~3.4
us/frame at 1080p), the tiled two-level histogram (~4 us), the intensity
stencils (~1.3 us) and the per-cell gradient reductions — measured by
stub substitution in-pipeline (docs/BENCHMARKS.md round 2).  Run as
separate XLA ops they each pay kernel-launch + HBM round-trips on
sub-megabyte tensors; this kernel does the whole epilogue on VMEM-
resident data and writes back only the 16x360 histogram and 16x4 stats.

Replicates, inside one kernel:

* rgb_to_hsi_planes — the Metal helper's exact acos hue formula
  (convolveFeatures.metal:14-38);
* hue_histogram_planes(method="tiled") — per-cell static rectangles
  (rotation folded into the tile bounds), two-level 360 = f1*f2 bin
  factorization, int8 one-hot MXU contractions
  (convolveFeatures.metal:132-165 without atomics);
* feature_stencil_plane on the intensity channel — the four 3x3 zero-sum
  masks with clamp-to-edge borders (convolveFeatures.metal:94-129);
* cell_gradient_stats_planes fast path — the reference's linear-slice
  cell split = contiguous column bands when W_mip % 16 == 0
  (VisionEngine.swift:273-295).

Numerics: integer histogram accumulation is exact; hue values come from
the VPU's acos, which can differ from the XLA path's by ulps — an edge
pixel whose hue lands exactly on a bin boundary may move one bin (counts
are conserved; see tests/test_pallas.py).  Gradient sums reduce in a
different association order than XLA's: equal to ~1e-6.

Gate via :func:`supports`; config flag ``use_pallas_vision``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = np.float32(2.0 * np.pi)

# ---------------------------------------------------------------------------
# In-kernel acos: Mosaic has no inverse-trig lowering (acos/asin/atan/atan2
# all unimplemented), so the kernel carries its own float acos — the
# classic single-precision algorithm (rational minimax R(z) on the asin
# core + the sqrt half-angle identities, as in musl/fdlibm acosf), <1 ulp
# from correctly rounded.  XLA's acos uses a different expansion, so the
# two paths can disagree in the last ulp: a pixel whose hue lands within
# ~1 ulp of a 1/359 bin boundary may move one bin (counts conserved;
# ~1 pixel/frame at 1080p mip statistics — tests bound the L1 movement).
# ---------------------------------------------------------------------------

_PIO2_HI = np.float32(1.5707962513e+00)
_PIO2_LO = np.float32(7.5497894159e-08)
_PS0 = np.float32(1.6666586697e-01)
_PS1 = np.float32(-4.2743422091e-02)
_PS2 = np.float32(-8.6563630030e-03)
_QS1 = np.float32(-7.0662963390e-01)


def _r_poly(z):
    p = z * (_PS0 + z * (_PS1 + z * _PS2))
    q = np.float32(1.0) + z * _QS1
    return p / q


def _acosf(x):
    """float32 acos on [-1, 1] from sqrt/divide/polynomial only."""
    ax = jnp.abs(x)
    # |x| < 0.5: acos(x) = pi/2 - asin(x), asin(x) = x + x*R(x^2).
    z1 = x * x
    r1 = _PIO2_HI - (x - (_PIO2_LO - x * _r_poly(z1)))
    # x <= -0.5: acos(x) = pi - 2*asin(sqrt((1+x)/2)).
    z2 = (np.float32(1.0) + x) * np.float32(0.5)
    s2 = jnp.sqrt(z2)
    r2 = np.float32(2.0) * (_PIO2_HI - (s2 + (_r_poly(z2) * s2
                                              - _PIO2_LO)))
    # x >= 0.5: acos(x) = 2*asin(sqrt((1-x)/2)), with the sqrt split
    # into a truncated head df + exact tail correction c3 (fdlibm).
    z3 = (np.float32(1.0) - x) * np.float32(0.5)
    s3 = jnp.sqrt(z3)
    df = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(s3, jnp.uint32)
        & np.uint32(0xFFFFF000), jnp.float32)
    denom = s3 + df
    c3 = jnp.where(denom > 0.0, (z3 - df * df)
                   / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    r3 = np.float32(2.0) * (df + (_r_poly(z3) * s3 + c3))
    return jnp.where(ax < 0.5, r1, jnp.where(x < 0.0, r2, r3))


# The bin split MUST match the XLA tiled histogram bit-for-bit, so the
# rule lives in exactly one place and is imported here.
from vaudio.vision.features import \
    hue_bin_factorization as _bin_factorization  # noqa: E402


def supports(hm: int, wm: int, cfg) -> bool:
    """Can the fused epilogue handle this mip shape + config?

    Requires the tiled-histogram bin factorization, the linear-slice
    gradient fast path (wm % cells == 0), and a mip that comfortably
    fits VMEM alongside its intermediates."""
    f1, f2 = _bin_factorization(cfg.num_hue_bins)
    if f1 is None:
        return False
    if not cfg.linear_cell_grads or wm % cfg.num_cells != 0:
        return False
    if hm < 2 or wm < 2:
        return False
    # ~25 f32 planes of intermediates live at once (9 taps + HSI + bin
    # digits + 4 stencil maps + temporaries): the 4K mip (270x480, ~13 MB
    # of stack) overflows VMEM (measured), 1080p (135x240, ~3.4 MB) fits
    # comfortably.  Budget keeps everything through ~1440p on-kernel;
    # larger mips take the XLA stages.
    return hm * wm * 4 * 26 <= (10 << 20)


def _shifted_taps(p):
    """All nine clamp-to-edge 3x3 taps of a (h, w) plane without any
    pad/concat (Mosaic rejects offset-mismatched concatenates): static
    circular rolls with the wrapped edge row/column masked back to the
    clamped value (the Metal sampler's address mode).

    Returns {(dy, dx): plane} with tap[(dy, dx)][y, x] =
    p[clamp(y+dy-1), clamp(x+dx-1)].
    """
    hm, wm = p.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (hm, wm), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (hm, wm), 1)

    def sh_row(x, dy):           # out[y] = x[clamp(y + dy)]
        if dy == 0:
            return x
        rolled = pltpu.roll(x, (-dy) % hm, 0)   # roll wants shift >= 0
        edge = ri == (hm - 1 if dy > 0 else 0)
        return jnp.where(edge, x, rolled)

    def sh_col(x, dx):           # out[x] = in[clamp(x + dx)]
        if dx == 0:
            return x
        rolled = pltpu.roll(x, (-dx) % wm, 1)
        edge = ci == (wm - 1 if dx > 0 else 0)
        return jnp.where(edge, x, rolled)

    rows = {dy: sh_row(p, dy) for dy in (-1, 0, 1)}
    return {(dy + 1, dx + 1): sh_col(rows[dy], dx)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)}


def _epilogue_one_frame(r, g, b, store_hist, store_grads, cfg_vals,
                        tiles):
    """Full epilogue for one frame's (hm, wm) planes.

    ``store_hist(c, h3_f32)`` / ``store_grads(col, vals)`` are store
    callbacks — the batched kernel indexes a leading frame dim directly
    in the store (a ``.at[bi]`` sub-ref lowers to a memref_slice whose
    unaligned minor dim Mosaic rejects)."""
    (sat_gate, int_gate, bins, f1, f2, cells, cw) = cfg_vals
    hm, wm = r.shape

    # --- HSI (convolveFeatures.metal:14-38) ---
    i = (r + g + b) * np.float32(1.0 / 3.0)
    mn = jnp.minimum(r, jnp.minimum(g, b))
    s = jnp.where(i > 0.0, 1.0 - mn / jnp.where(i > 0.0, i, 1.0), 0.0)
    num = 0.5 * ((r - g) + (r - b))
    den2 = (r - g) ** 2 + (r - b) * (g - b)
    den = jnp.sqrt(den2)
    safe_den = jnp.where(den != 0.0, den, 1.0)
    theta = _acosf(jnp.clip(num / safe_den, -1.0, 1.0))
    h = jnp.where(b <= g, theta, _TWO_PI - theta) / _TWO_PI
    h = jnp.where(den != 0.0, h, 0.0)

    # --- gated two-level bin split (convolveFeatures.metal:154,159) ---
    # The gate folds into the HIGH digit as an out-of-range sentinel
    # (f1): a gated-out pixel's hi one-hot row is all zeros, so its
    # outer product with any lo one-hot contributes nothing — no int8
    # gate broadcast needed (Mosaic can't minor-dim-expand 8-bit).
    gate = (s > sat_gate) & (i > int_gate)
    bin_idx = jnp.clip((h * np.float32(bins - 1)).astype(jnp.int32),
                       0, bins - 1)
    hi = jnp.where(gate, bin_idx // f2, f1)
    lo = bin_idx - (bin_idx // f2) * f2
    iota_f1 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, f1), 2)
    iota_f2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, f2), 2)

    # --- per-cell tiled histogram: 16 static rectangles, int8 MXU ---
    for c, (y0, yh, x0, xw) in enumerate(tiles):
        hi_t = jax.lax.slice(hi, (y0, x0), (y0 + yh, x0 + xw))
        lo_t = jax.lax.slice(lo, (y0, x0), (y0 + yh, x0 + xw))
        hi_oh = (hi_t[:, :, None] == iota_f1).astype(jnp.int8) \
            .reshape(yh * xw, f1)
        lo_oh = (lo_t[:, :, None] == iota_f2).astype(jnp.int8) \
            .reshape(yh * xw, f2)
        h3 = jax.lax.dot_general(
            hi_oh, lo_oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)            # (f1, f2)
        # hist stays (cells, f1, f2) in-kernel; the (f1*f2,) flatten is
        # a lane/sublane shape cast Mosaic won't do — caller reshapes.
        store_hist(c, h3.astype(jnp.float32))

    # --- intensity stencils (convolveFeatures.metal:94-113) ---
    taps = _shifted_taps(i)

    def tap(dy, dx):
        return taps[(dy, dx)]

    west = tap(0, 0) + tap(1, 0) + tap(2, 0)
    east = tap(0, 2) + tap(1, 2) + tap(2, 2)
    north = tap(0, 0) + tap(0, 1) + tap(0, 2)
    south = tap(2, 0) + tap(2, 1) + tap(2, 2)
    breathing = 4.0 * tap(1, 1) - (tap(0, 0) + tap(0, 2)
                                   + tap(2, 0) + tap(2, 2))
    vtilt = west - east
    htilt = south - north
    saddle = (tap(0, 0) + tap(2, 2)) - (tap(0, 2) + tap(2, 0))

    # --- per-cell stats over column bands (VisionEngine.swift:273-295,
    # linear-slice quirk; cells = contiguous cw-column bands) ---
    n = np.float32(hm * cw)
    sq_cols = jnp.sum(breathing * breathing, axis=0, keepdims=True)
    ay_cols = jnp.sum(jnp.abs(vtilt), axis=0, keepdims=True)
    az_cols = jnp.sum(jnp.abs(htilt), axis=0, keepdims=True)
    aw_cols = jnp.max(jnp.abs(saddle), axis=0, keepdims=True)  # (1, wm)
    # Column-band sums as one tiny pinned-precision MXU dot against a
    # 0/1 band matrix (bf16 operand rounding would break parity with the
    # XLA path's exact f32 sums).
    col = jax.lax.broadcasted_iota(jnp.int32, (wm, cells), 0) // cw
    band = (col == jax.lax.broadcasted_iota(jnp.int32, (wm, cells), 1)
            ).astype(jnp.float32)

    def band_sum(cols):          # (1, wm) -> (1, cells)
        return jax.lax.dot_general(
            cols, band, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    # Per-band max: masked max per cell (no matmul form exists for max).
    aw = jnp.max(jnp.where(band.T > 0.0, aw_cols, -jnp.inf),
                 axis=1, keepdims=True)                  # (cells, 1)
    store_grads(0, jnp.sqrt(band_sum(sq_cols) / n).T)
    store_grads(1, (band_sum(ay_cols) / n).T)
    store_grads(2, (band_sum(az_cols) / n).T)
    store_grads(3, aw)


def _vision_kernel(mip_ref, hist_ref, grads_ref, *, cfg_vals, tiles):
    """Single-frame block: mip_ref (3, hm, wm)."""
    def store_hist(c, h3f):
        hist_ref[c, :, :] = h3f

    def store_grads(col, vals):
        grads_ref[:, col:col + 1] = vals

    _epilogue_one_frame(mip_ref[0], mip_ref[1], mip_ref[2],
                        store_hist, store_grads, cfg_vals, tiles)


def _vision_kernel_batched(mip_ref, hist_ref, grads_ref, *, cfg_vals,
                           tiles, block: int):
    """Frame-blocked batch: mip_ref (B, 3, hm, wm); frames loop inside
    the kernel so the per-grid-step launch/DMA overhead amortizes (one
    grid step per frame measured 83 vs 37 us/frame at 1080p chunk-64).
    The loop is a fori_loop, not a static unroll: unrolling 8 frames of
    this epilogue produced a >600k-op MLIR module that OOM-killed the
    Mosaic compiler."""
    def body(bi, carry):
        def store_hist(c, h3f):
            hist_ref[bi, c, :, :] = h3f

        def store_grads(col, vals):
            grads_ref[bi, :, col:col + 1] = vals

        _epilogue_one_frame(mip_ref[bi, 0], mip_ref[bi, 1],
                            mip_ref[bi, 2], store_hist, store_grads,
                            cfg_vals, tiles)
        return carry

    jax.lax.fori_loop(0, block, body, 0)


def _kernel_setup(hm, wm, grid_size, num_hue_bins, sat_gate, int_gate):
    """Shared static setup for both pallas_call wrappers: the cell tile
    list (order must match hue_histogram_planes: cell row = x band,
    cell col = flipped-y band) and the packed config tuple."""
    from vaudio.vision.features import _cell_tile_bounds
    cells = grid_size * grid_size
    f1, f2 = _bin_factorization(num_hue_bins)
    cw = wm // cells
    xb, yb = _cell_tile_bounds(hm, wm, grid_size)
    tiles = []
    for rr in range(grid_size):
        x0, xw = xb[rr]
        for cc in range(grid_size):
            y0, yh = yb[cc]
            tiles.append((y0, yh, x0, xw))
    cfg_vals = (np.float32(sat_gate), np.float32(int_gate),
                num_hue_bins, f1, f2, cells, cw)
    return tuple(tiles), cfg_vals, f1, f2, cells


@functools.partial(jax.jit, static_argnames=("grid_size", "num_hue_bins",
                                             "sat_gate", "int_gate",
                                             "interpret"))
def _vision_stats_call(mip, grid_size, num_hue_bins, sat_gate, int_gate,
                       interpret):
    _, hm, wm = mip.shape
    tiles, cfg_vals, f1, f2, cells = _kernel_setup(
        hm, wm, grid_size, num_hue_bins, sat_gate, int_gate)
    hist, grads = pl.pallas_call(
        functools.partial(_vision_kernel, cfg_vals=cfg_vals,
                          tiles=tiles),
        out_shape=(
            jax.ShapeDtypeStruct((cells, f1, f2), jnp.float32),
            jax.ShapeDtypeStruct((cells, 4), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        cost_estimate=pl.CostEstimate(
            flops=hm * wm * (30 + 2 * (f1 + f2) + 40),
            bytes_accessed=3 * hm * wm * 4
            + 4 * (cells * num_hue_bins + cells * 4),
            transcendentals=2 * hm * wm,      # acos + sqrt
        ),
        interpret=interpret,
    )(mip)
    return hist.reshape(cells, num_hue_bins), grads


def _choose_block(t: int, hm: int, wm: int) -> int:
    """Largest frame block B | T whose double-buffered input block plus
    per-frame intermediates stay within the VMEM budget."""
    plane = hm * wm * 4
    for b in (16, 8, 4, 2, 1):
        if t % b == 0 and (3 * b * plane * 2 + 26 * plane) <= (12 << 20):
            return b
    return 1


@functools.partial(jax.jit, static_argnames=("grid_size", "num_hue_bins",
                                             "sat_gate", "int_gate",
                                             "interpret"))
def _vision_stats_batched_call(mips, grid_size, num_hue_bins, sat_gate,
                               int_gate, interpret):
    t, _, hm, wm = mips.shape
    tiles, cfg_vals, f1, f2, cells = _kernel_setup(
        hm, wm, grid_size, num_hue_bins, sat_gate, int_gate)
    block = _choose_block(t, hm, wm)
    hist, grads = pl.pallas_call(
        functools.partial(_vision_kernel_batched, cfg_vals=cfg_vals,
                          tiles=tiles, block=block),
        out_shape=(
            jax.ShapeDtypeStruct((t, cells, f1, f2), jnp.float32),
            jax.ShapeDtypeStruct((t, cells, 4), jnp.float32),
        ),
        grid=(t // block,),
        in_specs=[pl.BlockSpec((block, 3, hm, wm), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((block, cells, f1, f2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, cells, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=t * hm * wm * (30 + 2 * (f1 + f2) + 40),
            bytes_accessed=t * (3 * hm * wm * 4
                                + 4 * cells * (num_hue_bins + 4)),
            transcendentals=2 * t * hm * wm,
        ),
        interpret=interpret,
    )(mips)
    return hist.reshape(t, cells, num_hue_bins), grads


def vision_stats_pallas_batched(mips, cfg, interpret: bool = False):
    """f32[T, 3, hm, wm] mip planes -> (hist f32[T, cells, bins],
    grads f32[T, cells, 4]) — the chunk-batched pipeline's entry: frames
    are processed in blocks per grid step so the kernel-launch overhead
    amortizes (a one-frame-per-step vmap measured 2.2x SLOWER than the
    XLA stages; see _vision_kernel_batched)."""
    mips = jnp.asarray(mips, jnp.float32)
    return _vision_stats_batched_call(
        mips, cfg.grid_size, cfg.num_hue_bins,
        float(cfg.saturation_gate), float(cfg.intensity_gate), interpret)


def vision_stats_pallas(mip, cfg, interpret: bool = False):
    """f32[3, hm, wm] mip RGB planes -> (hist f32[cells, bins],
    grads f32[cells, 4]) via the fused epilogue kernel.

    Drop-in for the HSI -> tiled-histogram -> stencil -> grad-stats
    chain of vision.features.frame_stats (pre-check with
    :func:`supports`)."""
    mip = jnp.asarray(mip, jnp.float32)
    return _vision_stats_call(mip, cfg.grid_size, cfg.num_hue_bins,
                              float(cfg.saturation_gate),
                              float(cfg.intensity_gate), interpret)
