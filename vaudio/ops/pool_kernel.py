"""Fused Pallas mip-pool kernel: uint8 frame planes -> pooled f32 planes
in ONE pass through VMEM, all contractions on the int8 MXU.

The XLA path (vision.features.mip_downsample_planes) is the same math —
int8 row-pool matmul, lossless q/r int8 split for the column pool — but
materializes the row-pooled intermediate ((C, H>>l, W) i32 + two i8
copies, ~3 MB at 1080p) through HBM.  This kernel keeps every
intermediate in VMEM: each grid step owns one full channel plane (u8,
2 MB at 1080p) and processes it in row bands, so HBM traffic drops to
the u8 read + the pooled f32 output + one 0.5 MB int8 matrix.

Design notes (why each piece looks the way it does):

* Mosaic tiling: non-full blocks need their last two dims divisible by
  (8, 128); the odd production mip dims (135x240 at 1080p mip-3) make
  banded *output* blocks illegal, so all blocks are full-array (always
  legal) and the banding lives inside the kernel as a static Python
  loop.
* The row pool is an int8 MXU matmul against a tiny block-diagonal 0/1
  matrix generated in-kernel from iota (band_mat[i, j] = (j >> level
  == i)); a first attempt summed u8->i32 on the VPU and lost ~12
  us/frame at 1080p to the elementwise conversion — keep reductions on
  the MXU.
* u8 -> s8: XOR 0x80 + bitcast = (value - 128) exactly, same centering
  trick as the XLA path, so row sums |.| <= 128*2^level fit the q/r
  int8 split (q = rows >> level, r = rows - (q << level)) and the
  column pool is two more int8 matmuls, bit-exact in i32.
* The mean normalization, +128 offset undo and ``scale`` fold into one
  final f32 multiply-add on the (tiny) output — bit-identical to
  vision/features.py:164-203.

Equivalent of blit + generateMipmaps + mip-level sampling
(reference: video-auralizer/VisionEngine.swift:130-173,189-192).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Keep each band's i32 row-sum image around ~1 MB of VMEM.
_BAND_BYTES = 1 << 20
# Refuse planes whose u8 block (double-buffered) would crowd VMEM.
_MAX_PLANE_BYTES = 4 << 20


def _pool_matrix_i8(n: int, level: int) -> np.ndarray:
    """(n, n>>level) banded 0/1 int8 matrix summing disjoint 2^level
    blocks."""
    k = 1 << level
    m = n >> level
    mat = np.zeros((n, m), np.int8)
    for j in range(m):
        mat[j * k:(j + 1) * k, j] = 1
    return mat


def _band_matrix(mb: int, k: int, level: int):
    """(mb, mb*k) block-diagonal 0/1 int8 row-pool matrix, from iota."""
    i = jax.lax.broadcasted_iota(jnp.int32, (mb, mb * k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (mb, mb * k), 1)
    return (jnp.right_shift(j, level) == i).astype(jnp.int8)


def _pool_kernel(x_ref, pc_ref, out_ref, *, k: int, level: int,
                 gain: float, offset: float, band_rows: int):
    """One channel plane per grid step; band loop is static (unrolled)."""
    pc = pc_ref[...]                                     # (W, Wo) i8
    ho = out_ref.shape[1]
    w = x_ref.shape[2]

    def idot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    start = 0
    while start < ho:
        mb = min(band_rows, ho - start)
        x = x_ref[0, start * k:(start + mb) * k, :]      # (mb*k, W) u8
        xs = jax.lax.bitcast_convert_type(x ^ np.uint8(0x80), jnp.int8)
        rows = idot(_band_matrix(mb, k, level), xs)      # (mb, W) i32,
        q32 = jnp.right_shift(rows, level)               # |.| <= 128*2^l
        r32 = rows - (q32 << level)                      # [0, 2^level)
        acc = (idot(q32.astype(jnp.int8), pc) << level) \
            + idot(r32.astype(jnp.int8), pc)             # exact i32
        out_ref[0, start:start + mb, :] = (
            acc.astype(jnp.float32) * np.float32(gain)
            + np.float32(offset))
        start += mb


def _column_split(h: int, w: int, k: int):
    """Smallest column-split count S for planes too big for one VMEM
    block: S | w, each block wb = w/S lane-aligned (wb % 128 == 0),
    pool-aligned (wb % k == 0), and h*wb within the VMEM budget.
    Returns S or None."""
    for s in range(2, w // 128 + 1):
        if w % s:
            continue
        wb = w // s
        if wb % 128 or wb % k:
            continue
        if h * wb <= _MAX_PLANE_BYTES:
            return s
    return None


def supports(h: int, w: int, level: int) -> bool:
    """Can mip_pool_pallas handle a (h, w) u8 plane at this level?"""
    if not (1 <= level <= 7):
        return False
    k = 1 << level
    if (h >> level) == 0 or (w >> level) == 0:
        return False
    if h * w <= _MAX_PLANE_BYTES:
        return True
    return w % k == 0 and _column_split(h, w, k) is not None


@functools.partial(jax.jit,
                   static_argnames=("level", "scale", "band_rows",
                                    "interpret"))
def mip_pool_pallas(planes, level: int, scale: float = 1.0,
                    band_rows: int = 0, interpret: bool = False):
    """u8[C, H, W] -> f32[C, H>>level, W>>level] box downsample, fused.

    ``scale`` folds the u8 normalization (pass 1/255).  Drop-in for the
    uint8 path of vision.features.mip_downsample_planes (bit-identical
    integer accumulation; the final f32 multiply-add rounds once).
    ``band_rows``: output rows processed per in-kernel band (0 = auto
    ~1 MB bands).

    Planes beyond the ~4 MB single-block VMEM budget (e.g. 4K) run with
    a COLUMN-SPLIT grid: each grid step owns a lane-aligned column
    stripe (pooling never crosses stripes since the stripe width is a
    multiple of 2^level), and the per-stripe output is padded to a
    128-lane multiple to satisfy Mosaic's block tiling — the pad
    columns multiply a zero-padded pool matrix and are sliced off
    outside the kernel.  Use :func:`supports` to pre-check a shape.
    """
    planes = jnp.asarray(planes)
    assert planes.dtype == jnp.uint8, "mip_pool_pallas is the u8 fast path"
    if not (1 <= level <= 7):
        raise ValueError("mip_pool_pallas supports 1 <= level <= 7 "
                         "(int8 q/r split)")
    c, h, w = planes.shape
    k = 1 << level
    ho, wo = h >> level, w >> level
    if ho == 0 or wo == 0:
        raise ValueError(f"frame dims ({h},{w}) too small for mip {level}")
    planes = planes[:, :ho * k, :]           # drop remainder rows (matches
    gain = scale / float(k * k)              # XLA banded matrix)
    offset = 128.0 * scale

    if h * w <= _MAX_PLANE_BYTES:
        s = 1
        wb, wob, wob_pad = w, wo, wo
        pc = jnp.asarray(_pool_matrix_i8(w, level))
    else:
        if w % k:
            raise ValueError(
                f"plane {h}x{w} needs the column-split path, which "
                f"requires W % {k} == 0; use the XLA path")
        s = _column_split(h, w, k)
        if s is None:
            raise ValueError(
                f"plane {h}x{w} admits no lane-aligned column split; "
                "use vision.features.mip_downsample_planes")
        wb = w // s
        wob = wb >> level
        wob_pad = ((wob + 127) // 128) * 128
        pc_np = np.zeros((wb, wob_pad), np.int8)
        pc_np[:, :wob] = _pool_matrix_i8(wb, level)
        pc = jnp.asarray(pc_np)

    if band_rows <= 0:
        band_rows = max(1, min(ho, _BAND_BYTES // (4 * k * wb)))

    out = pl.pallas_call(
        functools.partial(_pool_kernel, k=k, level=level, gain=gain,
                          offset=offset, band_rows=band_rows),
        out_shape=jax.ShapeDtypeStruct((c, ho, s * wob_pad), jnp.float32),
        grid=(c, s),
        in_specs=[
            pl.BlockSpec((1, ho * k, wb), lambda ci, si: (ci, 0, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, wob_pad), lambda ci, si: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ho, wob_pad),
                               lambda ci, si: (ci, 0, si),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * ho * w * (k + 2 * wob_pad),
            bytes_accessed=c * ho * k * w + 4 * c * ho * s * wob_pad
            + s * wb * wob_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes, pc)
    if s == 1:
        return out
    # Drop the per-stripe lane padding: (c, ho, s*wob_pad) ->
    # (c, ho, s, wob_pad)[..., :wob] -> (c, ho, wo).  Tiny (f32 output).
    return out.reshape(c, ho, s, wob_pad)[..., :wob].reshape(c, ho, wo)
