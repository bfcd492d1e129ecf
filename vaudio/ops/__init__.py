"""Fused Pallas TPU kernels for the hot compute paths.

These are the TPU-native equivalents of the reference's Metal compute
shaders (SURVEY.md §2.6-2.8) — not stand-ins: the synthesis kernel fuses
peak evaluation + weighting + reduction in VMEM, never materializing the
(bins x partials) peak matrix to HBM.
"""

from vaudio.ops.pool_kernel import mip_pool_pallas
from vaudio.ops.spectrum_kernel import (
    hann_peak_weighted_sum,
    hann_peak_weighted_sum_batched,
    spectrum_pallas,
)
from vaudio.ops.vision_kernel import vision_stats_pallas

__all__ = ["hann_peak_weighted_sum", "hann_peak_weighted_sum_batched",
           "mip_pool_pallas", "spectrum_pallas", "vision_stats_pallas"]
