"""Utilities: profiling/tracing, logging, and display-space helpers.

The observability layer (SURVEY.md §5): the reference's instrumentation is a
single wall-clock latency probe plus ``@Published`` state feeding its debug
views; here the equivalents are :mod:`vaudio.utils.profiling` (jax.profiler
traces + host-side timers) and :mod:`vaudio.utils.display` (the
SpectrumView / VisualizePeak math as data, not pixels).
"""

from vaudio.utils.profiling import FrameTimer, trace_context
from vaudio.utils.display import peak_shape_curve, spectrum_display

__all__ = ["FrameTimer", "trace_context", "peak_shape_curve",
           "spectrum_display"]
