"""Runtime — the per-frame device step and its execution modes.

The reference's hot path is three GPU command buffers with CPU completion
handlers in between (SURVEY.md §3.3).  Here the *entire* frame->audio
pipeline — mip pyramid, HSI features, histogram, hue/gradient reductions,
phase accumulation, spectral synthesis, inverse FFT, AGC and overlap-add —
is one jitted XLA program:  ``step(carry, frame, params) -> (carry, out)``.

Execution modes:

* :func:`make_step` — compile the single-frame step (streaming building
  block, also the `__graft_entry__` surface).
* :func:`run_offline` — ``lax.scan`` over a decoded video tensor, the
  whole-clip batch path.
* :class:`vaudio.runtime.stream.StreamingAuralizer` — the live host loop
  with the reference's ring-buffer/warm-up/drop semantics.
* :class:`vaudio.runtime.multistream.MultiStreamAuralizer` — the serving
  pod: N concurrent streams batched through one dispatch per tick.
"""

from vaudio.runtime.checkpoint import load_state, save_state
from vaudio.runtime.multistream import MultiStreamAuralizer
from vaudio.runtime.control import ControlChannel, LiveDebugRenderer
from vaudio.runtime.server import LiveServer
from vaudio.runtime.podserver import PodServer
from vaudio.runtime.chunked import (
    chunk_pipeline,
    make_chunk_pipeline,
    run_offline_batched,
)
from vaudio.runtime.step import (
    StepCarry,
    frame_step,
    init_carry,
    make_step,
    run_offline,
)

__all__ = [
    "ControlChannel",
    "LiveDebugRenderer",
    "LiveServer",
    "PodServer",
    "MultiStreamAuralizer",
    "StepCarry",
    "load_state",
    "save_state",
    "frame_step",
    "init_carry",
    "make_step",
    "run_offline",
    "chunk_pipeline",
    "make_chunk_pipeline",
    "run_offline_batched",
]
