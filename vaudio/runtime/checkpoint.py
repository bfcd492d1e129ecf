"""DSP-state checkpoint/resume.

The reference has no checkpointing (SURVEY.md §5): its only persistent
state is the in-memory DSP carry (phase accumulators, previous spectrum,
OLA tail, AGC running max), and ``stop()`` clears buffers but not phases.
Here the carry is an explicit pytree, so saving/resuming a stream — or
migrating it across chips — is a plain serialization of five arrays.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from vaudio.config import AuralizerConfig
from vaudio.runtime.step import StepCarry, init_carry

_FIELDS = ("hues", "phases", "prev_spectrum", "ola_tail", "running_max")


def save_state(path: str, carry: StepCarry) -> None:
    """Serialize a stream's DSP carry to an .npz file.  ``path`` may be
    a filesystem path or a binary file object (np.savez accepts both —
    the HTTP servers checkpoint into BytesIO)."""
    np.savez(path, **{f: np.asarray(getattr(carry, f)) for f in _FIELDS})


def load_state(path: str, cfg: AuralizerConfig,
               n_streams: int | None = None) -> StepCarry:
    """Restore a carry; validates shapes against the config.

    ``n_streams``: expect a BATCHED carry (leading stream axis of that
    size) — the multi-stream pod checkpoint shape
    (runtime.multistream).  None = the single-stream shape.
    ``path`` may be a path or a binary file object (see save_state)."""
    data = np.load(path)
    ref = init_carry(cfg)
    kwargs = {}
    for f in _FIELDS:
        arr = data[f]
        expect = getattr(ref, f).shape
        if n_streams is not None:
            expect = (n_streams,) + tuple(expect)
        if tuple(arr.shape) != tuple(expect):
            raise ValueError(
                f"checkpoint field {f!r} has shape {arr.shape}, config "
                f"expects {expect} — wrong AuralizerConfig"
                f"{' or pod size' if n_streams is not None else ''}?")
        kwargs[f] = jnp.asarray(arr)
    return StepCarry(**kwargs)
