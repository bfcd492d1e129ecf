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


def carry_type_of(data) -> str | None:
    """The carry-class marker a checkpoint was saved with (``None`` for
    pre-marker files — those are always flagship StepCarry saves)."""
    if "carry_type" in data.files:
        return str(data["carry_type"])
    return None


def save_state(path: str, carry) -> None:
    """Serialize a stream's DSP carry to an .npz file.  ``path`` may be
    a filesystem path or a binary file object (np.savez accepts both —
    the HTTP servers checkpoint into BytesIO).  Works for any
    NamedTuple carry (the flagship :class:`StepCarry` and the
    OrthoModes family's per-pixel carry alike); the matching engine's
    ``load_carry`` validates on restore."""
    np.savez(path, carry_type=np.array(type(carry).__name__),
             **{f: np.asarray(getattr(carry, f))
                for f in type(carry)._fields})


def load_state(path: str, cfg: AuralizerConfig,
               n_streams: int | None = None) -> StepCarry:
    """Restore a carry; validates shapes against the config.

    ``n_streams``: expect a BATCHED carry (leading stream axis of that
    size) — the multi-stream pod checkpoint shape
    (runtime.multistream).  None = the single-stream shape.
    ``path`` may be a path or a binary file object (see save_state)."""
    data = np.load(path)
    kind = carry_type_of(data)
    if kind not in (None, "StepCarry"):
        raise ValueError(
            f"checkpoint holds a {kind!r} carry, not the flagship "
            "StepCarry — saved by another model family?")
    missing = set(_FIELDS) - set(data.files)
    if missing:
        raise ValueError(
            f"checkpoint is missing flagship carry fields "
            f"{sorted(missing)} — saved by another model family?")
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
