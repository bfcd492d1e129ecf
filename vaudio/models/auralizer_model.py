"""The flagship model: the full video->audio pipeline as a bundled object.

``AuralizerModel`` packages the configuration, baked synthesis constants and
the jitted step so callers (benchmarks, the graft entry point, serving
wrappers) get one coherent handle.  It is intentionally thin: the pipeline
itself is the pure function ``vaudio.runtime.frame_step``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from vaudio.config import AuralizerConfig
from vaudio.runtime import StepCarry, init_carry, make_step
from vaudio.runtime.step import default_params


class AuralizerModel:
    """Config + compiled step + state factory for one video resolution."""

    def __init__(self, config: Optional[AuralizerConfig] = None,
                 debug: bool = False):
        self.config = config or AuralizerConfig()
        self.step = make_step(self.config, debug=debug)
        self.eager_step = make_step(self.config, debug=debug, jit=False)

    def init_state(self) -> StepCarry:
        return init_carry(self.config)

    def default_params(self) -> Dict[str, np.float32]:
        return default_params(self.config)

    def example_inputs(self, height: int = 1080, width: int = 1920
                       ) -> Tuple[StepCarry, jnp.ndarray, Dict]:
        frame = jnp.zeros((height, width, 3), jnp.float32)
        return self.init_state(), frame, self.default_params()

    def __call__(self, carry, frame, params):
        return self.step(carry, frame, params)
