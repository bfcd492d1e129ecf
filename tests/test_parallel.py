"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: shard_map configs tested without a real TPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vaudio.config import AuralizerConfig, LiveParams
from vaudio.parallel import (init_carry_batch, make_batched_step,
                             make_parallel_step, make_stream_mesh,
                             run_offline_parallel)
from vaudio.runtime import init_carry, make_step, run_offline


CFG = AuralizerConfig()
PARAMS = LiveParams().as_arrays()


@pytest.fixture(scope="module")
def frames8(request):
    rng = np.random.default_rng(42)
    return rng.uniform(0, 1, (8, 3, 64, 64, 3)).astype(np.float32)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


class TestBatchedStep:
    def test_matches_sequential(self, frames8):
        step1 = make_step(CFG, jit=False)
        stepN = make_batched_step(CFG, jit=True)
        carryN = init_carry_batch(CFG, 8)
        carryN, outN = stepN(carryN, jnp.asarray(frames8[:, 0]), PARAMS)
        for s in range(0, 8, 3):
            _, out1 = step1(init_carry(CFG), jnp.asarray(frames8[s, 0]),
                            PARAMS)
            np.testing.assert_allclose(np.asarray(outN["pcm"][s]),
                                       np.asarray(out1["pcm"]), atol=2e-4)


class TestParallelStep:
    @pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
    def test_matches_single_device(self, frames8, mesh_shape):
        n_stream, n_cell = mesh_shape
        mesh = make_stream_mesh(n_stream, n_cell)
        stepP = make_parallel_step(CFG, mesh)
        stepB = make_batched_step(CFG)
        carryP, outP = stepP(init_carry_batch(CFG, 8),
                             jnp.asarray(frames8[:, 0]), PARAMS)
        carryB, outB = stepB(init_carry_batch(CFG, 8),
                             jnp.asarray(frames8[:, 0]), PARAMS)
        np.testing.assert_allclose(np.asarray(outP["pcm"]),
                                   np.asarray(outB["pcm"]), atol=3e-4)
        np.testing.assert_array_equal(np.asarray(carryP.hues),
                                      np.asarray(carryB.hues))

    def test_collective_present_in_hlo(self):
        # The cell axis must introduce a real reduction collective.
        mesh = make_stream_mesh(2, 4)
        step = make_parallel_step(CFG, mesh, jit=False)
        carry = init_carry_batch(CFG, 2)
        frames = jnp.zeros((2, 64, 64, 3), jnp.float32)
        hlo = jax.jit(step).lower(carry, frames, PARAMS).as_text()
        assert "all_reduce" in hlo or "all-reduce" in hlo


class TestOfflineParallel:
    def test_matches_offline_per_stream(self, frames8):
        mesh = make_stream_mesh(4, 2)
        audio_p, final = run_offline_parallel(frames8, CFG, mesh, PARAMS)
        audio_p = np.asarray(audio_p)
        assert audio_p.shape == (8, 3 * 2048)
        for s in (0, 5):
            a_ref, _, _ = run_offline(frames8[s], CFG, PARAMS)
            np.testing.assert_allclose(audio_p[s], np.asarray(a_ref),
                                       atol=3e-4)

    def test_output_sharded_over_streams(self, frames8):
        mesh = make_stream_mesh(8, 1)
        audio_p, final = run_offline_parallel(frames8, CFG, mesh, PARAMS)
        assert np.asarray(final.hues).shape == (8, 16)
