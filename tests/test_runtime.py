"""Runtime-step and golden end-to-end tests (SURVEY.md §4 strategy).

The golden test drives the pipeline with deterministic solid-color frames —
the reference's TutorialView fake-backend pattern — and asserts the audio
spectrum peaks at the snapped 220*2^(3h/360) comb.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vaudio.config import AuralizerConfig, LiveParams
from vaudio.io import hsb_frames, solid_color_frames
from vaudio.runtime import StepCarry, init_carry, make_step, run_offline
from vaudio.synth import SynthConstants

import oracles


CFG = AuralizerConfig()
PARAMS = LiveParams().as_arrays()


def instant_params():
    """No smoothing: hue/spectrum EMAs snap instantly."""
    return LiveParams(spectrum_mixing=0.0).as_arrays()


class TestFrameStep:
    def test_shapes_and_state_update(self, rng):
        step = make_step(CFG, debug=True, jit=False)
        carry = init_carry(CFG)
        frame = jnp.asarray(
            rng.uniform(0, 1, (256, 256, 3)).astype(np.float32))
        carry2, out = step(carry, frame, PARAMS)
        assert out["pcm"].shape == (2048,)
        assert out["spectrum"].shape == (2047, 2)
        assert carry2.hues.shape == (16,)
        assert np.all(np.isfinite(np.asarray(out["pcm"])))
        # Phases must have advanced.
        assert not np.allclose(np.asarray(carry2.phases), 0.0)

    def test_jit_matches_eager(self, rng):
        frame = jnp.asarray(
            rng.uniform(0, 1, (128, 128, 3)).astype(np.float32))
        eager = make_step(CFG, jit=False)
        jitted = make_step(CFG, jit=True)
        _, out_e = eager(init_carry(CFG), frame, PARAMS)
        _, out_j = jitted(init_carry(CFG), frame, PARAMS)
        np.testing.assert_allclose(np.asarray(out_e["pcm"]),
                                   np.asarray(out_j["pcm"]), atol=2e-4)

    def test_scan_matches_sequential_steps(self, rng):
        frames = rng.uniform(0, 1, (4, 128, 128, 3)).astype(np.float32)
        # Sequential
        step = make_step(CFG, jit=False)
        carry = init_carry(CFG)
        pcm_seq = []
        for f in frames:
            carry, out = step(carry, jnp.asarray(f), PARAMS)
            pcm_seq.append(np.asarray(out["pcm"]))
        pcm_seq = np.concatenate(pcm_seq)
        # Scan
        audio, final, _ = run_offline(frames, CFG, PARAMS)
        np.testing.assert_allclose(np.asarray(audio), pcm_seq, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(final.hues),
                                      np.asarray(carry.hues))

    def test_black_video_is_silent(self):
        frames = np.zeros((3, 64, 64, 3), np.float32)
        audio, _, _ = run_offline(frames, CFG, PARAMS)
        # All-black frames: histogram gated out, hues stay 0 -> cells still
        # synthesize at hue 0 BUT grads are all zero -> harmonics beyond h=1
        # are zero-tilted; signal exists but must be finite and bounded.
        a = np.asarray(audio)
        assert np.all(np.isfinite(a))
        assert np.abs(a).max() <= 2.0


class TestGoldenSolidColor:
    """Known hue -> known fundamental comb (BASELINE config 1 analogue)."""

    def sonify_solid(self, rgb, n_frames=8, size=256):
        frames = solid_color_frames(rgb, width=size, height=size,
                                    num_frames=n_frames)
        audio, carry, dbg = run_offline(frames, CFG, instant_params(),
                                        debug=True)
        return np.asarray(audio), carry, dbg

    def expected_f0(self, hue_bin):
        consts = SynthConstants.create(CFG)
        f0_raw = 220.0 * 2.0 ** (hue_bin / 360.0 * 3.0)
        return consts.freqs[
            oracles.find_closest_index_np(consts.freqs, f0_raw)]

    def dominant_freqs(self, audio, top=8):
        # Analyze the steady-state tail.
        tail = audio[-4096:]
        spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
        freqs = np.fft.rfftfreq(len(tail), 1 / 44100.0)
        peaks = np.argsort(spec)[::-1][:top]
        return freqs[peaks], spec

    def test_red_frame_fundamental(self):
        audio, carry, dbg = self.sonify_solid([1.0, 0.05, 0.05])
        hues = np.asarray(carry.hues)
        # Red -> hue bin ~0 (tiny g/b offsets keep S>0 without moving hue
        # more than a bin or two)
        assert np.all(hues <= 3)
        f0 = self.expected_f0(int(hues[0]))
        dom, _ = self.dominant_freqs(audio)
        # Strongest component within a bin of the fundamental
        assert np.min(np.abs(dom - f0)) < 2 * CFG.bin_width

    def test_green_frame_higher_f0(self):
        audio_r, carry_r, _ = self.sonify_solid([1.0, 0.05, 0.05])
        audio_g, carry_g, _ = self.sonify_solid([0.05, 1.0, 0.05])
        hue_g = int(np.asarray(carry_g.hues)[0])
        # Green hue ~ bin 120 -> f0 ~ 220*2^(1) = 440
        assert 110 <= hue_g <= 130
        f0_g = self.expected_f0(hue_g)
        dom, _ = self.dominant_freqs(audio_g)
        assert np.min(np.abs(dom - f0_g)) < 2 * CFG.bin_width

    def test_hsb_tutorial_source(self):
        # The tutorial screen's HSB slider path: hue slider at 0.5
        frames = hsb_frames(0.5, 1.0, 1.0, width=256, height=256,
                            num_frames=6)
        audio, carry, _ = run_offline(frames, CFG, instant_params())
        hues = np.asarray(carry.hues)
        assert np.all((hues >= 175) & (hues <= 185))  # cyan ~ bin 180
        assert np.all(np.isfinite(np.asarray(audio)))

    def test_1080p_production_resolution_golden(self):
        """Correctness at the production resolution, on CPU: 3 frames of
        1080x1920 exercise the odd mip-3 dims 135x240 — the real
        odd-dimension pooling path (VisionEngine.swift:189-192, width>>3 =
        240, height>>3 = 135) — and must still produce the golden hue and
        the spectral peak at the snapped fundamental."""
        frames = solid_color_frames([0.05, 1.0, 0.05], width=1920,
                                    height=1080, num_frames=3)
        audio, carry, dbg = run_offline(frames, CFG, instant_params(),
                                        debug=True)
        hues = np.asarray(carry.hues)
        assert np.all((hues >= 110) & (hues <= 130))     # green ~ bin 120
        assert np.all(hues == hues[0])                   # uniform frame
        # Uniform frame -> zero gradients even across the odd-dim pools.
        np.testing.assert_allclose(np.asarray(dbg["grads"][-1]), 0.0,
                                   atol=1e-5)
        f0 = self.expected_f0(int(hues[0]))
        dom, _ = self.dominant_freqs(np.asarray(audio))
        assert np.min(np.abs(dom - f0)) < 2 * CFG.bin_width

    def test_uniform_frame_all_cells_agree(self):
        _, carry, dbg = self.sonify_solid([0.2, 0.3, 0.9])
        hues = np.asarray(carry.hues)
        assert np.all(hues == hues[0])
        grads = np.asarray(dbg["grads"][-1])
        np.testing.assert_allclose(grads, 0.0, atol=1e-5)


class TestStreamContinuity:
    def test_no_frame_boundary_clicks(self):
        # Constant input -> after warmup, adjacent hops must join without
        # large discontinuities (the OLA + phase-accumulation contract).
        frames = solid_color_frames([1.0, 0.1, 0.1], width=256, height=256,
                                    num_frames=12)
        audio, _, _ = run_offline(frames, CFG, instant_params())
        a = np.asarray(audio)[4 * 2048:]  # skip warmup
        # Max sample-to-sample jump across hop boundaries should be of the
        # same order as within-hop jumps.
        jumps = np.abs(np.diff(a))
        boundary_jumps = jumps[2047::2048]
        assert boundary_jumps.max() <= 10 * np.percentile(jumps, 99.5)

    def test_running_max_converges(self):
        frames = solid_color_frames([1.0, 0.1, 0.1], width=256, height=256,
                                    num_frames=10)
        params = LiveParams(attack=0.5, release=0.1).as_arrays()
        _, carry, _ = run_offline(frames, CFG, params)
        assert float(carry.running_max) > 0


class TestQuirkModes:
    def test_clean_vs_quirk_differ(self, rng):
        frames = rng.uniform(0, 1, (3, 128, 128, 3)).astype(np.float32)
        a_quirk, _, _ = run_offline(frames, CFG, PARAMS)
        clean = dataclasses.replace(CFG, quirk_compat=False)
        a_clean, _, _ = run_offline(frames, clean, PARAMS)
        # Different phase-buffer read layouts must audibly differ.
        assert not np.allclose(np.asarray(a_quirk), np.asarray(a_clean),
                               atol=1e-4)


class TestUint8Ingest:
    def test_uint8_matches_float(self, rng):
        u8 = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
        f32 = u8.astype(np.float32) / 255.0
        a_u8, _, _ = run_offline(u8, CFG, PARAMS)
        a_f32, _, _ = run_offline(f32, CFG, PARAMS)
        np.testing.assert_allclose(np.asarray(a_u8), np.asarray(a_f32),
                                   atol=2e-4)


class TestTimbreModulation:
    """Gradient modes must modulate the synthesized timbre (the core
    feature of the reference: SpectrumCompute.metal:114-117,160-161,183)."""

    def _spectrum_for(self, frame_fn, n=6, size=256):
        frames = np.stack([frame_fn(t) for t in range(n)])
        _, carry, dbg = run_offline(frames, CFG, instant_params(),
                                    debug=True)
        spec = np.asarray(dbg["spectrum"][-1])
        return np.hypot(spec[:, 0], spec[:, 1]), np.asarray(dbg["grads"][-1])

    def test_vertical_gradient_drives_vtilt_and_even_harmonics(self):
        size = 256
        base = np.zeros((size, size, 3), np.float32)
        base[..., 0] = 1.0  # red

        def flat(t):
            return base

        def striped(t):
            f = base.copy()
            # Horizontal stripes in intensity -> "horizontal tilt" mode
            # (vertical-direction gradient) and breathing respond.
            f[:, :, 0] *= (0.55 + 0.45 * np.sign(
                np.sin(np.arange(size) * 0.8)))[:, None]
            return f

        mag_flat, grads_flat = self._spectrum_for(flat)
        mag_str, grads_str = self._spectrum_for(striped)
        # Flat frame: all gradient stats ~0. Striped: nonzero.
        assert np.abs(grads_flat).max() < 1e-5
        assert np.abs(grads_str).max() > 1e-3
        # Striped spectrum must differ from flat (timbre changed).
        assert not np.allclose(mag_flat, mag_str, atol=1e-5)


class TestYuvStreamIngest:
    def test_offline_yuv_dict_frames(self, rng):
        # run_offline over a pytree of stacked YUV planes.
        frames = {
            "y": rng.integers(16, 236, (3, 64, 64)).astype(np.uint8),
            "u": rng.integers(16, 240, (3, 32, 32)).astype(np.uint8),
            "v": rng.integers(16, 240, (3, 32, 32)).astype(np.uint8),
        }
        audio, carry, _ = run_offline(frames, CFG, PARAMS)
        assert np.asarray(audio).shape == (3 * 2048,)
        assert np.all(np.isfinite(np.asarray(audio)))

    def test_streaming_yuv_source(self, tmp_path, rng):
        from vaudio.api import Auralizer
        from vaudio.io import Yuv420FileSource
        h, w, n = 64, 64, 4
        data = rng.integers(0, 256,
                            n * (h * w * 3 // 2)).astype(np.uint8)
        p = str(tmp_path / "c.yuv")
        data.tofile(p)
        src = Yuv420FileSource(p, width=w, height=h, raw=True)
        aur = Auralizer()
        aur.run_until_exhausted(src.frames())
        assert aur.metrics["frames_processed"] == n


class TestInputValidation:
    def test_bad_shape_raises_clearly(self):
        with pytest.raises(ValueError, match=r"\[T, H, W, 3\]"):
            run_offline(np.zeros((64, 64, 3), np.float32), CFG, PARAMS)

    def test_list_of_frames_equals_stacked(self):
        """A Python list of frames must scan over FRAMES, not be treated
        as a pytree of per-frame leaves (which would scan each frame's
        H axis)."""
        frames = solid_color_frames([0.9, 0.3, 0.2], 64, 64, 3)
        a_stacked, _, _ = run_offline(np.asarray(frames), CFG, PARAMS)
        a_list, _, _ = run_offline(list(np.asarray(frames)), CFG, PARAMS)
        np.testing.assert_array_equal(np.asarray(a_list),
                                      np.asarray(a_stacked))

    def test_caller_carry_not_consumed(self):
        """run_offline donates its carry internally; the CALLER's carry
        arrays must survive (resume/retry/inspection) — a second run
        from the same checkpoint must work and match."""
        frames = np.asarray(solid_color_frames([0.2, 0.8, 0.3], 64, 64, 2))
        carry = init_carry(CFG)
        a1, _, _ = run_offline(frames, CFG, PARAMS, carry=carry)
        a2, _, _ = run_offline(frames, CFG, PARAMS, carry=carry)
        assert int(np.asarray(carry.hues).sum()) == 0   # still readable
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_caller_carry_not_consumed_chunked(self):
        from vaudio.runtime.chunked import run_offline_batched
        frames = np.asarray(solid_color_frames([0.2, 0.8, 0.3], 64, 64, 4))
        carry = init_carry(CFG)
        a1, _, _ = run_offline_batched(frames, CFG, PARAMS, carry=carry,
                                       chunk=2)
        a2, _, _ = run_offline_batched(frames, CFG, PARAMS, carry=carry,
                                       chunk=2)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
