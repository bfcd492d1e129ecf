"""Pallas-kernel equivalence tests (interpret mode on CPU, per SURVEY §4)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from vaudio.config import AuralizerConfig, LiveParams
from vaudio.dsp import hann_sinc_peak
from vaudio.ops import hann_peak_weighted_sum
from vaudio.ops.spectrum_kernel import _hann_peak_from_d
from vaudio.synth import SynthConstants, build_spectrum


CFG = AuralizerConfig()


class TestFastPeakFormula:
    def test_matches_three_sinc_form(self, rng):
        d = np.concatenate([
            rng.uniform(-50, 50, 2048),
            np.array([0.0, 1.0, -1.0, 2.0, -2.0, 0.5, 1e-7, 1 + 1e-7]),
        ]).astype(np.float32)
        fast = np.asarray(_hann_peak_from_d(jnp.asarray(d)))
        ref = np.asarray(hann_sinc_peak(d))
        np.testing.assert_allclose(fast, ref, atol=3e-6)

    def test_exact_special_points(self):
        d = jnp.asarray([0.0, 1.0, -1.0], jnp.float32)
        np.testing.assert_allclose(np.asarray(_hann_peak_from_d(d)),
                                   [0.5, -0.25, -0.25], atol=1e-7)


class TestKernelEquivalence:
    def test_weighted_sum_matches_jnp(self, rng):
        F = CFG.num_bins
        NP = 496
        freqs = CFG.bin_frequencies()
        pf = rng.uniform(20, 20000, NP).astype(np.float32)
        scale = (1.0 / CFG.bin_width * rng.choice(
            [1.0, 0.2], NP)).astype(np.float32)
        w = rng.normal(0, 0.1, (NP, 2)).astype(np.float32)

        got = np.asarray(hann_peak_weighted_sum(
            jnp.asarray(freqs), jnp.asarray(pf), jnp.asarray(scale),
            jnp.asarray(w), num_bins=F, interpret=True))

        d = (freqs[:, None] - pf[None, :]) * scale[None, :]
        W = np.asarray(hann_sinc_peak(jnp.asarray(d)))
        expect = W @ w
        np.testing.assert_allclose(got, expect, atol=5e-4)

    def test_batched_weighted_sum_matches_single(self, rng):
        from vaudio.ops import hann_peak_weighted_sum_batched
        F = CFG.num_bins
        T, NP = 3, 496
        freqs = CFG.bin_frequencies()
        pf = rng.uniform(20, 20000, (T, NP)).astype(np.float32)
        scale = (1.0 / CFG.bin_width * rng.choice(
            [1.0, 0.2], (T, NP))).astype(np.float32)
        w = rng.normal(0, 0.1, (T, NP, 2)).astype(np.float32)
        got = np.asarray(hann_peak_weighted_sum_batched(
            jnp.asarray(freqs), jnp.asarray(pf), jnp.asarray(scale),
            jnp.asarray(w), num_bins=F, interpret=True))
        assert got.shape == (T, F, 2)
        for t in range(T):
            one = np.asarray(hann_peak_weighted_sum(
                jnp.asarray(freqs), jnp.asarray(pf[t]),
                jnp.asarray(scale[t]), jnp.asarray(w[t]), num_bins=F,
                interpret=True))
            np.testing.assert_allclose(got[t], one, atol=1e-5)

    def test_full_spectrum_pallas_vs_jnp(self, rng):
        consts = SynthConstants.create(CFG)
        hues = rng.integers(0, 361, 16).astype(np.int32)
        grads = np.abs(rng.normal(0, 0.3, (16, 4))).astype(np.float32)
        phases = rng.uniform(0, 2 * np.pi, (16, 32)).astype(np.float32)
        prev = rng.normal(0, 0.01, (CFG.num_bins, 2)).astype(np.float32)

        out_jnp = np.asarray(build_spectrum(
            jnp.asarray(hues), jnp.asarray(grads), jnp.asarray(phases),
            jnp.asarray(prev), jnp.float32(0.5), CFG, consts,
            use_pallas=False))
        out_pl = np.asarray(build_spectrum(
            jnp.asarray(hues), jnp.asarray(grads), jnp.asarray(phases),
            jnp.asarray(prev), jnp.float32(0.5), CFG, consts,
            use_pallas=True))
        np.testing.assert_allclose(out_pl, out_jnp, atol=5e-4)

    def test_end_to_end_pallas_config(self, rng):
        # The use_pallas=True config must run through the full step.
        from vaudio.runtime import run_offline
        cfg = dataclasses.replace(CFG, use_pallas=True)
        frames = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        audio_pl, _, _ = run_offline(frames, cfg, LiveParams().as_arrays())
        audio_ref, _, _ = run_offline(frames, CFG, LiveParams().as_arrays())
        np.testing.assert_allclose(np.asarray(audio_pl),
                                   np.asarray(audio_ref), atol=1e-3)


class TestAudioKernel:
    def test_agc_ola_matches_reference_path(self, rng):
        from vaudio.dsp import agc_normalize, hann_window_norm, overlap_add
        from vaudio.ops.audio_kernel import agc_overlap_add
        nfft = 4096
        w = jnp.asarray(hann_window_norm(nfft))
        sig = jnp.asarray(rng.normal(size=nfft).astype(np.float32))
        tail = jnp.asarray(rng.normal(size=nfft).astype(np.float32))
        for rmax, att, rel in [(1.0, 1.0, 1.0), (0.3, 0.5, 0.2),
                               (2.0, 0.0, 1.0)]:
            norm, new_max = agc_normalize(sig, jnp.float32(rmax),
                                          jnp.float32(att), jnp.float32(rel))
            pcm_ref, tail_ref = overlap_add(norm, tail, w)
            pcm, new_tail, nm = agc_overlap_add(
                sig, tail, w, jnp.float32(rmax), jnp.float32(att),
                jnp.float32(rel), interpret=True)
            np.testing.assert_allclose(float(nm), float(new_max), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(pcm), np.asarray(pcm_ref),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(new_tail),
                                       np.asarray(tail_ref), atol=1e-5)

    def test_agc_ola_stereo(self, rng):
        from vaudio.dsp import agc_normalize, hann_window_norm, overlap_add
        from vaudio.ops.audio_kernel import agc_overlap_add
        nfft = 4096
        w = jnp.asarray(hann_window_norm(nfft))
        sig = jnp.asarray(rng.normal(size=(2, nfft)).astype(np.float32))
        tail = jnp.asarray(rng.normal(size=(2, nfft)).astype(np.float32))
        norm, new_max = agc_normalize(sig, jnp.float32(1.0),
                                      jnp.float32(1.0), jnp.float32(1.0))
        pcm_ref, tail_ref = overlap_add(norm, tail, w)
        pcm, new_tail, nm = agc_overlap_add(
            sig, tail, w, jnp.float32(1.0), jnp.float32(1.0),
            jnp.float32(1.0), interpret=True)
        assert pcm.shape == (2, 2048)
        np.testing.assert_allclose(np.asarray(pcm), np.asarray(pcm_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_tail),
                                   np.asarray(tail_ref), atol=1e-5)

    def test_zero_signal(self):
        from vaudio.dsp import hann_window_norm
        from vaudio.ops.audio_kernel import agc_overlap_add
        nfft = 4096
        w = jnp.asarray(hann_window_norm(nfft))
        z = jnp.zeros(nfft, jnp.float32)
        pcm, tail, nm = agc_overlap_add(z, z, w, jnp.float32(1.0),
                                        jnp.float32(1.0), jnp.float32(1.0),
                                        interpret=True)
        assert np.all(np.isfinite(np.asarray(pcm)))


class TestPoolKernel:
    """Fused mip-pool kernel vs the XLA banded-matmul path (exact u8
    math; vision/features.py:156-173)."""

    @pytest.mark.parametrize("shape,level", [
        ((1080, 1920), 3), ((256, 256), 3), ((64, 64), 2), ((135, 240), 1),
        ((2160, 3840), 3),    # 4K: column-split grid with padded stripes
    ])
    def test_matches_xla_path(self, rng, shape, level):
        from vaudio.ops import mip_pool_pallas
        from vaudio.vision.features import mip_downsample_planes
        h, w = shape
        planes = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
        got = np.asarray(mip_pool_pallas(
            jnp.asarray(planes), level, scale=1 / 255.0, interpret=True))
        ref = np.asarray(mip_downsample_planes(
            jnp.asarray(planes), level, scale=1 / 255.0))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-6)

    def test_rejects_non_u8(self, rng):
        from vaudio.ops import mip_pool_pallas
        with pytest.raises(AssertionError):
            mip_pool_pallas(jnp.zeros((3, 64, 64), jnp.float32), 3,
                            interpret=True)

    def test_supports_predicate(self):
        from vaudio.ops.pool_kernel import supports
        assert supports(1080, 1920, 3)          # single-block
        assert supports(2160, 3840, 3)          # column-split (S=2)
        assert not supports(4, 32, 3)           # too small
        assert not supports(64, 64, 0)          # level out of range
        # huge plane with an un-splittable width (prime-ish) falls back
        assert not supports(4096, 4096 + 8, 3)


class TestVisionEpilogueKernel:
    """Fused HSI+histogram+stencil+stats kernel vs the XLA stages
    (interpret mode: same acos, so integer counts must match exactly)."""

    def _xla_reference(self, mip, cfg):
        from vaudio.vision import features as F
        h, s, i = F.rgb_to_hsi_planes(mip[0], mip[1], mip[2])
        hist = F.hue_histogram_planes(h, s, i, cfg)
        imodes = F.feature_stencil_plane(i)
        grads = F.cell_gradient_stats_planes(imodes, cfg)
        return np.asarray(hist), np.asarray(grads)

    @pytest.mark.parametrize("shape", [(16, 16), (135, 240), (34, 48)])
    def test_matches_xla_stages(self, rng, shape):
        from vaudio.ops.vision_kernel import supports, vision_stats_pallas
        cfg = CFG
        mip = rng.uniform(0, 1, (3,) + shape).astype(np.float32)
        assert supports(shape[0], shape[1], cfg)
        hist, grads = vision_stats_pallas(jnp.asarray(mip), cfg,
                                          interpret=True)
        hist_ref, grads_ref = self._xla_reference(jnp.asarray(mip), cfg)
        np.testing.assert_array_equal(np.asarray(hist), hist_ref)
        np.testing.assert_allclose(np.asarray(grads), grads_ref,
                                   rtol=1e-5, atol=1e-6)

    def test_gates_and_greys(self, rng):
        """Grey pixels (den == 0) and dark pixels must gate exactly like
        the XLA path."""
        from vaudio.ops.vision_kernel import vision_stats_pallas
        cfg = CFG
        mip = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
        mip[:, :8, :] = 0.05          # dark: fails intensity gate
        mip[:, 8:16, :] = 0.7         # grey: S == 0, fails sat gate
        hist, grads = vision_stats_pallas(jnp.asarray(mip), cfg,
                                          interpret=True)
        hist_ref, grads_ref = self._xla_reference(jnp.asarray(mip), cfg)
        np.testing.assert_array_equal(np.asarray(hist), hist_ref)
        np.testing.assert_allclose(np.asarray(grads), grads_ref,
                                   rtol=1e-5, atol=1e-6)

    def test_supports_gating(self):
        from vaudio.ops.vision_kernel import supports
        cfg = CFG
        assert not supports(16, 17, cfg)       # wm % cells != 0
        assert not supports(1, 16, cfg)        # degenerate
        cfg2 = dataclasses.replace(CFG, linear_cell_grads=False)
        assert not supports(16, 16, cfg2)      # spatial grads unsupported

    def test_frame_stats_integration(self, rng, monkeypatch):
        """cfg.use_pallas_vision routes frame_stats through the fused
        kernel (CPU interpret escape hatch) with identical outputs."""
        from vaudio import vision
        from vaudio.vision import features
        frame = rng.integers(0, 256, (128, 128, 3)).astype(np.uint8)
        cfg_off = dataclasses.replace(CFG, mip_level=3)
        h_off, g_off, _ = vision.frame_stats(frame, cfg_off)
        monkeypatch.setattr(features, "_PALLAS_POOL_ON_CPU", True)
        cfg_on = dataclasses.replace(CFG, mip_level=3,
                                     use_pallas_vision=True,
                                     use_pallas_pool=False)
        h_on, g_on, _ = vision.frame_stats(frame, cfg_on)
        np.testing.assert_array_equal(np.asarray(h_on), np.asarray(h_off))
        np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                                   rtol=1e-5, atol=1e-6)

    def test_vmapped_over_frames(self, rng):
        """The chunked pipeline vmaps frame_stats; the kernel must batch."""
        import jax
        from vaudio.ops.vision_kernel import vision_stats_pallas
        cfg = CFG
        mips = rng.uniform(0, 1, (4, 3, 32, 32)).astype(np.float32)
        hist_b, grads_b = jax.vmap(
            lambda m: vision_stats_pallas(m, cfg, interpret=True))(
                jnp.asarray(mips))
        for t in range(4):
            h1, g1 = vision_stats_pallas(jnp.asarray(mips[t]), cfg,
                                         interpret=True)
            np.testing.assert_array_equal(np.asarray(hist_b[t]),
                                          np.asarray(h1))
            np.testing.assert_allclose(np.asarray(grads_b[t]),
                                       np.asarray(g1), atol=1e-6)

    def test_batched_matches_per_frame(self, rng):
        from vaudio.ops.vision_kernel import (vision_stats_pallas,
                                              vision_stats_pallas_batched)
        cfg = CFG
        mips = rng.uniform(0, 1, (6, 3, 32, 32)).astype(np.float32)
        hb, gb = vision_stats_pallas_batched(jnp.asarray(mips), cfg,
                                             interpret=True)
        for t in range(6):
            h1, g1 = vision_stats_pallas(jnp.asarray(mips[t]), cfg,
                                         interpret=True)
            np.testing.assert_array_equal(np.asarray(hb[t]),
                                          np.asarray(h1))
            np.testing.assert_allclose(np.asarray(gb[t]), np.asarray(g1),
                                       atol=1e-6)

    def test_chunked_pipeline_with_vision_kernel(self, rng, monkeypatch):
        """End to end: the chunk-batched pipeline with the fused epilogue
        produces the same audio as the XLA stages."""
        from vaudio.runtime import run_offline_batched
        from vaudio.vision import features
        frames = rng.integers(0, 256, (10, 128, 128, 3)).astype(np.uint8)
        cfg_off = dataclasses.replace(CFG, use_pallas_pool=False)
        audio_off, _, _ = run_offline_batched(frames, cfg_off)
        monkeypatch.setattr(features, "_PALLAS_POOL_ON_CPU", True)
        cfg_on = dataclasses.replace(CFG, use_pallas_vision=True,
                                     use_pallas_pool=False)
        audio_on, _, _ = run_offline_batched(frames, cfg_on)
        np.testing.assert_allclose(np.asarray(audio_on),
                                   np.asarray(audio_off), atol=2e-5)
