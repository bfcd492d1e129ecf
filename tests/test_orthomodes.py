"""Tests for the OrthoModes per-pixel model family (reconstruction of the
reference's abandoned design, computeOrthogonalModes.metal:14-150)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vaudio.models import ModeMultipliers, OrthoModesConfig, OrthoModesModel
from vaudio.models.orthomodes import extract_pixel_modes


CFG = OrthoModesConfig(mip_level=3)


def params(**kw):
    d = {**ModeMultipliers().as_arrays(),
         "spectrum_mixing": np.float32(0.0),
         "attack": np.float32(1.0), "release": np.float32(1.0)}
    d.update({k: np.float32(v) for k, v in kw.items()})
    return d


class TestExtraction:
    def _oracle_pixel(self, rgb5, mults):
        """Literal transcription of the kernel for one pixel given its
        (C, N, S, E, W) RGB samples."""
        import math

        def hsi(rgb):
            r, g, b = rgb
            i = (r + g + b) / 3.0
            mn, mx = min(rgb), max(rgb)
            s = (mx - mn) / mx if i > 1e-6 else 0.0
            num = 0.5 * ((r - g) + (r - b))
            den = math.sqrt((r - g) ** 2 + (r - b) * (g - b))
            theta = math.acos(max(-1, min(1, num / den))) if den > 1e-6 \
                else 0.0
            h = theta if b <= g else 2 * math.pi - theta
            return i, s, 390.0 / (2 * math.pi) * h + 400.0

        (ic, sc, f0), (i_n, s_n, _), (i_s, s_s, _), (i_e, s_e, _), \
            (i_w, s_w, _) = [hsi(x) for x in rgb5]
        inv = 0.70710678
        di = [i_n - ic, i_s - ic, i_e - ic, i_w - ic]
        ds = [s_n - sc, s_s - sc, s_e - sc, s_w - sc]
        im = [0.5 * sum(di), inv * (di[0] - di[1]), inv * (di[2] - di[3]),
              0.5 * (di[0] - di[2] + di[1] - di[3])]
        sm = [0.5 * sum(ds), inv * (ds[0] - ds[1]), inv * (ds[2] - ds[3]),
              0.5 * (ds[0] - ds[2] + ds[1] - ds[3])]
        wb, wv, wh, ws = mults
        a = max(0.0, 255.0 * (ic + im[0] * wb + im[1] * wv + im[2] * wh
                              + im[3] * ws))
        q = min(1.0, max(0.0, sc + sm[0] * wb + sm[1] * wv + sm[2] * wh
                         + sm[3] * ws))
        return a, q, f0

    def test_against_pixel_oracle(self, rng):
        # mip_level 0 makes the mip a no-op so the stencil is directly
        # comparable to the oracle.
        cfg = OrthoModesConfig(mip_level=0)
        frame = rng.uniform(0.05, 1.0, (6, 6, 3)).astype(np.float32)
        mults = (0.3, 0.7, 0.2, 0.9)
        amp, q, f0 = (np.asarray(x) for x in extract_pixel_modes(
            jnp.asarray(frame),
            {"breathing": np.float32(mults[0]),
             "vertical_tilt": np.float32(mults[1]),
             "horizontal_tilt": np.float32(mults[2]),
             "shear": np.float32(mults[3])}, cfg))
        h, w = 6, 6
        for y, x in [(0, 0), (2, 3), (5, 5), (3, 0)]:
            def px(dy, dx):
                return frame[min(max(y + dy, 0), h - 1),
                             min(max(x + dx, 0), w - 1)]
            a_o, q_o, f_o = self._oracle_pixel(
                [px(0, 0), px(-1, 0), px(1, 0), px(0, 1), px(0, -1)], mults)
            i = y * w + x
            assert np.isclose(amp[i], a_o, atol=1e-3), (y, x)
            assert np.isclose(q[i], q_o, atol=1e-5), (y, x)
            assert np.isclose(f0[i], f_o, atol=1e-2), (y, x)

    def test_f0_range(self, rng):
        frame = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        _, _, f0 = extract_pixel_modes(jnp.asarray(frame),
                                       ModeMultipliers().as_arrays(), CFG)
        f0 = np.asarray(f0)
        assert np.all((f0 >= 400.0 - 1e-3) & (f0 <= 790.0 + 1e-3))

    def test_uniform_frame_modes_vanish(self):
        # Uniform color: all neighbor diffs zero -> A = 255*I, Q = S.
        frame = np.full((16, 16, 3), 0.0, np.float32)
        frame[..., 0] = 0.9
        frame[..., 1] = 0.3
        amp, q, f0 = (np.asarray(x) for x in extract_pixel_modes(
            jnp.asarray(frame), ModeMultipliers(1, 1, 1, 1).as_arrays(),
            CFG))
        np.testing.assert_allclose(amp, 255.0 * (0.9 + 0.3) / 3, rtol=1e-5)
        np.testing.assert_allclose(q, (0.9 - 0.0) / 0.9, rtol=1e-5)
        assert np.allclose(f0, f0[0])


class TestSynthesis:
    def test_uniform_frame_peak_at_hue_f0(self):
        model = OrthoModesModel(CFG)
        frame = np.zeros((64, 64, 3), np.float32)
        frame[..., 0] = 1.0   # red: hue 0 -> f0 = 400 Hz
        frames = np.repeat(frame[None], 6, axis=0)
        audio = model.sonify(frames, params())
        assert audio.shape == (6 * 2048,)
        tail = audio[-4096:]
        spec = np.abs(np.fft.rfft(tail * np.hanning(4096)))
        fgrid = np.fft.rfftfreq(4096, 1 / 44100.0)
        peak_f = fgrid[np.argmax(spec)]
        assert abs(peak_f - 400.0) < 25.0

    def test_q_narrows_peak(self):
        # Saturated (high Q) vs desaturated input: the saturated peak must
        # be narrower around f0.
        model = OrthoModesModel(CFG)

        def spectrum_for(sat):
            f = np.zeros((64, 64, 3), np.float32)
            f[..., 0] = 0.8
            f[..., 1] = f[..., 2] = 0.8 * (1 - sat)
            frames = np.repeat(f[None], 4, axis=0)
            audio = model.sonify(frames, params())
            sp = np.abs(np.fft.rfft(audio[-4096:] * np.hanning(4096)))
            return sp / (sp.max() + 1e-12)

        hi = spectrum_for(1.0)
        lo = spectrum_for(0.2)
        # Energy fraction within +-3 bins of the peak: higher for high Q.
        def conc(sp):
            k = int(np.argmax(sp))
            return sp[k - 3:k + 4].sum() / sp.sum()
        assert conc(hi) > conc(lo)

    def test_finite_on_random_video(self, rng):
        model = OrthoModesModel(CFG)
        frames = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
        audio = model.sonify(frames)
        assert np.all(np.isfinite(audio))
        assert np.abs(audio).max() <= 2.0
