"""Smoke tests for the BASELINE capability-config examples."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/examples")


class TestBaselineConfigs:
    def test_config1_small_frame(self, tmp_path):
        import baseline_configs as bc
        bc.config1_small_frame(str(tmp_path))
        from vaudio.io import read_wav
        audio, sr = read_wav(str(tmp_path / "config1.wav"))
        assert len(audio) == 30 * 2048 and sr == 44100

    def test_config5_mesh_batch(self, tmp_path):
        import baseline_configs as bc
        bc.config5_mesh_batch(str(tmp_path))  # prints shapes; 8 CPU devices

    def test_config4_live_stream(self, tmp_path):
        import baseline_configs as bc
        bc.config4_live_stream(str(tmp_path))
        from vaudio.io import read_wav
        audio, sr = read_wav(str(tmp_path / "config4.wav"))
        assert sr == 48000 and audio.ndim == 2 and audio.shape[1] == 2
