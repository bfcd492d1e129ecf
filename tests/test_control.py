"""Live runtime control + live debug surface + playback sink tests.

The round-3 capability closure (VERDICT r2 "what's missing"): the
reference mutates published params from sliders mid-run
(ControlPanelView.swift:11-43, SoundEngine.swift:66-75), redraws its
debug views continuously while processing (SpectrumView.swift:18,
DebuggingView.swift:72-81), and drives a speaker
(SoundEngine.swift:156-228)."""

import os
import stat
import sys
import time

import numpy as np
import pytest

from vaudio.config import AuralizerConfig, LiveParams
from vaudio.io import solid_color_frames
from vaudio.runtime.control import (ControlChannel, apply_control_message)
from vaudio.runtime.stream import StreamingAuralizer


class TestApplyControlMessage:
    def test_scalar_updates(self):
        p = LiveParams()
        n = apply_control_message(p, {"attack": 0.25, "release": 2.0,
                                      "spectrum_mixing": 0.5})
        assert n == 3
        assert p.attack == 0.25 and p.release == 2.0
        assert p.spectrum_mixing == 0.5

    def test_unknown_key_warns_and_skips(self):
        p = LiveParams()
        warnings = []
        n = apply_control_message(p, {"attack": 0.5, "bogus": 1.0},
                                  warn=warnings.append)
        assert n == 1 and p.attack == 0.5
        assert len(warnings) == 1 and "bogus" in warnings[0]

    def test_pan_angles_array_and_clear(self):
        p = LiveParams()
        apply_control_message(p, {"pan_angles": [0.1] * 16})
        assert isinstance(p.pan_angles, np.ndarray)
        assert p.pan_angles.dtype == np.float32
        apply_control_message(p, {"pan_angles": None})
        assert p.pan_angles is None

    def test_pan_angles_wrong_length_warned_not_applied(self):
        """A wrong-length pan_angles must be REJECTED at apply time —
        accepted, it would crash the producer thread at the next trace
        (live_pan_gains shape mismatch), killing a live stream."""
        p = LiveParams()
        warnings = []
        n = apply_control_message(p, {"pan_angles": [0.2, 0.3]},
                                  warn=warnings.append, num_cells=16)
        assert n == 0 and p.pan_angles is None
        assert len(warnings) == 1 and "pan_angles" in warnings[0]
        # 2-D arrays rejected even without num_cells.
        n = apply_control_message(p, {"pan_angles": [[0.1] * 4] * 4},
                                  warn=warnings.append)
        assert n == 0 and p.pan_angles is None
        # Non-finite entries rejected.
        n = apply_control_message(
            p, {"pan_angles": [float("nan")] * 16},
            warn=warnings.append, num_cells=16)
        assert n == 0 and p.pan_angles is None
        # Correct length still applies.
        n = apply_control_message(p, {"pan_angles": [0.1] * 16},
                                  warn=warnings.append, num_cells=16)
        assert n == 1 and p.pan_angles.shape == (16,)

    def test_non_finite_scalar_warned_not_applied(self):
        p = LiveParams()
        warnings = []
        n = apply_control_message(p, {"attack": float("inf")},
                                  warn=warnings.append)
        assert n == 0 and p.attack == LiveParams().attack
        assert len(warnings) == 1


class TestControlChannelFile:
    def test_scripted_schedule_from_regular_file(self, tmp_path):
        """A regular file is a one-pass parameter schedule."""
        path = tmp_path / "schedule.jsonl"
        path.write_text('{"attack": 0.1}\n'
                        'not json\n'
                        '{"stereo_width": 0.0, "release": 3.0}\n')
        p = LiveParams()
        warnings = []
        ch = ControlChannel(p, str(path), warn=warnings.append).start()
        deadline = time.monotonic() + 10
        while ch.applied < 3 and time.monotonic() < deadline:
            time.sleep(0.01)
        ch.stop()
        assert ch.applied == 3 and ch.messages == 2
        assert p.attack == 0.1 and p.stereo_width == 0.0
        assert any("bad JSON" in w for w in warnings)

    def test_file_object(self):
        import io
        p = LiveParams()
        ch = ControlChannel(p, io.StringIO('{"lp_cutoff": 5000}\n'))
        ch.start()
        deadline = time.monotonic() + 10
        while ch.applied < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        ch.stop()
        assert p.lp_cutoff == 5000.0

    def test_fifo_multiple_writers(self, tmp_path):
        """FIFO writers connect/write/disconnect repeatedly — the live
        slider contract."""
        path = str(tmp_path / "ctl.fifo")
        os.mkfifo(path)
        p = LiveParams()
        ch = ControlChannel(p, path).start()
        for i, line in enumerate(['{"attack": 0.3}\n',
                                  '{"release": 0.7}\n']):
            with open(path, "w") as f:
                f.write(line)
            deadline = time.monotonic() + 10
            while ch.applied < i + 1 and time.monotonic() < deadline:
                time.sleep(0.01)
        ch.stop()
        assert p.attack == 0.3 and p.release == 0.7

    def test_stop_unblocks_idle_fifo(self, tmp_path):
        """stop() must return even when no writer ever connected."""
        path = str(tmp_path / "idle.fifo")
        os.mkfifo(path)
        ch = ControlChannel(LiveParams(), path).start()
        time.sleep(0.05)
        t0 = time.monotonic()
        ch.stop()
        assert time.monotonic() - t0 < 5.0


def _half_and_half_frame(h, w):
    """Left half red, right half green — per-column hue asymmetry so the
    stereo pan law produces a genuine L/R image."""
    f = np.zeros((h, w, 3), np.uint8)
    f[:, : w // 2, 0] = 255          # red
    f[:, w // 2:, 1] = 255           # green
    return f


class TestMidStreamControl:
    def test_stereo_width_collapse_via_fifo(self, tmp_path):
        """The VERDICT r2 'done' criterion: a FIFO control line flips
        stereo_width 1 -> 0 mid-stream and the later PCM's L/R image
        collapses (no recompilation — scalar params are traced)."""
        cfg = AuralizerConfig(channels=2, mip_level=2)
        # mixing=0: hue EMA and spectrum smoothing adapt instantly, so
        # both stream segments are in steady state from their 1st frame.
        params = LiveParams(spectrum_mixing=0.0, stereo_width=1.0)
        s = StreamingAuralizer(cfg, params=params)
        ctl = str(tmp_path / "ctl.fifo")
        os.mkfifo(ctl)
        ch = s.attach_control(ctl)
        frame = _half_and_half_frame(96, 96)   # mip2 -> 36 px/cell > gate
        n1 = n2 = 6
        hop = cfg.hop_size

        def source():
            for _ in range(n1):
                yield frame
            with open(ctl, "w") as f:
                f.write('{"stereo_width": 0.0}\n')
            deadline = time.monotonic() + 30
            while ch.applied < 1 and time.monotonic() < deadline:
                time.sleep(0.005)
            assert ch.applied >= 1, "control line never applied"
            for _ in range(n2):
                yield frame

        s.run_until_exhausted(source(), timeout=300)
        pcm = s.pull((n1 + n2) * hop * 2).reshape(-1, 2)
        s.stop()
        early = pcm[1 * hop:(n1 - 1) * hop]    # width 1.0 segment
        late = pcm[(n1 + 1) * hop:]            # width 0.0 segment
        assert np.abs(early).max() > 1e-4, "stream produced silence"
        # Full-width pan: per-column hues differ -> L != R.
        assert np.abs(early[:, 0] - early[:, 1]).max() > 1e-4
        # Width 0 = dual mono: equal-power center pan gives L == R.
        np.testing.assert_allclose(late[:, 0], late[:, 1], atol=1e-6)

    def test_attach_control_stopped_by_stream_stop(self, tmp_path):
        cfg = AuralizerConfig(mip_level=2)
        s = StreamingAuralizer(cfg)
        ctl = str(tmp_path / "c.fifo")
        os.mkfifo(ctl)
        ch = s.attach_control(ctl)
        assert ch._thread is not None
        s.stop()
        assert s._control is None
        assert ch._thread is None


class TestLiveDebugSurface:
    def test_attach_before_start_race(self, tmp_path):
        """The renderer is normally attached BEFORE the stream starts;
        it must idle (not exit) until it has seen the stream running —
        exiting on a pre-start tick silently killed the live surface
        (the historical renders-stuck-at-0 flake)."""
        from vaudio.api import Auralizer
        aur = Auralizer(config=AuralizerConfig(mip_level=2), debug=True)
        live = aur.live_debug(str(tmp_path / "d"), every_frames=1)
        time.sleep(0.5)               # renderer ticks ~10x pre-start
        assert live._thread.is_alive(), \
            "renderer exited before the stream ever started"
        frames = solid_color_frames([0.9, 0.1, 0.1], 64, 64, 3)
        aur.run_until_exhausted(list(frames), timeout=120)
        deadline = time.monotonic() + 60
        while live.renders < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert live.renders >= 1
        live.stop()
        aur.stop()

    def test_renders_change_during_stream(self, tmp_path):
        """The live view re-renders while the stream runs and reflects
        new content (VERDICT r2 missing #2): PNG bytes change when the
        scene hue changes; index.html carries the auto-refresh tag."""
        from vaudio.api import Auralizer
        cfg = AuralizerConfig(mip_level=2)
        aur = Auralizer(config=cfg,
                        params=LiveParams(spectrum_mixing=0.0),
                        debug=True)
        out = str(tmp_path / "live")
        live = aur.live_debug(out, every_frames=2)
        red = (solid_color_frames([1, 0, 0], 96, 96, 1)[0]
               * 255).astype(np.uint8)
        green = (solid_color_frames([0, 1, 0], 96, 96, 1)[0]
                 * 255).astype(np.uint8)
        snapshots = []

        # Generous deadline: this assert runs INSIDE the producer thread
        # (the source generator), so tripping it kills the stream as
        # "producer failed".  Under full-suite load the first compile of
        # this test's fresh graph signature (96x96, mip_level=2) has been
        # observed to push the first render past 60 s.  (A historical
        # never-renders mode — the renderer losing the attach-before-
        # start race and exiting on its first tick — was a real product
        # bug, fixed by LiveDebugRenderer._loop's seen_running guard.)
        def wait_render(min_count, deadline_s=240):
            deadline = time.monotonic() + deadline_s
            while live.renders < min_count and time.monotonic() < deadline:
                time.sleep(0.01)
            assert live.renders >= min_count, \
                f"live renderer stuck at {live.renders}"

        def source():
            for _ in range(4):
                yield red
            wait_render(1)
            snapshots.append(
                open(os.path.join(out, "hue_matrix.png"), "rb").read())
            first = live.renders
            for _ in range(4):
                yield green
            wait_render(first + 1)
            snapshots.append(
                open(os.path.join(out, "hue_matrix.png"), "rb").read())

        aur.run_until_exhausted(source(), timeout=300)
        aur.stop()
        live.stop()
        assert snapshots[0] != snapshots[1], \
            "hue matrix did not change with the scene"
        assert os.path.exists(os.path.join(out, "index.html"))
        assert os.path.exists(os.path.join(out, "spectrum.png"))
        assert os.path.exists(os.path.join(out, "waveform.png"))

    def test_refresh_tag_in_live_html(self, tmp_path):
        from vaudio.utils.render import render_debug_surface
        info = {"hues": np.zeros(16, np.int32),
                "grads": np.zeros((16, 4), np.float32)}
        w = render_debug_surface(info, AuralizerConfig(), str(tmp_path),
                                 refresh_seconds=1.0)
        html = open(w["index"]).read()
        assert 'http-equiv="refresh"' in html and 'content="1"' in html

    def test_live_debug_requires_debug_mode(self):
        from vaudio.api import Auralizer
        aur = Auralizer(debug=False)
        with pytest.raises(ValueError, match="debug=True"):
            aur.live_debug("/tmp/nowhere")

    def test_final_render_drops_refresh_tag(self, tmp_path):
        """After stop() the page is static (no meta refresh) — a browser
        left open stops hammering the directory."""
        from vaudio.api import Auralizer
        cfg = AuralizerConfig(mip_level=2)
        aur = Auralizer(config=cfg, debug=True)
        out = str(tmp_path / "live2")
        live = aur.live_debug(out, every_frames=1)
        red = (solid_color_frames([1, 0, 0], 96, 96, 2)
               * 255).astype(np.uint8)
        aur.run_until_exhausted(red, timeout=300)
        aur.stop()
        live.stop()
        html = open(os.path.join(out, "index.html")).read()
        assert "http-equiv" not in html


FAKE_PLAYER = """#!/bin/sh
# Fake audio player: record args and copy stdin to the capture file.
echo "$1 $2" > "{args_path}"
exec cat > "{pcm_path}"
"""


class TestSubprocessPlayer:
    @pytest.fixture
    def fake_player(self, tmp_path, monkeypatch):
        args_path = tmp_path / "player_args.txt"
        pcm_path = tmp_path / "player_pcm.raw"
        script = tmp_path / "fakeplayer"
        script.write_text(FAKE_PLAYER.format(args_path=args_path,
                                             pcm_path=pcm_path))
        script.chmod(script.stat().st_mode | stat.S_IXUSR)
        monkeypatch.setenv("VAUDIO_PLAYER", str(script))
        return args_path, pcm_path

    def test_pcm_reaches_player(self, fake_player):
        from vaudio.io import SubprocessPlayer
        args_path, pcm_path = fake_player
        assert SubprocessPlayer.available()
        blocks = [np.full(512, 0.25, np.float32),
                  np.full(512, -0.5, np.float32)]
        with SubprocessPlayer(48000.0, channels=2) as p:
            for b in blocks:
                p.write(b)
        assert p.samples_written == 1024
        assert args_path.read_text().split() == ["48000", "2"]
        got = np.frombuffer(pcm_path.read_bytes(), "<f4")
        np.testing.assert_array_equal(got, np.concatenate(blocks))

    def test_missing_player_raises(self, monkeypatch):
        from vaudio.io import sinks
        monkeypatch.delenv("VAUDIO_PLAYER", raising=False)
        monkeypatch.setattr(sinks.shutil, "which", lambda _: None)
        with pytest.raises(RuntimeError, match="no audio player"):
            sinks.SubprocessPlayer(44100.0)

    def test_cli_stream_play(self, fake_player, tmp_path):
        """Front door: vaudio stream --play pipes PCM into the player."""
        import subprocess
        args_path, pcm_path = fake_player
        frames = (solid_color_frames([1, 0.2, 0.1], 64, 64, 4)
                  * 255).astype(np.uint8)
        env = dict(os.environ, VAUDIO_PLATFORM="cpu", JAX_PLATFORMS="cpu",
                   JAX_COMPILATION_CACHE_DIR="/tmp/vaudio_test_jax_cache",
                   PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH",
                                                             ""))
        r = subprocess.run(
            [sys.executable, "-m", "vaudio", "stream", "--size", "64x64",
             "--play"],
            input=frames.tobytes(), capture_output=True, env=env,
            cwd="/root/repo", timeout=300)
        assert r.returncode == 0, r.stderr.decode()[-800:]
        played = np.frombuffer(pcm_path.read_bytes(), "<f4")
        piped = np.frombuffer(r.stdout, "<f4")
        np.testing.assert_array_equal(played, piped)
        assert played.size >= 4 * 2048
