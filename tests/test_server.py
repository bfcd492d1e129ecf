"""Live HTTP control panel / observability server tests.

The browser equivalent of the reference's SwiftUI surface
(vaudio/runtime/server.py): sliders POST param updates mid-stream
(ControlPanelView.swift:11-43 -> SoundEngine.swift:66-75), views poll
live-rendered PNGs (SpectrumView.swift:18, DebuggingView.swift:37-93),
and /audio.wav is the pull-model speaker (SoundEngine.swift:156-228).
"""

import json
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from vaudio.api import Auralizer
from vaudio.config import AuralizerConfig, LiveParams
from vaudio.io import hsb_frames


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers.get_content_type(), r.read()


def _post(url, obj, timeout=30):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.fixture
def served_aur():
    """An Auralizer with a running LiveServer (no stream started)."""
    aur = Auralizer(config=AuralizerConfig(mip_level=2), debug=True)
    server = aur.serve(port=0)
    yield aur, server
    server.stop()
    aur.stop()


class TestEndpoints:
    def test_control_panel_page(self, served_aur):
        _aur, server = served_aur
        status, ctype, body = _get(server.url)
        assert status == 200 and ctype == "text/html"
        text = body.decode()
        # Every slider the reference exposes is on the page.
        for name in ("attack", "release", "spectrum_mixing", "hp_cutoff",
                     "lp_cutoff", "stereo_width"):
            assert name in text
        assert "/audio.wav" in text and "/metrics" in text

    def test_params_roundtrip(self, served_aur):
        aur, server = served_aur
        status, _, body = _get(server.url + "params")
        assert status == 200
        p = json.loads(body)
        assert p["attack"] == aur.params.attack
        assert p["pan_angles"] is None

        status, resp = _post(server.url + "params",
                             {"attack": 0.25, "stereo_width": 0.5})
        assert status == 200 and resp["applied"] == 2
        assert aur.params.attack == 0.25
        assert aur.params.stereo_width == 0.5
        assert resp["params"]["attack"] == 0.25

    def test_params_pan_angles(self, served_aur):
        aur, server = served_aur
        n = aur.config.num_cells
        _status, resp = _post(server.url + "params",
                              {"pan_angles": [0.3] * n})
        assert resp["applied"] == 1
        assert isinstance(aur.params.pan_angles, np.ndarray)
        _status, body = _post(server.url + "params", {"pan_angles": None})
        assert aur.params.pan_angles is None

    def test_params_unknown_key_warns(self, served_aur):
        aur, server = served_aur
        _status, resp = _post(server.url + "params", {"bogus": 1.0})
        assert resp["applied"] == 0
        assert any("bogus" in w for w in resp["warnings"])

    def test_params_bad_json_is_400(self, served_aur):
        _aur, server = served_aur
        req = urllib.request.Request(server.url + "params",
                                     data=b"not json", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400

    def test_metrics(self, served_aur):
        _aur, server = served_aur
        status, _, body = _get(server.url + "metrics")
        assert status == 200
        m = json.loads(body)
        assert "frames_processed" in m and "buffer_fill" in m

    def test_debug_png_404_before_any_frame(self, served_aur):
        _aur, server = served_aur
        for name in ("hue_matrix", "input"):
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(
                    f"{server.url}debug/{name}.png", timeout=30)
            assert e.value.code == 404, name

    def test_debug_png_500_on_malformed_last_frame(self, served_aur):
        # A malformed ingested frame (e.g. RGBA) can land in last_frame
        # before the stream dies; the view must answer 500 with a JSON
        # error body, not reset the socket on every poll tick.
        aur, server = served_aur
        aur._stream.last_frame = np.zeros((4, 4, 4), np.uint8)
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(server.url + "debug/input.png",
                                       timeout=30)
            assert e.value.code == 500
            assert b"render" in e.value.read()
        finally:
            aur._stream.last_frame = None

    def test_unknown_path_404(self, served_aur):
        _aur, server = served_aur
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(server.url + "nope", timeout=30)
        assert e.value.code == 404


class TestOpsEndpoints:
    def test_metrics_prom(self, served_aur):
        """Prometheus text exposition of the same /metrics numbers."""
        _aur, server = served_aur
        status, ctype, body = _get(server.url + "metrics.prom")
        assert status == 200 and ctype == "text/plain"
        text = body.decode()
        assert "# TYPE vaudio_frames_processed gauge" in text
        assert "\nvaudio_frames_processed 0" in text
        assert "vaudio_buffer_fill" in text

    def test_state_roundtrip_over_http(self, served_aur):
        """GET /state.npz downloads the live carry checkpoint; POST
        restores one — the --save-state/--load-state surface for ops."""
        import io

        aur, server = served_aur
        status, ctype, body = _get(server.url + "state.npz")
        assert status == 200 and ctype == "application/octet-stream"
        data = np.load(io.BytesIO(body))
        assert set(data.files) == {"hues", "phases", "prev_spectrum",
                                   "ola_tail", "running_max",
                                   "carry_type"}
        assert str(data["carry_type"]) == "StepCarry"
        assert data["hues"].shape == (aur.config.num_cells,)

        # Restore a recognizably different carry and confirm it landed.
        hues = data["hues"].copy()
        hues[:] = 123
        buf = io.BytesIO()
        np.savez(buf, hues=hues,
                 **{f: data[f] for f in data.files if f != "hues"})
        req = urllib.request.Request(server.url + "state.npz",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["restored"] is True
        assert np.all(np.asarray(
            aur._stream.snapshot_carry().hues) == 123)

    def test_state_restore_rejects_garbage(self, served_aur):
        _aur, server = served_aur
        req = urllib.request.Request(server.url + "state.npz",
                                     data=b"not an npz", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400


class TestLiveStreamSurface:
    def test_views_and_params_during_stream(self):
        """Mid-stream: the debug PNGs render from live state and a POST
        mutates the params the running step reads (no recompile)."""
        cfg = AuralizerConfig(mip_level=2)
        params = LiveParams(spectrum_mixing=0.0)
        aur = Auralizer(config=cfg, params=params, debug=True)
        server = aur.serve(port=0)
        frames = hsb_frames(0.33, 1.0, 1.0, 96, 96, 12)
        try:
            aur.run_until_exhausted(list(frames), timeout=300)
            for name in ("hue_matrix", "spectrum", "waveform", "input"):
                status, ctype, body = _get(
                    f"{server.url}debug/{name}.png?t=1")
                assert status == 200 and ctype == "image/png"
                assert body.startswith(b"\x89PNG"), name
            # The input preview (CameraPreview equivalent) shows the
            # last ingested frame: hue 0.33 -> dominant green.
            import struct
            import zlib
            status, _, body = _get(server.url + "debug/input.png")
            (w, h) = struct.unpack(">II", body[16:24])
            assert (h, w) == frames[0].shape[:2]   # 96x96, no downsample
            idat, pos = b"", 8
            while pos < len(body):
                (ln,) = struct.unpack(">I", body[pos:pos + 4])
                if body[pos + 4:pos + 8] == b"IDAT":
                    idat += body[pos + 8:pos + 8 + ln]
                pos += 12 + ln
            raw = np.frombuffer(zlib.decompress(idat), np.uint8)
            px = raw.reshape(h, -1)[:, 1:].reshape(h, w, 3)
            mean = px.reshape(-1, 3).mean(0)
            assert mean[1] > mean[0] and mean[1] > mean[2]
            _status, resp = _post(server.url + "params", {"release": 2.5})
            assert resp["applied"] == 1 and aur.params.release == 2.5
            status, _, body = _get(server.url + "metrics")
            assert json.loads(body)["frames_processed"] == 12
        finally:
            server.stop()
            aur.stop()

    def test_audio_wav_streams_pcm(self):
        """/audio.wav delivers a WAV header + live int16 PCM from the
        ring (the browser <audio> speaker path)."""
        cfg = AuralizerConfig(mip_level=2)
        aur = Auralizer(config=cfg, debug=True)
        server = aur.serve(port=0)
        frames = hsb_frames(0.6, 1.0, 1.0, 96, 96, 10)
        try:
            aur.run_until_exhausted(list(frames), timeout=300)
            req = urllib.request.urlopen(server.url + "audio.wav",
                                         timeout=30)
            assert req.headers.get_content_type() == "audio/wav"
            head = req.read(44)
            assert head[:4] == b"RIFF" and head[8:12] == b"WAVE"
            body = req.read(4 * cfg.hop_size)   # ~2 hops of int16 PCM
            pcm = np.frombuffer(body, "<i2")
            assert pcm.size > 0 and np.abs(pcm).max() > 50, \
                "audio endpoint delivered silence for an active stream"
            req.close()
        finally:
            server.stop()
            aur.stop()


class TestCLIServe:
    def test_stream_serve_flag(self, tmp_path):
        """`vaudio stream --serve` brings the panel up for the stream's
        duration (subprocess on CPU; frames via stdin pipe)."""
        import os
        import re
        import subprocess
        import sys
        import threading

        h = w = 64
        frames = hsb_frames(0.8, 1.0, 1.0, w, h, 40)
        raw = (np.asarray(frames) * 255.0 + 0.5).astype(np.uint8).tobytes()
        env = {**os.environ, "VAUDIO_PLATFORM": "cpu"}
        proc = subprocess.Popen(
            [sys.executable, "-m", "vaudio", "stream", "--size",
             f"{h}x{w}", "--serve", "127.0.0.1:0", "--fps", "5"],
            stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE, env=env)

        def feed():
            try:
                proc.stdin.write(raw)
                proc.stdin.close()
            except BrokenPipeError:
                pass

        feeder = threading.Thread(target=feed, daemon=True)
        feeder.start()
        url = None
        deadline = time.monotonic() + 600
        lines = []
        try:
            while time.monotonic() < deadline:
                line = proc.stderr.readline().decode()
                if not line and proc.poll() is not None:
                    break
                lines.append(line)
                m = re.search(r"control panel at (http://\S+/)", line)
                if m:
                    url = m.group(1)
                    break
            assert url, f"no server URL in stderr: {''.join(lines)}"
            status, _, body = _get(url + "metrics", timeout=60)
            assert status == 200 and b"frames_processed" in body
        finally:
            proc.stderr.close()
            try:
                proc.wait(timeout=600)
            except subprocess.TimeoutExpired:
                proc.kill()
                raise
