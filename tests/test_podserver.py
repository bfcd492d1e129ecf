"""Pod observability/control server tests (vaudio/runtime/podserver.py).

The serving-fleet equivalent of the single-stream LiveServer surface
(tests/test_server.py): per-slot live views rendered from the batched
DSP carry (Views/SpectrumView.swift:15-77, DebuggingView.swift:174-218),
per-slot parameter control (ControlPanelView.swift:11-43 ->
SoundEngine.swift:66-75), and a per-slot pull-model audio stream
(SoundEngine.swift:156-228).
"""

import json
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from vaudio.config import AuralizerConfig, LiveParams
from vaudio.io import hsb_frames
from vaudio.runtime import MultiStreamAuralizer


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers.get_content_type(), r.read()


def _post(url, obj, timeout=30):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _png_size(body: bytes):
    import struct
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", body[16:24])
    return h, w


@pytest.fixture(scope="module")
def served_pod():
    """A 2-slot pod that has fully processed two short solid-color
    streams (different hues), with the PodServer attached BEFORE start
    so observe-state (waveform/input views) is populated."""
    # mip_level 1: 64x64 -> 32x32 mip = 64 px per 4x4 cell, comfortably
    # past the reference's count>20 hue gate (VisionEngine.swift:263) so
    # the per-slot hue views actually diverge.
    cfg = AuralizerConfig(mip_level=1)
    pod = MultiStreamAuralizer(cfg, n_streams=2,
                               exit_when_exhausted=True)
    server = pod.serve(port=0)
    n = 10
    reds = hsb_frames(0.0, 1.0, 1.0, width=64, height=64, num_frames=n)
    greens = hsb_frames(0.33, 1.0, 1.0, width=64, height=64,
                        num_frames=n)
    pod.start([iter(reds), iter(greens)])
    deadline = time.monotonic() + 120
    while pod.is_running and time.monotonic() < deadline:
        pod.raise_if_failed()
        time.sleep(0.01)
    assert not pod.is_running, "pod did not finish its finite sources"
    assert pod.metrics.frames_processed == 2 * n
    yield pod, server
    server.stop()
    pod.stop()


class TestEndpoints:
    def test_panel_page(self, served_pod):
        _pod, server = served_pod
        status, ctype, body = _get(server.url)
        assert status == 200 and ctype == "text/html"
        text = body.decode()
        assert "serving pod (2 slots)" in text
        assert "/audio.wav" in text and "/metrics" in text
        for name in ("attack", "stereo_width"):
            assert name in text

    def test_metrics(self, served_pod):
        pod, server = served_pod
        status, _, body = _get(server.url + "metrics")
        assert status == 200
        m = json.loads(body)
        assert m["n_streams"] == 2
        assert m["frames_processed"] == pod.metrics.frames_processed
        assert len(m["slots"]) == 2
        for slot in m["slots"]:
            assert {"active", "buffer_fill", "dropped_frames",
                    "underrun_samples"} <= set(slot)

    def test_per_slot_params_isolated(self, served_pod):
        pod, server = served_pod
        status, _, body = _get(server.url + "slots/0/params")
        assert status == 200
        p0 = json.loads(body)
        assert p0["shared"] is False
        assert p0["attack"] == pod.params[0].attack

        status, resp = _post(server.url + "slots/1/params",
                             {"stereo_width": 0.25, "attack": 0.5})
        assert status == 200 and resp["applied"] == 2
        assert pod.params[1].stereo_width == 0.25
        assert pod.params[1].attack == 0.5
        # Slot 0 untouched — per-slot control, not broadcast.
        assert pod.params[0].stereo_width == 1.0
        assert pod.params[0].attack == 1.0

    def test_unknown_param_warns(self, served_pod):
        _pod, server = served_pod
        status, resp = _post(server.url + "slots/0/params",
                             {"nonsense": 1.0})
        assert status == 200 and resp["applied"] == 0
        assert resp["warnings"]

    def test_bad_value_400(self, served_pod):
        _pod, server = served_pod
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server.url + "slots/0/params", {"attack": "loud"})
        assert exc.value.code == 400

    def test_bad_slot_404(self, served_pod):
        _pod, server = served_pod
        for path in ("slots/7/params", "slots/x/params",
                     "slots/7/debug/spectrum.png", "nope"):
            with pytest.raises(urllib.error.HTTPError) as exc:
                _get(server.url + path)
            assert exc.value.code == 404


class TestSlotViews:
    def test_hue_matrix_differs_per_slot(self, served_pod):
        """Slot 0 saw red frames, slot 1 green — the per-slot hue-matrix
        views must render from each slot's own carry row."""
        _pod, server = served_pod
        bodies = []
        for s in (0, 1):
            status, ctype, body = _get(
                server.url + f"slots/{s}/debug/hue_matrix.png")
            assert status == 200 and ctype == "image/png"
            _png_size(body)
            bodies.append(body)
        assert bodies[0] != bodies[1]

    def test_spectrum_waveform_input_render(self, served_pod):
        _pod, server = served_pod
        for name in ("spectrum", "waveform", "input"):
            for s in (0, 1):
                status, ctype, body = _get(
                    server.url + f"slots/{s}/debug/{name}.png")
                assert status == 200 and ctype == "image/png", name
                _png_size(body)

    def test_observe_state_populated(self, served_pod):
        pod, _server = served_pod
        assert pod.observe is True
        for s in (0, 1):
            assert pod.last_pcm[s] is not None
            assert pod.last_preview[s] is not None
            assert pod.last_preview[s].dtype == np.uint8


def _wait_not_busy(server, slot, timeout=15.0):
    """A closed listener's handler thread only notices on its next
    failed socket write (paced quanta land in the OS buffer first), so
    the slot lock can outlive the client by a few quanta."""
    deadline = time.monotonic() + timeout
    while server.audio_busy(slot) and time.monotonic() < deadline:
        time.sleep(0.02)
    assert not server.audio_busy(slot)


class TestSlotAudio:
    def test_audio_wav_stream(self, served_pod):
        """/slots/<i>/audio.wav streams a live WAV: header + paced PCM
        (zero-fill after the pod stopped — the real-time contract)."""
        _pod, server = served_pod
        req = urllib.request.urlopen(server.url + "slots/0/audio.wav",
                                     timeout=30)
        try:
            head = req.read(44)
            assert head[:4] == b"RIFF" and head[8:12] == b"WAVE"
            body = req.read(256)      # a few paced quanta
            assert len(body) == 256
        finally:
            req.close()

    def test_audio_busy_flag(self, served_pod):
        _pod, server = served_pod
        _wait_not_busy(server, 0)
        req = urllib.request.urlopen(server.url + "slots/0/audio.wav",
                                     timeout=30)
        try:
            req.read(44)
            assert server.audio_busy(0) is True
            assert server.audio_busy(1) is False
            # Second listener on the same slot is refused.
            with pytest.raises(urllib.error.HTTPError) as exc:
                _get(server.url + "slots/0/audio.wav", timeout=10)
            assert exc.value.code == 409
        finally:
            req.close()
        _wait_not_busy(server, 0)


class TestReviewRegressions:
    def test_one_slot_pan_angles_post_is_refused(self, served_pod):
        """Setting pan_angles on ONE slot of a per-slot-params pod must
        be refused (409): _stack_params requires the optional array
        field on ALL slots or none — accepting would 200 and then kill
        the whole pod at the next dispatch."""
        pod, server = served_pod
        n = pod.cfg.num_cells
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server.url + "slots/0/params",
                  {"pan_angles": [0.5] * n})
        assert e.value.code == 409
        assert b"ALL slots" in e.value.read()
        assert pod.params[0].pan_angles is None    # nothing applied

        # The pod-level broadcast is the sanctioned path: POST /params
        # sets it on EVERY slot atomically; per-slot VALUE updates then
        # work, but clearing one slot alone is refused symmetrically.
        status, resp = _post(server.url + "params",
                             {"pan_angles": [0.5] * n})
        assert status == 200 and resp["slots_updated"] == 2
        assert all(p.pan_angles is not None for p in pod.params)
        status, _resp = _post(server.url + "slots/1/params",
                              {"pan_angles": [0.7] * n})
        assert status == 200
        assert float(np.asarray(pod.params[1].pan_angles)[0]) == \
            pytest.approx(0.7)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server.url + "slots/1/params", {"pan_angles": None})
        assert e.value.code == 409
        status, resp = _post(server.url + "params", {"pan_angles": None})
        assert status == 200                       # restore fixture state
        assert all(p.pan_angles is None for p in pod.params)

    def test_pan_broadcast_on_running_pod_survives(self):
        """The original kill scenario: a pan_angles update arriving
        mid-run.  The broadcast path must leave the pod alive (guard +
        params_lock atomicity with the producer's stacking)."""
        cfg = AuralizerConfig(mip_level=1)
        pod = MultiStreamAuralizer(cfg, n_streams=2)
        server = pod.serve(port=0)
        frames = hsb_frames(0.5, 1.0, 1.0, width=64, height=64,
                            num_frames=40)
        try:
            pod.start([iter(frames), iter(frames.copy())])
            deadline = time.monotonic() + 60
            while pod.metrics.frames_processed < 8:
                pod.raise_if_failed()
                assert time.monotonic() < deadline
                time.sleep(0.01)
            status, resp = _post(
                server.url + "params",
                {"pan_angles": [0.4] * cfg.num_cells})
            assert status == 200 and resp["slots_updated"] == 2
            while pod.is_running and time.monotonic() < deadline:
                pod.raise_if_failed()      # would raise had it died
                time.sleep(0.01)
            assert not pod.is_running
            assert pod.metrics.frames_processed == 80
        finally:
            server.stop()
            pod.stop()

    def test_broadcast_rejects_bad_value_without_diverging(self,
                                                           served_pod):
        pod, server = served_pod
        before = [p.attack for p in pod.params]
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server.url + "params", {"attack": "loud"})
        assert e.value.code == 400
        assert [p.attack for p in pod.params] == before

    def test_stop_on_never_started_server_returns(self):
        """ThreadingHTTPServer.shutdown() blocks forever unless
        serve_forever ran; stop() must not call it on an unstarted
        server."""
        from vaudio.runtime import PodServer
        cfg = AuralizerConfig(mip_level=1)
        pod = MultiStreamAuralizer(cfg, n_streams=1)
        server = PodServer(pod)            # constructed, never started
        done = []
        t = __import__("threading").Thread(
            target=lambda: (server.stop(), done.append(True)))
        t.start()
        t.join(timeout=10)
        assert done, "stop() deadlocked on a never-started server"

    def test_stop_disables_observe(self):
        cfg = AuralizerConfig(mip_level=1)
        pod = MultiStreamAuralizer(cfg, n_streams=1)
        server = pod.serve(port=0)
        assert pod.observe is True
        server.stop()
        assert pod.observe is False

    def test_drain_exclusive(self, served_pod):
        """drain_exclusive runs fn under the slot audio lock and returns
        None while a listener holds the slot (the CLI drain's race-free
        pull)."""
        _pod, server = served_pod
        _wait_not_busy(server, 0)
        assert server.drain_exclusive(0, lambda: "ran") == "ran"
        req = urllib.request.urlopen(server.url + "slots/0/audio.wav",
                                     timeout=30)
        try:
            req.read(44)
            assert server.drain_exclusive(0, lambda: "ran") is None
        finally:
            req.close()
        _wait_not_busy(server, 0)

    def test_prometheus_groups_are_contiguous(self, served_pod):
        """All samples of one metric must form a single group (text
        exposition format rule) — per-slot series are emitted
        metric-major."""
        _pod, server = served_pod
        _, _, body = _get(server.url + "metrics.prom")
        names = [line.split("{")[0].split(" ")[0]
                 for line in body.decode().splitlines()
                 if line and not line.startswith("#")]
        seen, last = set(), None
        for name in names:
            if name != last:
                assert name not in seen, f"{name} samples interleaved"
                seen.add(name)
                last = name


class TestPodOpsEndpoints:
    def test_metrics_prom_labels_slots(self, served_pod):
        _pod, server = served_pod
        status, ctype, body = _get(server.url + "metrics.prom")
        assert status == 200 and ctype == "text/plain"
        text = body.decode()
        assert "# TYPE vaudio_frames_processed gauge" in text
        assert 'vaudio_slot_buffer_fill{slot="0"}' in text
        assert 'vaudio_slot_dropped_frames{slot="1"}' in text

    def test_pod_state_roundtrip_over_http(self, served_pod):
        import io

        pod, server = served_pod
        status, ctype, body = _get(server.url + "state.npz")
        assert status == 200 and ctype == "application/octet-stream"
        data = np.load(io.BytesIO(body))
        assert data["hues"].shape == (2, pod.cfg.num_cells)

        hues = data["hues"].copy()
        hues[1, :] = 77
        buf = io.BytesIO()
        np.savez(buf, hues=hues,
                 **{f: data[f] for f in data.files if f != "hues"})
        req = urllib.request.Request(server.url + "state.npz",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["restored"] is True
        restored = np.asarray(pod.snapshot_carry().hues)
        assert np.all(restored[1] == 77)
        assert np.all(restored[0] == data["hues"][0])

    def test_pod_state_restore_rejects_wrong_pod_size(self, served_pod):
        """A single-stream (or wrong-N) checkpoint must be refused —
        load_state shape-validates against the pod size."""
        import io

        pod, server = served_pod
        from vaudio.runtime.checkpoint import save_state
        from vaudio.runtime.step import init_carry
        buf = io.BytesIO()
        save_state(buf, init_carry(pod.cfg))    # unbatched carry
        req = urllib.request.Request(server.url + "state.npz",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400


class TestElasticResize:
    def test_resize_over_http(self):
        """POST /resize grows a LIVE pod; the panel, metrics, per-slot
        params and audio endpoints all see the new slots; a shrink
        drops them again."""
        cfg = AuralizerConfig()
        pod = MultiStreamAuralizer(cfg, n_streams=1,
                                   exit_when_exhausted=False)
        server = pod.serve(port=0)
        try:
            clip = np.asarray(hsb_frames(0.6, 1.0, 1.0, width=64,
                                         height=64, num_frames=3))
            pod.start([iter(clip)])
            deadline = time.monotonic() + 120
            while pod.stream_metrics(0)["buffer_fill"] < 3:
                pod.raise_if_failed()
                assert time.monotonic() < deadline
                time.sleep(0.01)

            status, resp = _post(server.url + "resize", {"n_streams": 3})
            assert status == 200 and resp["n_streams"] == 3
            assert pod.n_streams == 3

            _, _, page = _get(server.url)
            assert "serving pod (3 slots)" in page.decode()
            _, _, body = _get(server.url + "metrics")
            m = json.loads(body)
            assert m["n_streams"] == 3 and len(m["slots"]) == 3

            # The grown slot has a working control surface...
            status, resp = _post(server.url + "slots/2/params",
                                 {"attack": 0.5})
            assert status == 200 and resp["applied"] == 1
            assert pod.params[2].attack == 0.5
            assert pod.params[0].attack == 1.0
            # ...and an audio lock (drain_exclusive grows the list).
            assert server.audio_busy(2) is False

            # Malformed body -> 400.
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(server.url + "resize", {"n": 3})
            assert exc.value.code == 400

            status, resp = _post(server.url + "resize", {"n_streams": 2})
            assert status == 200 and resp["n_streams"] == 2
            with pytest.raises(urllib.error.HTTPError) as exc:
                _get(server.url + "slots/2/params")
            assert exc.value.code == 404
        finally:
            server.stop()
            pod.stop()


class TestSlotLeasingHTTP:
    def test_acquire_push_release_over_http(self):
        """POST /slots/acquire leases (growing the pod), the leased
        slot accepts frames, and /slots/<i>/release with shrink returns
        the capacity.  Also drives the push_frames client's
        slot='acquire' mode."""
        cfg = AuralizerConfig()
        pod = MultiStreamAuralizer(cfg, n_streams=1, max_streams=2,
                                   exit_when_exhausted=False)
        server = pod.serve(port=0)
        try:
            clip = np.asarray(hsb_frames(0.1, 1.0, 1.0, width=64,
                                         height=64, num_frames=2))
            pod.start([iter(clip)])      # slot 0 exhausts -> free
            deadline = time.monotonic() + 120
            while any(pod._active):
                pod.raise_if_failed()
                assert time.monotonic() < deadline
                time.sleep(0.01)

            # First lease reuses the free slot 0.
            status, resp = _post(server.url + "slots/acquire", {})
            assert status == 200 and resp["slot"] == 0
            assert resp["armed"] is True and pod.n_streams == 1

            # Client-side acquire mode: leases slot 1 (pod grows) and
            # streams the clip through it, leaving the lease open.
            from vaudio.io.push import push_frames
            sent = push_frames(server.url, "acquire", iter(clip),
                               when_empty="dark", close=False)
            assert sent == 2 and pod.n_streams == 2
            deadline = time.monotonic() + 120
            while pod.stream_metrics(1)["buffer_fill"] < 2:
                pod.raise_if_failed()
                assert time.monotonic() < deadline
                time.sleep(0.01)

            # A third lease is refused: both slots leased (open push
            # streams) and the pod is at max_streams.
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(server.url + "slots/acquire", {})
            assert exc.value.code == 409

            # Release slot 1 with shrink: the push stream closes and
            # the trailing capacity is returned.
            status, resp = _post(server.url + "slots/1/release",
                                 {"shrink": True})
            assert status == 200 and resp["n_streams"] == 1
            assert pod.n_streams == 1
        finally:
            server.stop()
            pod.stop()


class TestPodServeCLI:
    def test_cli_serve_flag(self, tmp_path):
        """`vaudio pod --serve` starts the panel (URL on stderr) and
        shuts it down cleanly with the pod (CPU-forced subprocess)."""
        import os
        import subprocess
        import sys

        clip = hsb_frames(0.6, 1.0, 1.0, width=64, height=64,
                          num_frames=4)
        p = str(tmp_path / "clip.npy")
        np.save(p, np.asarray(clip))
        env = dict(os.environ, VAUDIO_PLATFORM="cpu",
                   JAX_COMPILATION_CACHE_DIR="/tmp/vaudio_test_jax_cache",
                   PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH",
                                                             ""))
        res = subprocess.run(
            [sys.executable, "-m", "vaudio", "pod", "--size", "64x64",
             "--input", p, "--input", p, "--serve", "127.0.0.1:0",
             "-o", str(tmp_path / "out")],
            capture_output=True, timeout=600, env=env, cwd="/root/repo")
        assert res.returncode == 0, res.stderr.decode()[-800:]
        assert b"pod: live panel at http://127.0.0.1:" in res.stderr


class TestMeshPodPanel:
    def test_panel_on_mesh_sharded_pod(self):
        """The panel works on a mesh pod: per-slot views render from the
        SHARDED batched carry (snapshot materializes addressable
        shards), and the broadcast respects the shared-params contract
        (applied once, reported shared)."""
        from vaudio.parallel import make_stream_mesh
        from vaudio.io import solid_color_frames

        cfg = AuralizerConfig()
        mesh = make_stream_mesh(8, 1)            # pure stream-DP
        shared = LiveParams()
        pod = MultiStreamAuralizer(cfg, n_streams=8, params=shared,
                                   mesh=mesh)
        server = pod.serve(port=0)
        clips = [solid_color_frames(
            [0.2 + 0.1 * i, 0.9 - 0.1 * i, 0.3], 64, 64, 4)
            for i in range(8)]
        try:
            pod.start([iter(np.asarray(c)) for c in clips])
            deadline = time.monotonic() + 120
            while pod.is_running and time.monotonic() < deadline:
                pod.raise_if_failed()
                time.sleep(0.01)
            assert not pod.is_running

            for s in (0, 7):
                for view in ("hue_matrix", "spectrum"):
                    status, ctype, body = _get(
                        server.url + f"slots/{s}/debug/{view}.png")
                    assert status == 200 and ctype == "image/png"
                    _png_size(body)
            status, resp = _post(server.url + "params",
                                 {"release": 0.25})
            assert status == 200 and resp["shared"] is True
            assert resp["slots_updated"] == 1      # one shared object
            assert shared.release == 0.25
            status, _, body = _get(server.url + "metrics.prom")
            assert 'vaudio_slot_buffer_fill{slot="7"}' in body.decode()
        finally:
            server.stop()
            pod.stop()


class TestSharedParams:
    def test_shared_flag_and_broadcast(self):
        """One shared LiveParams (the mesh-mode contract): POST to any
        slot updates every slot and the response says shared=true."""
        cfg = AuralizerConfig(mip_level=2)
        shared = LiveParams()
        pod = MultiStreamAuralizer(cfg, n_streams=2, params=shared)
        server = pod.serve(port=0)
        try:
            status, resp = _post(server.url + "slots/0/params",
                                 {"release": 0.125})
            assert status == 200 and resp["shared"] is True
            assert pod.params[1].release == 0.125
        finally:
            server.stop()
