"""Programmatic serving clients (vaudio/client.py).

The client half of the HTTP serving surfaces: StreamClient against a
single-stream LiveServer, PodClient/PodSlot against a PodServer —
remote control/observability as typed calls, the network equivalent of
the reference app driving its engine through published properties and
the pull-model speaker (ControlPanelView.swift:11-43 ->
SoundEngine.swift:66-75; SoundEngine.swift:156-228).
"""

import json
import os
import subprocess
import sys
import time
import wave

import numpy as np
import pytest

from vaudio.api import Auralizer
from vaudio.client import (AudioStream, PodClient, StreamClient,
                           VaudioHTTPError)
from vaudio.config import AuralizerConfig
from vaudio.io import hsb_frames
from vaudio.runtime import MultiStreamAuralizer


@pytest.fixture(scope="module")
def served_stream():
    """A finished single-stream run with its LiveServer still up."""
    cfg = AuralizerConfig(mip_level=2)
    aur = Auralizer(config=cfg, debug=True)
    server = aur.serve(port=0)
    frames = hsb_frames(0.33, 1.0, 1.0, 96, 96, 12)
    aur.run_until_exhausted(list(frames), timeout=300)
    yield aur, server, StreamClient(server.url)
    server.stop()
    aur.stop()


@pytest.fixture(scope="module")
def served_pod():
    """A 2-slot pod that processed two short clips, PodServer still up."""
    cfg = AuralizerConfig(mip_level=1)
    pod = MultiStreamAuralizer(cfg, n_streams=2,
                               exit_when_exhausted=True)
    server = pod.serve(port=0)
    n = 10
    reds = hsb_frames(0.0, 1.0, 1.0, width=64, height=64, num_frames=n)
    blues = hsb_frames(0.66, 1.0, 1.0, width=64, height=64,
                       num_frames=n)
    pod.start([iter(reds), iter(blues)])
    deadline = time.monotonic() + 120
    while pod.is_running and time.monotonic() < deadline:
        pod.raise_if_failed()
        time.sleep(0.01)
    assert not pod.is_running
    yield pod, server, PodClient(server.url)
    server.stop()
    pod.stop()


class TestStreamClient:
    def test_params_roundtrip(self, served_stream):
        aur, _server, client = served_stream
        p = client.params()
        assert p["attack"] == aur.params.attack
        resp = client.set_params(attack=0.25, stereo_width=0.5)
        assert resp["applied"] == 2
        assert aur.params.attack == 0.25
        assert client.params()["stereo_width"] == 0.5

    def test_metrics_and_prom(self, served_stream):
        _aur, _server, client = served_stream
        assert client.metrics()["frames_processed"] == 12
        prom = client.metrics_prom()
        assert "vaudio_frames_processed 12" in prom

    def test_view_png(self, served_stream):
        _aur, _server, client = served_stream
        for name in ("hue_matrix", "spectrum", "waveform", "input"):
            assert client.view(name).startswith(b"\x89PNG"), name

    def test_record_audio(self, served_stream):
        aur, _server, client = served_stream
        rate = aur.config.sample_rate
        pcm = client.record(0.15)
        want = int(round(0.15 * rate))
        assert pcm.dtype == np.float32 and len(pcm) == want
        # The ring buffered a real synthesis run: not silence.
        assert np.abs(pcm).max() > 1e-3

    def test_audio_stream_header(self, served_stream):
        aur, _server, client = served_stream
        # The previous test's listener lock frees on the server's next
        # paced write after the disconnect — retry briefly.
        deadline = time.monotonic() + 30
        while True:
            try:
                stream = client.audio(chunk_samples=256)
                break
            except VaudioHTTPError as e:
                assert e.status == 409 and time.monotonic() < deadline
                time.sleep(0.05)
        with stream:
            assert isinstance(stream, AudioStream)
            assert stream.sample_rate == int(aur.config.sample_rate)
            assert stream.channels == aur.config.channels
            chunk = next(iter(stream))
            assert chunk.shape == (256, aur.config.channels)

    def test_error_mapping(self, served_stream):
        _aur, _server, client = served_stream
        with pytest.raises(VaudioHTTPError) as exc:
            client.set_params(attack="junk")
        assert exc.value.status == 400
        assert "junk" in exc.value.message
        # A non-push stream refuses pushed frames with a clear 409.
        with pytest.raises(VaudioHTTPError) as exc:
            client.push(np.zeros((8, 8, 3), np.float32))
        assert exc.value.status == 409

    def test_state_roundtrip(self, served_stream):
        _aur, _server, client = served_stream
        blob = client.save_state()
        assert blob[:2] == b"PK"                 # a .npz (zip) payload
        assert client.load_state(blob) == {"restored": True}


class TestPodClient:
    def test_slots_and_metrics(self, served_pod):
        pod, _server, client = served_pod
        assert client.n_streams == 2
        slots = client.slots()
        assert [s.index for s in slots] == [0, 1]
        m = slots[0].metrics()
        assert m["buffer_fill"] == pod.stream_metrics(0)["buffer_fill"]
        assert "vaudio_slot_buffer_fill" in client.metrics_prom()

    def test_slot_params(self, served_pod):
        pod, _server, client = served_pod
        slot = client.slot(1)
        resp = slot.set_params(stereo_width=0.25)
        assert resp["applied"] == 1 and resp["shared"] is False
        assert pod.params[1].stereo_width == 0.25
        assert pod.params[0].stereo_width != 0.25
        assert slot.params()["stereo_width"] == 0.25

    def test_broadcast_params(self, served_pod):
        pod, _server, client = served_pod
        n = pod.cfg.num_cells
        resp = client.broadcast_params(pan_angles=[0.3] * n)
        assert resp["slots_updated"] == 2
        assert all(p.pan_angles is not None for p in pod.params)
        # One-slot pan_angles flip is the documented 409.
        with pytest.raises(VaudioHTTPError) as exc:
            client.slot(0).set_params(pan_angles=None)
        assert exc.value.status == 409
        client.broadcast_params(pan_angles=None)
        assert all(p.pan_angles is None for p in pod.params)

    def test_slot_views_and_record(self, served_pod):
        pod, _server, client = served_pod
        for name in ("hue_matrix", "spectrum", "waveform", "input"):
            assert client.slot(0).view(name).startswith(b"\x89PNG")
        pcm = client.slot(1).record(0.1)
        assert len(pcm) == int(round(0.1 * pod.cfg.sample_rate))
        assert np.abs(pcm).max() > 1e-3

    def test_bad_slot_404(self, served_pod):
        _pod, _server, client = served_pod
        with pytest.raises(VaudioHTTPError) as exc:
            client.slot(7).params()
        assert exc.value.status == 404
        # Stale handles answer the SAME contract on the client-side
        # metrics path (no bare IndexError).
        with pytest.raises(VaudioHTTPError) as exc:
            client.slot(7).metrics()
        assert exc.value.status == 404
        with pytest.raises(VaudioHTTPError):
            client.slot(-1).metrics()

    def test_state_roundtrip(self, served_pod):
        _pod, _server, client = served_pod
        blob = client.save_state()
        assert client.load_state(blob) == {"restored": True}


class TestPodLeasing:
    def test_lease_context_manager(self):
        """with pod.lease() leases, pushes, and releases on exit —
        including the elastic grow/shrink round trip."""
        pod = MultiStreamAuralizer(AuralizerConfig(), n_streams=1,
                                   max_streams=2,
                                   exit_when_exhausted=False)
        server = pod.serve(port=0)
        client = PodClient(server.url)
        clip = np.asarray(hsb_frames(0.1, 1.0, 1.0, width=64, height=64,
                                     num_frames=2))
        try:
            pod.start([iter(clip[:1])])      # slot 0 exhausts -> free
            deadline = time.monotonic() + 120
            while any(pod._active):
                pod.raise_if_failed()
                assert time.monotonic() < deadline
                time.sleep(0.01)
            with client.lease(when_empty="dark") as slot:
                assert slot.index == 0       # reused the free slot
                assert slot.push_state()["armed"] is True
                for fr in clip:
                    slot.push(fr)
                deadline = time.monotonic() + 120
                while pod.stream_metrics(0)["buffer_fill"] < 2:
                    pod.raise_if_failed()
                    assert time.monotonic() < deadline
                    time.sleep(0.01)
            # Exit released the lease: the push stream closed; the
            # slot is free once the producer drains it dark.
            deadline = time.monotonic() + 120
            while 0 not in pod.free_slots():
                pod.raise_if_failed()
                assert time.monotonic() < deadline
                time.sleep(0.01)
            # At-capacity acquires surface the pod's 409.
            with client.lease(when_empty="dark") as a:
                with client.lease(when_empty="dark") as b:
                    assert {a.index, b.index} == {0, 1}
                    with pytest.raises(VaudioHTTPError) as exc:
                        client.acquire()
                    assert exc.value.status == 409
        finally:
            server.stop()
            pod.stop()


class TestRetries:
    """Transient-failure resilience: retries on 503 and connection
    errors; real rejections (4xx) never retry."""

    def _flaky_server(self, fails_503=0, body=None):
        import json as _json
        from http.server import (BaseHTTPRequestHandler,
                                 ThreadingHTTPServer)
        payload = body or _json.dumps({"n_streams": 1,
                                       "slots": []}).encode()
        state = {"fails": fails_503, "hits": 0}

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _answer(self):
                state["hits"] += 1
                if state["fails"] > 0:
                    state["fails"] -= 1
                    err = b'{"error": "resize in flight"}'
                    self.send_response(503)
                    self.send_header("Content-Length", str(len(err)))
                    self.end_headers()
                    self.wfile.write(err)
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            do_GET = do_POST = _answer

        srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        import threading
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}", state

    def test_client_retries_503(self):
        srv, url, state = self._flaky_server(fails_503=2)
        try:
            with pytest.raises(VaudioHTTPError) as exc:
                PodClient(url).metrics()          # no retries: first 503
            assert exc.value.status == 503
            m = PodClient(url, retries=3, retry_wait=0.01).metrics()
            assert m["n_streams"] == 1
            # 1 (no-retry call, consumed one 503) + 1 (503) + 1 (ok).
            assert state["hits"] == 3
        finally:
            srv.shutdown()

    def test_client_does_not_retry_4xx(self):
        pod = MultiStreamAuralizer(AuralizerConfig(), n_streams=1)
        server = pod.serve(port=0)
        try:
            client = PodClient(server.url, retries=5, retry_wait=0.01)
            t0 = time.monotonic()
            with pytest.raises(VaudioHTTPError) as exc:
                client.slot(0).set_params(attack="junk")
            assert exc.value.status == 400
            assert time.monotonic() - t0 < 1.0    # no retry pauses
        finally:
            server.stop()
            pod.stop()

    def test_client_retries_connection_refused(self):
        import socket
        import threading
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()                                 # nothing listens now
        url = f"http://127.0.0.1:{port}"
        import urllib.error
        with pytest.raises((urllib.error.URLError, ConnectionError,
                            OSError)):
            PodClient(url).metrics()             # no retries: fails now
        # With retries, a server that comes up mid-retry-loop (a pod
        # restarting behind the same address) is reached.
        srv = [None]
        from http.server import BaseHTTPRequestHandler, \
            ThreadingHTTPServer

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                body = b'{"n_streams": 1, "slots": []}'
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        started = threading.Event()

        def serve_late():
            time.sleep(0.4)
            try:
                sv = ThreadingHTTPServer(("127.0.0.1", port), H)
            except OSError:
                return                            # port got reused: skip
            srv[0] = sv
            started.set()
            sv.serve_forever()

        threading.Thread(target=serve_late, daemon=True).start()
        try:
            m = PodClient(url, retries=20, retry_wait=0.1).metrics()
            assert m["n_streams"] == 1 and started.is_set()
        finally:
            if srv[0] is not None:
                srv[0].shutdown()

    def test_acquire_does_not_retry_ambiguous_failures(self):
        """A mid-flight reset on /slots/acquire is NOT retried (the
        first send may have granted a lease — re-sending could grant
        two), while the same failure on an idempotent GET retries."""
        import socket
        import threading
        hits = []
        lsock = socket.socket()
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(8)
        port = lsock.getsockname()[1]
        stop = threading.Event()

        def resetter():
            # Accept, read a bit, close without answering: the client
            # sees a reset/EOF AFTER the request was sent — the
            # ambiguous class.
            while not stop.is_set():
                try:
                    lsock.settimeout(0.2)
                    conn, _ = lsock.accept()
                except socket.timeout:
                    continue
                hits.append(1)
                try:
                    conn.recv(4096)
                finally:
                    conn.close()
        t = threading.Thread(target=resetter, daemon=True)
        t.start()
        try:
            client = PodClient(f"http://127.0.0.1:{port}", retries=3,
                               retry_wait=0.01, timeout=5)
            n0 = len(hits)
            with pytest.raises(Exception):
                client.acquire()
            acquire_attempts = len(hits) - n0
            assert acquire_attempts == 1, acquire_attempts
            n0 = len(hits)
            with pytest.raises(Exception):
                client.metrics()                  # idempotent: retries
            assert len(hits) - n0 == 4            # 1 + 3 retries
        finally:
            stop.set()
            t.join(timeout=5)
            lsock.close()

    def test_push_frames_retry_503(self):
        import json as _json
        ok = _json.dumps({"queued": True, "fill": 1}).encode()
        srv, url, state = self._flaky_server(fails_503=1, body=ok)
        try:
            from vaudio.io.push import push_frames
            frame = np.zeros((8, 8, 3), np.float32)
            sent = push_frames(url, 0, [frame], arm=False, close=False,
                               retries=2, retry_wait=0.01)
            assert sent == 1 and state["hits"] == 2
        finally:
            srv.shutdown()


class TestFleetClient:
    """Fleet placement: acquire lands on the most-capacity pod, falls
    through full/dead pods, raises when everything is at capacity."""

    def _pod(self, max_streams):
        pod = MultiStreamAuralizer(AuralizerConfig(), n_streams=1,
                                   max_streams=max_streams,
                                   exit_when_exhausted=False)
        server = pod.serve(port=0)
        pod.start([iter(())])
        return pod, server

    def test_placement_and_fallthrough(self):
        from vaudio.client import FleetClient
        pod_a, srv_a = self._pod(max_streams=1)
        pod_b, srv_b = self._pod(max_streams=2)
        try:
            # Fill pod A (its one slot leased): the fleet must place
            # the next lease on pod B — and tolerate a dead URL.
            a_slot = PodClient(srv_a.url).acquire(when_empty="dark")
            fleet = FleetClient(["http://127.0.0.1:1",   # nothing there
                                 srv_a.url, srv_b.url])
            with fleet.lease(when_empty="dark") as slot:
                assert slot.client.url == srv_b.url.rstrip("/")
                frame = np.asarray(hsb_frames(0.2, 1, 1, 64, 64, 1)[0])
                slot.push(frame)
                # Second fleet lease: A is full, B grows to its cap.
                slot2 = fleet.acquire(when_empty="dark")
                assert slot2.client.url == srv_b.url.rstrip("/")
                assert pod_b.n_streams == 2
                # Everything at capacity now: the fleet raises the
                # last pod's 409.
                with pytest.raises(Exception) as exc:
                    fleet.acquire()
                assert isinstance(exc.value,
                                  (VaudioHTTPError, OSError))
                slot2.release()
            a_slot.release()
            m = fleet.metrics()
            assert m[0] is None                 # the dead URL
            assert m[2]["n_streams"] == 2
        finally:
            srv_a.stop(); pod_a.stop()
            srv_b.stop(); pod_b.stop()

    def test_shape_aware_placement(self):
        """A mixed-resolution fleet routes each client to a pod of its
        frame's shape: pods advertise their static contract
        (frame_sig) and acquire(frame=...) skips mismatches; a shape
        nobody serves raises instead of landing anywhere."""
        from vaudio.client import FleetClient
        cfg = AuralizerConfig(mip_level=1)

        def pod_with_shape(size):
            pod = MultiStreamAuralizer(cfg, n_streams=1, max_streams=2,
                                       exit_when_exhausted=False)
            server = pod.serve(port=0)
            clip = hsb_frames(0.3, 1, 1, size, size, 2)
            pod.start([iter(clip)])      # establishes the contract
            deadline = time.monotonic() + 120
            while any(pod._active):
                pod.raise_if_failed()
                assert time.monotonic() < deadline
                time.sleep(0.01)
            return pod, server

        pod_s, srv_s = pod_with_shape(32)
        pod_l, srv_l = pod_with_shape(64)
        try:
            fleet = FleetClient([srv_s.url, srv_l.url])
            big = np.asarray(hsb_frames(0.5, 1, 1, 64, 64, 1)[0])
            small = np.asarray(hsb_frames(0.5, 1, 1, 32, 32, 1)[0])
            with fleet.lease(when_empty="dark", frame=big) as slot:
                assert slot.client.url == srv_l.url.rstrip("/")
                slot.push(big)           # accepted: right-shaped pod
            with fleet.lease(when_empty="dark", frame=small) as slot:
                assert slot.client.url == srv_s.url.rstrip("/")
            odd = np.zeros((48, 48, 3), np.float32)
            with pytest.raises(RuntimeError, match="no pod serves"):
                fleet.acquire(frame=odd)
        finally:
            srv_s.stop(); pod_s.stop()
            srv_l.stop(); pod_l.stop()

    def test_ambiguous_acquire_failure_reraises(self):
        """A mid-flight reset on a pod's /slots/acquire re-raises out
        of the fleet instead of silently leasing elsewhere — the first
        pod may have granted the lease (the non-idempotent contract)."""
        import socket
        import threading
        lsock = socket.socket()
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(8)
        port = lsock.getsockname()[1]
        stop = threading.Event()

        def resetter():
            while not stop.is_set():
                try:
                    lsock.settimeout(0.2)
                    conn, _ = lsock.accept()
                except socket.timeout:
                    continue
                try:
                    conn.recv(4096)
                finally:
                    conn.close()
        t = threading.Thread(target=resetter, daemon=True)
        t.start()
        try:
            from vaudio.client import FleetClient
            fleet = FleetClient([f"http://127.0.0.1:{port}"], timeout=5)
            # Last-ditch placement reaches the resetter pod; its
            # ambiguous acquire failure must RE-RAISE, never be
            # swallowed as a fall-through.
            import urllib.error
            with pytest.raises((urllib.error.URLError, ConnectionError,
                                OSError)):
                fleet.acquire()
        finally:
            stop.set()
            t.join(timeout=5)
            lsock.close()

    def test_push_cli_fleet_mode(self, tmp_path):
        """`vaudio push --url A --url B --slot acquire` (a real
        subprocess) places the lease on the pod with capacity and
        pushes there."""
        pod_a, srv_a = self._pod(max_streams=1)
        pod_b, srv_b = self._pod(max_streams=2)
        try:
            a_slot = PodClient(srv_a.url).acquire(when_empty="dark")
            clip = np.stack([np.asarray(hsb_frames(0.2, 1, 1, 64, 64,
                                                   1)[0])] * 2)
            path = str(tmp_path / "clip.npy")
            np.save(path, clip)
            env = dict(os.environ, VAUDIO_PLATFORM="cpu",
                       PYTHONPATH="/root/repo:"
                       + os.environ.get("PYTHONPATH", ""))
            r = subprocess.run(
                [sys.executable, "-m", "vaudio", "push",
                 "--url", srv_a.url, "--url", srv_b.url,
                 "--slot", "acquire", "--input", path,
                 "--when-empty", "dark"],
                capture_output=True, text=True, timeout=300, env=env,
                cwd="/root/repo")
            assert r.returncode == 0, r.stderr
            # B's launch source exhausted -> slot 0 is the free slot
            # the fleet reuses (A's one slot is leased).
            assert f"fleet leased slot 0 on {srv_b.url.rstrip('/')}" \
                in r.stderr
            deadline = time.monotonic() + 60
            while pod_b.metrics.frames_processed < 2:
                pod_b.raise_if_failed()
                assert time.monotonic() < deadline
                time.sleep(0.02)
            a_slot.release()
        finally:
            srv_a.stop(); pod_a.stop()
            srv_b.stop(); pod_b.stop()

    def test_free_slots_metric(self):
        pod = MultiStreamAuralizer(AuralizerConfig(), n_streams=2,
                                   max_streams=4,
                                   exit_when_exhausted=False)
        server = pod.serve(port=0)
        try:
            pod.start([iter(()), iter(())])
            client = PodClient(server.url)
            deadline = time.monotonic() + 60
            while client.metrics()["free_slots"] < 2:
                pod.raise_if_failed()
                assert time.monotonic() < deadline
                time.sleep(0.02)
            m = client.metrics()
            assert m["free_slots"] == 2 and m["max_streams"] == 4
            client.acquire(when_empty="dark")
            assert client.metrics()["free_slots"] == 1
        finally:
            server.stop()
            pod.stop()


class TestAuthToken:
    """Bearer-token panels: with serve(token=...), every endpoint
    requires the token (header or ?token=); the browser page embeds the
    token it was fetched with; clients send it as a header."""

    def test_stream_panel_token(self):
        import urllib.request
        aur = Auralizer(config=AuralizerConfig(mip_level=2), debug=True)
        server = aur.serve(port=0, token="s3cret")
        try:
            client_no = StreamClient(server.url)
            with pytest.raises(VaudioHTTPError) as exc:
                client_no.metrics()
            assert exc.value.status == 401
            client = StreamClient(server.url, token="s3cret")
            assert "frames_processed" in client.metrics()
            assert client.set_params(attack=0.3)["applied"] == 1
            # Query-string form (the <img>/<audio> path) works too,
            # and the page embeds it for its own fetches.
            with urllib.request.urlopen(
                    server.url + "?token=s3cret", timeout=30) as r:
                page = r.read().decode()
            assert "?token=s3cret" in page and "&token=s3cret" in page
            with pytest.raises(VaudioHTTPError) as exc:
                StreamClient(server.url, token="wrong").metrics()
            assert exc.value.status == 401
        finally:
            server.stop()
            aur.stop()

    def test_pod_panel_token(self):
        pod = MultiStreamAuralizer(AuralizerConfig(), n_streams=1,
                                   exit_when_exhausted=False)
        server = pod.serve(port=0, token="podkey")
        try:
            pod.start([iter(())])
            with pytest.raises(VaudioHTTPError) as exc:
                PodClient(server.url).metrics()
            assert exc.value.status == 401
            client = PodClient(server.url, token="podkey")
            assert client.n_streams == 1
            # The push client half honors the token end-to-end:
            # arm + frame POST + close on a protected pod.
            from vaudio.io.push import push_frames
            frame = np.asarray(hsb_frames(0.1, 1, 1, 64, 64, 1)[0])
            sent = push_frames(server.url, 0, [frame],
                               when_empty="dark", token="podkey")
            assert sent == 1
            with pytest.raises(RuntimeError, match="401"):
                push_frames(server.url, 0, [frame], when_empty="dark")
        finally:
            server.stop()
            pod.stop()

    def test_non_ascii_token_answers_401(self):
        """A non-ASCII credential must answer 401, never raise out of
        the auth gate (str compare_digest raises TypeError on
        non-ASCII; the gate compares bytes)."""
        import urllib.error
        import urllib.request
        pod = MultiStreamAuralizer(AuralizerConfig(), n_streams=1)
        server = pod.serve(port=0, token="kéy")
        try:
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(
                    server.url + "metrics?token=%C3%A9", timeout=30)
            assert exc.value.code == 401
            # The right non-ASCII token authenticates.
            assert PodClient(server.url,
                             token="kéy").n_streams == 1
        finally:
            server.stop()
            pod.stop()

    def test_empty_token_disables_auth(self):
        """token='' (a cleared-but-set VAUDIO_TOKEN) means DISABLED —
        it must not brick the panel with an unsendable credential."""
        pod = MultiStreamAuralizer(AuralizerConfig(), n_streams=1)
        server = pod.serve(port=0, token="")
        try:
            assert PodClient(server.url).n_streams == 1
        finally:
            server.stop()
            pod.stop()

    def test_doctor_panel_token(self):
        from vaudio.utils.doctor import check_panel
        pod = MultiStreamAuralizer(AuralizerConfig(), n_streams=1,
                                   exit_when_exhausted=False)
        server = pod.serve(port=0, token="dockey")
        try:
            pod.start([iter(())])
            assert check_panel(server.url)["status"] == "fail"
            c = check_panel(server.url, token="dockey")
            assert c["status"] == "ok", c
        finally:
            server.stop()
            pod.stop()


class TestEverythingComposes:
    def test_mesh_token_lease_reap_shrink_pull_doctor(self, tmp_path):
        """The grand composition, one REAL CLI pod: device mesh (2
        virtual chips) + bearer token + push doors + fleet leasing +
        dead-client reaping + automatic capacity return + the pull
        audio client + the doctor — every serving feature active at
        once.  A lease grows the pod by a mesh multiple (2->4), the
        client dies, the reaper closes the lease, the idle shrink
        returns the capacity (4->2, a mesh multiple), unfed operator
        doors survive throughout, and the panel stays healthy."""
        env = dict(os.environ, VAUDIO_PLATFORM="cpu",
                   VAUDIO_NUM_CPU_DEVICES="2",
                   JAX_COMPILATION_CACHE_DIR="/tmp/vaudio_test_jax_cache",
                   PYTHONPATH="/root/repo:"
                   + os.environ.get("PYTHONPATH", ""))
        pod = subprocess.Popen(
            [sys.executable, "-m", "vaudio", "pod",
             "--size", "32x32", "--input", "push", "--input", "push",
             "--serve", "0", "--token", "tok", "--mesh", "2",
             "--max-streams", "4", "--lease-timeout", "2",
             "--idle-shrink", "2", "-o", str(tmp_path / "out")],
            stderr=subprocess.PIPE, cwd="/root/repo", env=env,
            text=True)
        try:
            import re
            import threading
            # Bounded URL wait: a wedged pod subprocess must FAIL the
            # test, not hang the suite (the stderr iteration alone
            # would block forever).
            found = threading.Event()
            box = {}

            def scan():
                for line in pod.stderr:
                    m = re.search(r"live panel at (http://\S+)", line)
                    if m and not found.is_set():
                        box["url"] = m.group(1).rstrip("/")
                        found.set()
                found.set()          # EOF: unblock the waiter either way

            threading.Thread(target=scan, daemon=True).start()
            assert found.wait(300) and "url" in box, \
                "pod never announced its panel"
            url = box["url"]
            client = PodClient(url, token="tok")
            assert client.n_streams == 2          # two mesh-fed doors
            # Lease: both doors are armed (not free), so the pod grows
            # by a mesh stream-axis multiple to 4.
            slot = client.acquire(when_empty="dark")
            assert slot.index == 2 and client.n_streams == 4
            frame = np.random.default_rng(7).random((32, 32, 3),
                                                    np.float32)
            for _ in range(3):
                slot.push(frame)
            # Client dies silent: reap fires, then the idle shrink
            # returns the trailing capacity in a mesh multiple.
            deadline = time.monotonic() + 120
            m = {}
            while time.monotonic() < deadline:
                m = client.metrics()
                if m["leases_reaped"] >= 1 and m["n_streams"] == 2:
                    break
                time.sleep(0.5)
            assert m["leases_reaped"] == 1 and m["auto_shrinks"] == 1, m
            assert m["n_streams"] == 2
            # The unfed operator doors survived both mechanisms.
            assert all(s["push"]["closed"] is False
                       for s in m["slots"]), m["slots"]
            # Pull-model audio still answers through the token gate.
            out = str(tmp_path / "a.wav")
            r = subprocess.run(
                [sys.executable, "-m", "vaudio", "pull", "--url", url,
                 "--slot", "0", "--seconds", "0.05", "-o", out,
                 "--token", "tok"],
                capture_output=True, text=True, timeout=300, env=env,
                cwd="/root/repo")
            assert r.returncode == 0, r.stderr
            # And the doctor judges the protected mesh pod healthy.
            r = subprocess.run(
                [sys.executable, "-m", "vaudio", "doctor", "--url",
                 url, "--token", "tok", "--skip-backend",
                 "--skip-smoke", "--json"],
                capture_output=True, text=True, timeout=300, env=env,
                cwd="/root/repo")
            checks = {c["name"]: c["status"]
                      for c in json.loads(r.stdout)}
            assert checks["panel"] == "ok", checks
        finally:
            pod.terminate()
            try:
                pod.wait(timeout=30)
            except subprocess.TimeoutExpired:
                pod.kill()


class TestPullCLI:
    def test_pull_records_wav(self, served_pod, tmp_path):
        """`vaudio pull` (a real subprocess) records a slot's live
        audio door to a local WAV with the pod's rate/channels."""
        pod, server, _client = served_pod
        out = tmp_path / "slot0.wav"
        env = dict(os.environ)
        env["VAUDIO_PLATFORM"] = "cpu"
        r = subprocess.run(
            [sys.executable, "-m", "vaudio", "pull",
             "--url", server.url, "--slot", "0",
             "--seconds", "0.1", "-o", str(out)],
            capture_output=True, text=True, timeout=300, env=env)
        assert r.returncode == 0, r.stderr
        with wave.open(str(out)) as w:
            assert w.getframerate() == int(pod.cfg.sample_rate)
            assert w.getnchannels() == pod.cfg.channels
            assert w.getnframes() == int(round(0.1 * pod.cfg.sample_rate))
