"""Network (push-model) frame ingest tests.

The reference's capture stack PUSHES frames into the engine
(AVFoundation -> ``captureOutput(_:didOutput:from:)``,
VisionEngine.swift:77-101) and drops what the engine cannot keep up
with (``alwaysDiscardsLateVideoFrames``, CameraModel.swift:24).  These
tests cover the network-serving equivalent: :class:`vaudio.io.PushSource`
(the bounded newest-wins queue), the pod's idle-tick/arm_push plumbing
(runtime/multistream.py), the PodServer HTTP ingest door
(``POST /slots/<i>/push`` / ``/frames``), the ``push_frames`` client,
and the ``vaudio push`` CLI.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from vaudio.config import AuralizerConfig
from vaudio.io import PushSource, hsb_frames
from vaudio.runtime import MultiStreamAuralizer


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _post_json(url, obj, timeout=30):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _post_bytes(url, body, timeout=30):
    req = urllib.request.Request(
        url, data=body, method="POST",
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _npy_bytes(arr):
    import io
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _wait(pred, timeout=120, what="condition"):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return
        time.sleep(0.01)
    raise AssertionError(f"timed out waiting for {what}")


class TestPushSource:
    def test_fifo_order_and_drop_oldest(self):
        ps = PushSource(maxsize=3, when_empty="dark")
        for v in range(5):
            ps.push(v)
        # Capacity 3: 0 and 1 were dropped (newest frames win,
        # CameraModel.swift:24); 2, 3, 4 remain in order.
        assert ps.dropped == 2 and ps.pushed == 5 and ps.fill == 3
        it = ps.frames()
        assert [next(it) for _ in range(3)] == [2, 3, 4]
        assert next(it) is None                      # empty: dark tick

    def test_hold_policy_repeats_last(self):
        ps = PushSource(when_empty="hold")
        it = ps.frames()
        assert next(it) is None          # nothing yet: idle, not frozen
        ps.push("a")
        assert next(it) == "a"
        assert next(it) == "a"           # camera held still
        ps.push("b")
        assert next(it) == "b"
        assert next(it) == "b"

    def test_close_drains_then_stops(self):
        ps = PushSource(when_empty="dark")
        ps.push(1)
        ps.push(2)
        ps.close()
        assert list(ps.frames()) == [1, 2]
        with pytest.raises(ValueError):
            ps.push(3)

    def test_block_policy_waits_for_push(self):
        ps = PushSource(when_empty="block")
        got = []

        def consume():
            got.extend(ps.frames())
        t = threading.Thread(target=consume, daemon=True)
        t.start()
        time.sleep(0.05)
        assert got == []                 # blocked, not yielding None
        ps.push("x")
        _wait(lambda: got == ["x"], 10, "blocked consumer to wake")
        ps.close()
        t.join(timeout=10)
        assert not t.is_alive() and got == ["x"]

    def test_pushers_never_blocked_by_suspended_consumer(self):
        # Regression: yielding while holding the queue condition would
        # deadlock producers whenever the consumer sits between next()
        # calls (which is always, in the pod's tick loop).
        ps = PushSource(maxsize=4, when_empty="hold")
        it = ps.frames()
        ps.push(1)
        assert next(it) == 1             # generator now suspended
        done = threading.Event()

        def pusher():
            ps.push(2)
            done.set()
        threading.Thread(target=pusher, daemon=True).start()
        assert done.wait(5), "push blocked while consumer was suspended"

    def test_state_dict(self):
        ps = PushSource(maxsize=2, when_empty="dark")
        ps.push(1)
        s = ps.state()
        assert s == {"armed": True, "closed": False, "fill": 1,
                     "maxsize": 2, "pushed": 1, "dropped": 0,
                     "when_empty": "dark"}

    def test_bad_args(self):
        with pytest.raises(ValueError):
            PushSource(maxsize=0)
        with pytest.raises(ValueError):
            PushSource(when_empty="spin")


class TestPodPushIntegration:
    def test_push_slot_produces_audio_and_closes(self):
        """End to end without HTTP: slot 0 plays a finite clip, slot 1
        is push-armed; pushed frames synthesize audio into slot 1's
        ring; closing the push stream exhausts the slot and the pod
        exits (batch semantics)."""
        cfg = AuralizerConfig(mip_level=1)
        pod = MultiStreamAuralizer(cfg, n_streams=2)
        ps = pod.arm_push(1, when_empty="dark")
        clip = hsb_frames(0.0, 1.0, 1.0, width=64, height=64,
                          num_frames=6)
        pod.start([iter(clip), iter(())])
        try:
            for f in hsb_frames(0.33, 1.0, 1.0, width=64, height=64,
                                num_frames=6):
                ps.push(f)
                time.sleep(0.01)
            # The pod must stay alive on the open push slot even after
            # slot 0's finite clip ends.
            _wait(lambda: pod.metrics.frames_processed >= 8, 120,
                  "frames through both slots")
            assert pod.is_running
            ps.close()
            _wait(lambda: not pod.is_running, 120, "pod exit on close")
            pod.raise_if_failed()
            assert pod.rings[1].available >= 1     # slot 1 made audio
        finally:
            pod.stop()

    def test_arm_push_rejects_block_policy(self):
        pod = MultiStreamAuralizer(AuralizerConfig(), n_streams=1)
        with pytest.raises(ValueError, match="lockstep"):
            pod.arm_push(0, when_empty="block")
        with pytest.raises(ValueError, match="lockstep"):
            pod.arm_push(0, push_source=PushSource(when_empty="block"))

    def test_check_frame_structural(self):
        pod = MultiStreamAuralizer(AuralizerConfig(mip_level=1),
                                   n_streams=1)
        assert pod.check_frame(np.zeros((8, 8, 3), np.uint8)) is None
        assert "RGB" in pod.check_frame(np.zeros(7, np.float32))
        assert pod.check_frame({"y": np.zeros((8, 8), np.uint8),
                                "u": np.zeros((4, 4), np.uint8),
                                "v": np.zeros((4, 4), np.uint8)}) is None
        assert "members" in pod.check_frame({"y": np.zeros(3, np.uint8)})

    def test_check_frame_catches_dispatch_time_killers(self):
        """Frames that pass a naive shape-arity check but would RAISE at
        trace time (killing the WHOLE pod producer, not just darkening a
        slot) must be rejected at the door: mismatched 4:2:0 chroma,
        YUV into a mip_level=0 config, frames too small for the cell
        grid, non-numeric dtypes."""
        pod = MultiStreamAuralizer(AuralizerConfig(mip_level=1),
                                   n_streams=1)
        # A fresh pod has NO template signature yet — the structural
        # check is the only line of defense for the first frame.
        assert pod._template_sig is None
        yuv = {"y": np.zeros((64, 64), np.uint8),
               "u": np.zeros((2, 2), np.uint8),
               "v": np.zeros((2, 2), np.uint8)}
        assert "chroma" in pod.check_frame(yuv)
        pod0 = MultiStreamAuralizer(AuralizerConfig(mip_level=0),
                                    n_streams=1)
        good_yuv = {"y": np.zeros((64, 64), np.uint8),
                    "u": np.zeros((32, 32), np.uint8),
                    "v": np.zeros((32, 32), np.uint8)}
        assert pod0.check_frame(good_yuv) is not None   # mip_level >= 1
        pod3 = MultiStreamAuralizer(AuralizerConfig(mip_level=3),
                                    n_streams=1)
        assert "too small" in pod3.check_frame(
            np.zeros((8, 8, 3), np.uint8))      # 8>>3=1 < grid_size 4
        # String frames: _normalize_frame's float cast rejects them
        # before the structural check; the single-stream door (no
        # normalize step) relies on the dtype check directly.
        assert pod.check_frame(np.zeros((8, 8, 3), "U1")) is not None
        from vaudio.runtime.server import frame_structure_error
        assert "numeric" in frame_structure_error(
            np.zeros((8, 8, 3), "U1"))
        assert "numeric" in frame_structure_error(
            {"y": np.zeros((8, 8), "U1"), "u": np.zeros((4, 4), "U1"),
             "v": np.zeros((4, 4), "U1")})


@pytest.fixture(scope="module")
def push_pod():
    """A running 2-slot pod with the panel attached: slot 0 processed a
    finite clip (establishing the pod signature, f32 64x64 RGB); slot 1
    awaits network frames.  Torn down by closing slot 1."""
    cfg = AuralizerConfig(mip_level=1)
    pod = MultiStreamAuralizer(cfg, n_streams=2)
    server = pod.serve(port=0)
    status, resp = _post_json(server.url + "slots/1/push",
                              {"when_empty": "dark", "maxsize": 4})
    assert status == 200 and resp["armed"] and resp["when_empty"] == "dark"
    clip = hsb_frames(0.6, 1.0, 1.0, width=64, height=64, num_frames=5)
    pod.start([iter(clip), iter(())])
    _wait(lambda: pod.metrics.frames_processed >= 5, 120,
          "slot 0 clip to process")
    yield pod, server
    try:
        if pod.push_sources[1] is not None:
            pod.push_sources[1].close()
        _wait(lambda: not pod.is_running, 60, "pod exit")
    finally:
        server.stop()
        pod.stop()


class TestPushEndpoints:
    def test_push_state_and_frame_roundtrip(self, push_pod):
        pod, server = push_pod
        status, state = _get(server.url + "slots/1/push")
        assert status == 200 and state["armed"]
        frame = np.asarray(hsb_frames(0.33, 1.0, 1.0, width=64,
                                      height=64, num_frames=1))[0]
        before = pod.metrics.frames_processed
        status, resp = _post_bytes(server.url + "slots/1/frames",
                                   _npy_bytes(frame))
        assert status == 200 and resp["pushed"] >= 1
        _wait(lambda: pod.metrics.frames_processed > before, 120,
              "pushed frame to dispatch")
        # push gauges ride the slot metrics / Prometheus surface
        status, m = _get(server.url + "metrics")
        assert m["slots"][1]["push"]["armed"] is True
        assert "push_fill" in m["slots"][1]
        with urllib.request.urlopen(server.url + "metrics.prom",
                                    timeout=30) as r:
            prom = r.read().decode()
        assert 'vaudio_slot_push_fill{slot="1"}' in prom

    def test_raw_rgb24_with_query_dims(self, push_pod):
        pod, server = push_pod
        # Raw-bytes form: but the pod signature is float32 (slot 0's
        # clip), and raw rgb24 decodes to uint8 -> contract mismatch
        # must answer 400 BEFORE the queue (slot must not dark).
        raw = (np.random.default_rng(0)
               .integers(0, 255, (64, 64, 3)).astype(np.uint8))
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_bytes(server.url + "slots/1/frames?w=64&h=64&fmt=rgb24",
                        raw.tobytes())
        assert e.value.code == 400
        body = json.loads(e.value.read())
        assert "signature" in body["error"]
        status, state = _get(server.url + "slots/1/push")
        assert status == 200 and not state["closed"]   # slot unharmed

    def test_frames_to_unarmed_slot_409(self, push_pod):
        _pod, server = push_pod
        frame = np.zeros((64, 64, 3), np.float32)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_bytes(server.url + "slots/0/frames", _npy_bytes(frame))
        assert e.value.code == 409
        assert "push-armed" in json.loads(e.value.read())["error"]

    def test_structurally_bad_frame_400(self, push_pod):
        _pod, server = push_pod
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_bytes(server.url + "slots/1/frames",
                        _npy_bytes(np.zeros(17, np.float32)))
        assert e.value.code == 400

    def test_undecodable_body_400(self, push_pod):
        _pod, server = push_pod
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_bytes(server.url + "slots/1/frames", b"not a frame")
        assert e.value.code == 400
        assert "w=" in json.loads(e.value.read())["error"]

    def test_truncated_npz_body_400_not_connection_drop(self, push_pod):
        """A body with a zip magic but corrupt content raised
        zipfile.BadZipFile PAST the ValueError handler — the client saw
        a dropped connection instead of the documented 400."""
        _pod, server = push_pod
        for body in (b"PK\x03\x04 definitely not a zip",
                     b"\x93NUMPY truncated header"):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post_bytes(server.url + "slots/1/frames", body)
            assert e.value.code == 400
            assert "undecodable" in json.loads(e.value.read())["error"]

    def test_block_policy_rejected(self, push_pod):
        _pod, server = push_pod
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_json(server.url + "slots/0/push",
                       {"when_empty": "block"})
        assert e.value.code == 400

    def test_close_unarmed_404(self, push_pod):
        _pod, server = push_pod
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_json(server.url + "slots/0/push", {"close": True})
        assert e.value.code == 404


class TestPushClient:
    def test_push_frames_client_end_to_end(self):
        """The push_frames client arms, streams and closes a slot; the
        pod synthesizes the pushed clip and exits."""
        from vaudio.io.push import push_frames
        cfg = AuralizerConfig(mip_level=1)
        # Long-lived serving semantics: a pod started with nothing but
        # an empty placeholder must idle awaiting the client's arm (the
        # batch-semantics default would exit before the client arrives).
        pod = MultiStreamAuralizer(cfg, n_streams=1,
                                   exit_when_exhausted=False)
        server = pod.serve(port=0)
        try:
            pod.start([iter(())])
            clip = hsb_frames(0.15, 1.0, 1.0, width=64, height=64,
                              num_frames=6)
            sent = push_frames(server.url, 0, clip, when_empty="dark")
            assert sent == 6
            _wait(lambda: pod.metrics.frames_processed == 6, 120,
                  "pushed clip to process")
            pod.raise_if_failed()
            assert pod.is_running          # long-lived: idles, not exits
            assert pod.rings[0].available >= 1
        finally:
            server.stop()
            pod.stop()

    def test_client_raises_on_rejected_frame(self):
        from vaudio.io.push import push_frames
        pod = MultiStreamAuralizer(AuralizerConfig(mip_level=1),
                                   n_streams=1)
        server = pod.serve(port=0)
        try:
            with pytest.raises(RuntimeError, match="RGB"):
                push_frames(server.url, 0,
                            [np.zeros(9, np.float32)],
                            when_empty="dark")
        finally:
            server.stop()
            pod.stop()


class TestSingleStreamPush:
    def test_api_push_stream_end_to_end(self):
        """The single-stream counterpart: Auralizer(source=PushSource),
        frames POSTed to the LiveServer's /frames door, closed via
        /push, PCM verified."""
        from vaudio.api import Auralizer
        ps = PushSource(when_empty="block")
        aur = Auralizer(source=ps, config=AuralizerConfig(mip_level=1),
                        debug=False)
        server = aur.serve(port=0)
        try:
            aur.start()
            clip = np.asarray(hsb_frames(0.8, 1.0, 1.0, width=64,
                                         height=64, num_frames=6))
            for f in clip:
                status, resp = _post_bytes(server.url + "frames",
                                           _npy_bytes(f))
                assert status == 200
            status, state = _get(server.url + "push")
            assert status == 200 and state["armed"] and state["pushed"] == 6
            status, state = _post_json(server.url + "push",
                                       {"close": True})
            assert status == 200 and state["closed"]
            _wait(lambda: not aur.is_running, 120, "stream end on close")
            aur.raise_if_failed()
            m = aur.metrics
            assert m["frames_processed"] == 6
            assert m["buffer_fill"] >= 1
        finally:
            server.stop()
            aur.stop()

    def test_frames_endpoint_409_on_non_push_stream(self):
        from vaudio.api import Auralizer
        aur = Auralizer(config=AuralizerConfig(mip_level=1), debug=False)
        server = aur.serve(port=0)
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                _post_bytes(server.url + "frames",
                            _npy_bytes(np.zeros((8, 8, 3), np.float32)))
            assert e.value.code == 409
            status, state = _get(server.url + "push")
            assert status == 200 and state == {"armed": False}
        finally:
            server.stop()

    def test_non_block_policy_rejected_single_stream(self):
        from vaudio.api import Auralizer
        aur = Auralizer(source=PushSource(when_empty="hold"),
                        config=AuralizerConfig(mip_level=1), debug=False)
        with pytest.raises(ValueError, match="block"):
            aur.start()
        # The REJECTED source must not stay installed: a running
        # LiveServer would otherwise answer 200 on /frames and queue
        # into a source no producer ever consumes.
        assert aur.push_source is None

    def test_single_push_audio_released_without_next_push(self):
        """Flush-on-idle: the depth-1 dispatch pipeline used to withhold
        each pushed frame's audio until the NEXT push (or close) arrived
        — an interactive client always heard its audio one push late."""
        from vaudio.api import Auralizer
        ps = PushSource(when_empty="block")
        aur = Auralizer(source=ps, config=AuralizerConfig(mip_level=1),
                        debug=False)
        aur.start()
        try:
            clip = np.asarray(hsb_frames(0.3, 1.0, 1.0, width=64,
                                         height=64, num_frames=1))
            ps.push(clip[0])
            # No close, no second frame: the audio must still arrive.
            _wait(lambda: aur.metrics["buffer_fill"] >= 1, 120,
                  "audio from a single un-followed push")
            aur.raise_if_failed()
        finally:
            aur.stop()

    def test_chunked_push_flushes_partial_chunk_on_idle(self):
        """chunk_frames > 1 + a push source: a partial chunk must not
        wait (possibly forever) for the queue to refill — on idle it
        flushes as single steps."""
        from vaudio.api import Auralizer
        ps = PushSource(when_empty="block")
        aur = Auralizer(source=ps, config=AuralizerConfig(mip_level=1),
                        chunk_frames=4, debug=False)
        aur.start()
        try:
            clip = np.asarray(hsb_frames(0.7, 1.0, 1.0, width=64,
                                         height=64, num_frames=2))
            for f in clip:
                ps.push(f)
            _wait(lambda: aur.metrics["frames_processed"] >= 2, 120,
                  "both frames of a sub-chunk push to process")
            _wait(lambda: aur.metrics["buffer_fill"] >= 2, 120,
                  "sub-chunk audio to flush on idle")
            aur.raise_if_failed()
        finally:
            aur.stop()

    def test_stop_wakes_blocked_push_producer(self):
        """Auralizer.stop() closes the push source first: a producer
        blocked in PushSource.frames()'s condition wait used to burn
        the full 10 s join timeout and leak a zombie thread."""
        from vaudio.api import Auralizer
        ps = PushSource(when_empty="block")
        aur = Auralizer(source=ps, config=AuralizerConfig(mip_level=1),
                        debug=False)
        aur.start()
        clip = np.asarray(hsb_frames(0.5, 1.0, 1.0, width=64, height=64,
                                     num_frames=1))
        ps.push(clip[0])
        _wait(lambda: aur.metrics["frames_processed"] >= 1, 120,
              "warm-up frame")
        t0 = time.monotonic()
        aur.stop()                    # producer is blocked in wait()
        assert time.monotonic() - t0 < 5.0
        assert not aur.is_running
        # No zombie: a fresh start on a new source must be accepted.
        aur2_src = PushSource(when_empty="block")
        aur.start(aur2_src)
        aur2_src.close()
        _wait(lambda: not aur.is_running, 60, "restarted stream to end")
        aur.stop()

    def test_failed_stream_answers_409_on_frames(self):
        """A dead producer must not keep collecting 200s: POST /frames
        on a failed stream answers 409 with the failure."""
        from vaudio.api import Auralizer
        ps = PushSource(when_empty="block")
        aur = Auralizer(source=ps, config=AuralizerConfig(mip_level=1),
                        debug=False)
        server = aur.serve(port=0)
        try:
            aur.start()
            aur._stream._error = RuntimeError("injected wreck")
            with pytest.raises(urllib.error.HTTPError) as e:
                _post_bytes(server.url + "frames",
                            _npy_bytes(np.zeros((64, 64, 3), np.float32)))
            assert e.value.code == 409
            assert "FAILED" in json.loads(e.value.read())["error"]
        finally:
            aur._stream._error = None
            server.stop()
            aur.stop()

    def test_cli_push_stream_rejects_pod_arm_flags(self, tmp_path):
        """--when-empty/--maxsize/--reset are pod arm-time knobs; with
        --stream they were silently ignored."""
        from vaudio.cli import main
        p = str(tmp_path / "c.npy")
        np.save(p, np.zeros((1, 16, 16, 3), np.float32))
        with pytest.raises(SystemExit, match="arm time"):
            main(["push", "--url", "http://127.0.0.1:1", "--stream",
                  "--when-empty", "dark", "--input", p])

    def test_stream_cli_push(self, tmp_path):
        """`vaudio stream --input push --serve` + `vaudio push --stream`
        across two subprocesses; PCM lands on the stream's stdout."""
        import os
        import re
        import subprocess
        import sys

        clip = hsb_frames(0.45, 1.0, 1.0, width=64, height=64,
                          num_frames=6)
        p = str(tmp_path / "clip.npy")
        np.save(p, np.asarray(clip))
        env = dict(os.environ, VAUDIO_PLATFORM="cpu",
                   JAX_COMPILATION_CACHE_DIR="/tmp/vaudio_test_jax_cache",
                   PYTHONPATH="/root/repo:" + os.environ.get(
                       "PYTHONPATH", ""))
        out_pcm = open(tmp_path / "out.pcm", "wb")
        proc = subprocess.Popen(
            [sys.executable, "-m", "vaudio", "stream", "--input", "push",
             "--serve", "127.0.0.1:0"],
            stdout=out_pcm, stderr=subprocess.PIPE, env=env,
            cwd="/root/repo")
        try:
            url = None
            deadline = time.monotonic() + 300
            lines = []
            while time.monotonic() < deadline:
                line = proc.stderr.readline().decode()
                if not line and proc.poll() is not None:
                    break
                lines.append(line)
                m = re.search(r"panel at (http://\S+/)", line)
                if m:
                    url = m.group(1)
                    break
            assert url, "stream never printed its panel URL: " \
                + "".join(lines)
            res = subprocess.run(
                [sys.executable, "-m", "vaudio", "push", "--url", url,
                 "--stream", "--input", p],
                capture_output=True, timeout=600, env=env,
                cwd="/root/repo")
            assert res.returncode == 0, res.stderr.decode()[-800:]
            assert b"6 frames" in res.stderr
            _out, err = proc.communicate(timeout=600)
            assert proc.returncode == 0, err.decode()[-800:]
            out_pcm.close()
            pcm = np.fromfile(tmp_path / "out.pcm", "<f4")
            assert pcm.size > 0 and np.isfinite(pcm).all()
            assert float(np.abs(pcm).max()) > 1e-4   # audible, not silence
        finally:
            out_pcm.close()
            if proc.poll() is None:
                proc.kill()
                proc.communicate()


class TestPushCLI:
    def test_pod_push_slot_fed_by_push_cli(self, tmp_path):
        """Full network loop across two CLI subprocesses: `vaudio pod
        --input push --serve` hosts the slot, `vaudio push` feeds it an
        .npy clip over HTTP, and the pod writes the slot's WAV."""
        import os
        import re
        import subprocess
        import sys
        import wave

        clip = hsb_frames(0.33, 1.0, 1.0, width=64, height=64,
                          num_frames=8)
        p = str(tmp_path / "clip.npy")
        np.save(p, np.asarray(clip))
        env = dict(os.environ, VAUDIO_PLATFORM="cpu",
                   JAX_COMPILATION_CACHE_DIR="/tmp/vaudio_test_jax_cache",
                   PYTHONPATH="/root/repo:" + os.environ.get(
                       "PYTHONPATH", ""))
        pod_proc = subprocess.Popen(
            [sys.executable, "-m", "vaudio", "pod", "--size", "64x64",
             "--input", "push:dark", "--serve", "127.0.0.1:0",
             "-o", str(tmp_path / "out")],
            stderr=subprocess.PIPE, stdout=subprocess.PIPE, env=env,
            cwd="/root/repo")
        try:
            # Read stderr until BOTH the panel URL and the armed-slot
            # line appear (pushing with --no-arm before the arm would
            # 409).
            url = armed = None
            deadline = time.monotonic() + 300
            lines = []
            while time.monotonic() < deadline and not (url and armed):
                line = pod_proc.stderr.readline().decode()
                if not line and pod_proc.poll() is not None:
                    break
                lines.append(line)
                m = re.search(r"live panel at (http://\S+/)", line)
                if m:
                    url = m.group(1)
                if "armed for push ingest" in line:
                    armed = True
            assert url and armed, \
                "pod never announced panel+arm: " + "".join(lines)
            res = subprocess.run(
                [sys.executable, "-m", "vaudio", "push", "--url", url,
                 "--slot", "0", "--input", p, "--no-arm"],
                capture_output=True, timeout=600, env=env,
                cwd="/root/repo")
            assert res.returncode == 0, res.stderr.decode()[-800:]
            assert b"8 frames" in res.stderr
            out, err = pod_proc.communicate(timeout=600)
            assert pod_proc.returncode == 0, err.decode()[-800:]
            wav = tmp_path / "out" / "slot0.wav"
            assert wav.exists()
            with wave.open(str(wav)) as w:
                assert w.getnframes() > 0
        finally:
            if pod_proc.poll() is None:
                pod_proc.kill()
                pod_proc.communicate()
