"""RawVideoSource tests — the codec-free live-capture path (VERDICT r1
item 9: a device/FIFO rawvideo source sharing the YUV frame parser).

A FIFO stands in for a capture-device node: like /dev/video0 it blocks
until the producer writes, delivers short reads at pipe-buffer boundaries
and never seeks — exercising exactly the contract the live path needs.
"""

import os
import threading
import time

import numpy as np
import pytest

from vaudio.io import RawVideoSource, parse_yuv420


def _feed_fifo(path, payload):
    """Open-for-write blocks until the reader opens; run on a thread."""
    def run():
        with open(path, "wb") as f:
            f.write(payload)
    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


@pytest.fixture
def fifo(tmp_path):
    p = str(tmp_path / "cam.fifo")
    os.mkfifo(p)
    return p


class TestRawVideoSource:
    @pytest.mark.parametrize("native", [False, True],
                             ids=["python", "native"])
    def test_rgb24_from_fifo(self, fifo, rng, native):
        h, w, n = 16, 24, 5
        frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        t = _feed_fifo(fifo, frames.tobytes())
        src = RawVideoSource(fifo, width=w, height=h, pix_fmt="rgb24",
                             native=native)
        got = list(src.frames())
        t.join(timeout=5)
        assert len(got) == n
        np.testing.assert_array_equal(np.stack(got), frames)

    @pytest.mark.parametrize("native", [False, True],
                             ids=["python", "native"])
    def test_max_frames_exact_delivery(self, fifo, rng, native):
        """Exactly max_frames delivered to a FIFO must not block on the
        never-arriving frame N+1 (the check precedes the pull)."""
        h, w, n = 8, 8, 3
        payload = rng.integers(0, 256, (n, h, w, 3),
                               dtype=np.uint8).tobytes()
        t = _feed_fifo(fifo, payload)
        src = RawVideoSource(fifo, width=w, height=h, max_frames=n,
                             native=native)
        got = list(src.frames())
        t.join(timeout=5)
        assert len(got) == n

    def test_native_reader_direct(self, fifo, rng):
        """The C++ reader's own surface: bytes iterator + read-ahead."""
        from vaudio.io import NativeFrameReader
        payload = rng.integers(0, 256, 4 * 192, dtype=np.uint8).tobytes()
        t = _feed_fifo(fifo, payload)
        r = NativeFrameReader(fifo, frame_bytes=192, n_buffers=2)
        got = list(r.frames_bytes())
        t.join(timeout=5)
        assert len(got) == 4
        assert b"".join(got) == payload
        assert r.frames_read == 4
        r.close()

    def test_native_reader_missing_path(self):
        from vaudio.io import NativeFrameReader
        with pytest.raises(FileNotFoundError):
            NativeFrameReader("/nonexistent/x", frame_bytes=16)

    def test_empty_inputs_reach_eof(self, tmp_path):
        """A zero-byte input must END the stream, not hang it: /dev/null
        (char device) and an empty regular file both read r==0 with no
        data ever seen — the C++ reader used to treat that as 'no FIFO
        writer yet' and poll forever (named FIFOs still wait; anonymous
        pipes and everything else end).  framereader.cpp read_exact."""
        from vaudio.io import NativeFrameReader
        empty = str(tmp_path / "empty.raw")
        open(empty, "wb").close()
        for path in ("/dev/null", empty):
            r = NativeFrameReader(path, frame_bytes=192)
            t0 = time.monotonic()
            got = list(r.frames_bytes())
            assert got == [] and time.monotonic() - t0 < 5.0, path
            r.close()

    def test_empty_stdin_stream_exits(self, tmp_path):
        """End-to-end: `vaudio stream < /dev/null` exits 0 promptly
        (used to hang forever in the native reader's writer wait)."""
        import subprocess
        import sys
        env = dict(os.environ, VAUDIO_PLATFORM="cpu", JAX_PLATFORMS="cpu",
                   JAX_COMPILATION_CACHE_DIR="/tmp/vaudio_test_jax_cache",
                   PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH",
                                                             ""))
        with open("/dev/null", "rb") as devnull:
            r = subprocess.run(
                [sys.executable, "-m", "vaudio", "stream", "--size",
                 "64x64"],
                stdin=devnull, capture_output=True, env=env,
                cwd="/root/repo", timeout=240)
        assert r.returncode == 0, r.stderr.decode()[-500:]
        assert b"0 frames" in r.stderr or b"frames_processed': 0" in r.stderr

    def test_i420_raw_planes_from_fifo(self, fifo, rng):
        h, w = 16, 16
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        t = _feed_fifo(fifo, y.tobytes() + u.tobytes() + v.tobytes())
        src = RawVideoSource(fifo, width=w, height=h, pix_fmt="i420",
                             raw=True)
        frame = next(src.frames())
        t.join(timeout=5)
        np.testing.assert_array_equal(frame["y"], y)
        np.testing.assert_array_equal(frame["u"], u)
        np.testing.assert_array_equal(frame["v"], v)

    def test_max_frames_stops_live_stream(self, fifo, rng):
        """A live device node never EOFs; max_frames must bound the read."""
        h, w, n = 8, 8, 4
        payload = rng.integers(0, 256, (n + 3, h, w, 3),
                               dtype=np.uint8).tobytes()
        t = _feed_fifo(fifo, payload)
        src = RawVideoSource(fifo, width=w, height=h, max_frames=n)
        got = list(src.frames())
        t.join(timeout=5)
        assert len(got) == n

    def test_short_final_frame_dropped(self, fifo, rng):
        h, w = 8, 8
        full = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
        t = _feed_fifo(fifo, full.tobytes() + b"\x00" * 17)  # partial tail
        src = RawVideoSource(fifo, width=w, height=h)
        got = list(src.frames())
        t.join(timeout=5)
        assert len(got) == 2

    def test_nv12_matches_parser(self, tmp_path, rng):
        h, w = 8, 8
        buf = rng.integers(0, 256, h * w * 3 // 2, dtype=np.uint8).tobytes()
        p = str(tmp_path / "f.nv12")
        with open(p, "wb") as f:
            f.write(buf)
        src = RawVideoSource(p, width=w, height=h, pix_fmt="nv12",
                             raw=True)
        frame = next(src.frames())
        y, u, v = parse_yuv420(buf, h, w, "nv12")
        np.testing.assert_array_equal(frame["y"], y)
        np.testing.assert_array_equal(frame["u"], u)
        np.testing.assert_array_equal(frame["v"], v)

    def test_zero_copy_views_correct_and_recycled(self, tmp_path, rng):
        """frames_view yields correct read-only views over POOL memory
        (addresses cycle through <= n_buffers slots — true zero copy),
        and a view held past the release lag is overwritten."""
        from vaudio.io import NativeFrameReader
        n, fb = 8, 192
        frames = rng.integers(0, 256, (n, fb), dtype=np.uint8)
        p = str(tmp_path / "clip.raw")
        frames.tofile(p)
        r = NativeFrameReader(p, frame_bytes=fb, n_buffers=4)
        addrs, held = [], None
        held_copy = None
        for i, view in enumerate(r.frames_view(release_lag=2)):
            assert not view.flags.writeable
            np.testing.assert_array_equal(view, frames[i])  # in-window
            addrs.append(view.__array_interface__["data"][0])
            if i == 0:
                held, held_copy = view, view.copy()
        r.close()
        assert len(addrs) == n
        assert len(set(addrs)) <= 4          # pool memory, not fresh allocs
        # Frame 0's slot was recycled and refilled by a later frame.
        assert not np.array_equal(held, held_copy)

    @pytest.mark.parametrize("depth", [1, 8])
    def test_zero_copy_stream_matches_copying_stream(self, fifo, tmp_path,
                                                     rng, depth):
        """End to end on the real consumer: the pipelined streaming
        producer over a zero-copy source produces the same PCM as the
        copying source at ANY pipeline depth.  Regression (round 4): on
        the CPU backend device_put ALIASES the pool slot, so once the
        depth-K producer runs ahead of execution the compute read
        recycled slots — borrowed frames are now copied on cpu (the
        fence only consumes the slot on real-transfer backends)."""
        from vaudio.api import Auralizer
        from vaudio.config import AuralizerConfig
        h, w, n = 32, 32, 8
        frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        path = str(tmp_path / "clip.rgb")
        frames.tofile(path)
        cfg = AuralizerConfig(mip_level=2)
        pcms = {}
        for zc in (False, True):
            aur = Auralizer(config=cfg, debug=False, pipeline_depth=depth)
            src = RawVideoSource(path, width=w, height=h, zero_copy=zc,
                                 max_frames=n)
            # 300 s like the rest of the suite: at 120 s this timed out
            # once under heavy concurrent host load (passes alone).
            aur.run_until_exhausted(src.frames(), timeout=300)
            pcms[zc] = aur.pull(n * 2048)
            aur.stop()
        np.testing.assert_array_equal(pcms[True], pcms[False])

    def test_rejects_bad_format(self):
        with pytest.raises(ValueError, match="pix_fmt"):
            RawVideoSource("x", 8, 8, pix_fmt="yuyv")
        with pytest.raises(ValueError, match="raw planar"):
            RawVideoSource("x", 8, 8, pix_fmt="rgb24", raw=True)

    def test_frames_view_rejects_lag_ge_buffers(self, tmp_path, rng):
        """Holding every pool slot un-released starves the reader thread
        of free slots — a silent deadlock; must raise up front."""
        from vaudio.io import NativeFrameReader
        p = str(tmp_path / "c.raw")
        rng.integers(0, 256, (4, 64), dtype=np.uint8).tofile(p)
        r = NativeFrameReader(p, frame_bytes=64, n_buffers=4)
        try:
            with pytest.raises(ValueError, match="n_buffers"):
                next(r.frames_view(release_lag=4))
        finally:
            r.close()

    def test_borrowed_marker_and_own_frame(self, tmp_path, rng):
        """Zero-copy sources must yield BorrowedFrame-marked arrays (so
        buffering consumers know to copy); own_frame copies exactly the
        marked ones."""
        from vaudio.io.sources import BorrowedFrame, own_frame
        h, w, n = 8, 8, 4
        frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        p = str(tmp_path / "c.rgb")
        frames.tofile(p)
        src = RawVideoSource(p, width=w, height=h, zero_copy=True,
                             max_frames=n)
        it = iter(src.frames())   # keep referenced: generator close
        got = next(it)            # frees the pool the view points into
        assert isinstance(got, BorrowedFrame)
        owned = own_frame(got)
        assert type(owned) is np.ndarray and owned.base is None
        np.testing.assert_array_equal(owned, frames[0])
        it.close()
        # Owned frames pass through untouched (no spurious copy).
        plain = np.zeros((h, w, 3), np.uint8)
        assert own_frame(plain) is plain
        d = {"y": plain, "u": plain, "v": got[: h * w].reshape(h, w, 3)[
            ..., 0].view(BorrowedFrame)}
        od = own_frame(d)
        assert od["y"] is plain and type(od["v"]) is np.ndarray

    def test_nv12_zero_copy_marks_only_pool_views(self, tmp_path, rng):
        """nv12 u/v planes are COPIES (parse_yuv420 de-interleaves);
        only y is a pool view — marking the copies BorrowedFrame would
        make own_frame re-copy ~0.5 MB/frame for nothing.  i420 u/v ARE
        views and must stay marked."""
        from vaudio.io.sources import BorrowedFrame
        h, w, n = 8, 8, 3
        payload = rng.integers(0, 256, (n, h * w * 3 // 2), np.uint8)
        for fmt, uv_borrowed in (("nv12", False), ("i420", True)):
            p = str(tmp_path / f"c.{fmt}")
            payload.tofile(p)
            src = RawVideoSource(p, width=w, height=h, pix_fmt=fmt,
                                 raw=True, zero_copy=True, max_frames=n)
            it = iter(src.frames())
            d = next(it)
            assert isinstance(d["y"], BorrowedFrame), fmt
            assert isinstance(d["u"], BorrowedFrame) == uv_borrowed, fmt
            assert isinstance(d["v"], BorrowedFrame) == uv_borrowed, fmt
            it.close()

    def test_zero_copy_chunked_stream_matches_copying(self, tmp_path,
                                                      rng):
        """chunk_frames > 1 buffers frames past the pool's lag-2 recycle
        window; the producer must copy borrowed frames into the chunk
        buffer or audio is silently corrupted.  PCM must match the
        copying source exactly."""
        from vaudio.config import AuralizerConfig
        h, w, n = 32, 32, 8
        frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        path = str(tmp_path / "clip.rgb")
        frames.tofile(path)
        from vaudio.runtime.stream import StreamingAuralizer
        cfg = AuralizerConfig(mip_level=2)
        pcms = {}
        for zc in (False, True):
            s = StreamingAuralizer(cfg, debug=False, chunk_frames=4)
            src = RawVideoSource(path, width=w, height=h, zero_copy=zc,
                                 max_frames=n)
            s.run_until_exhausted(src.frames(), timeout=240)
            pcms[zc] = s.pull(n * 2048)
            s.stop()
        np.testing.assert_array_equal(pcms[True], pcms[False])


class TestFifoToAudio:
    def test_sonify_live_fifo(self, fifo):
        """End to end: a FIFO-fed 'camera' through the streaming engine."""
        from vaudio.api import Auralizer
        from vaudio.io import hsb_frames
        h, w, n = 32, 32, 6
        frames_f32 = hsb_frames(0.33, 1.0, 1.0, width=w, height=h,
                                num_frames=n)
        payload = (frames_f32 * 255).astype(np.uint8).tobytes()
        t = _feed_fifo(fifo, payload)
        from vaudio.config import AuralizerConfig
        aur = Auralizer(config=AuralizerConfig(mip_level=2), debug=False)
        src = RawVideoSource(fifo, width=w, height=h, max_frames=n)
        aur.run_until_exhausted(src.frames(), timeout=120)
        t.join(timeout=5)
        assert aur.metrics["frames_processed"] == n
        pcm = aur.pull(2048 * 3)
        assert np.isfinite(pcm).all() and np.abs(pcm).max() > 0


class TestStreamCliInput:
    def test_cli_stream_from_fifo(self, fifo, tmp_path, rng):
        """The user-facing path: vaudio stream --input <fifo>."""
        import subprocess
        import sys
        h, w, n = 32, 32, 5
        payload = rng.integers(0, 256, (n, h, w, 3),
                               dtype=np.uint8).tobytes()
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["VAUDIO_PLATFORM"] = "cpu"   # pre-backend forcing (cli.py)
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/vaudio_test_jax_cache"
        proc = subprocess.Popen(
            [sys.executable, "-m", "vaudio", "stream", "--size",
             f"{h}x{w}", "--input", fifo, "--max-frames", str(n),
             "--mip-level", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        t = _feed_fifo(fifo, payload)
        out, err = proc.communicate(timeout=300)
        t.join(timeout=5)
        assert proc.returncode == 0, err.decode()[-2000:]
        pcm = np.frombuffer(out, "<f4")
        assert pcm.size >= 2048 and np.isfinite(pcm).all()

def _write_test_mp4(path, frames_u8_rgb, fps=30.0):
    """Encode an RGB uint8 clip to mp4 with cv2 (skip when unavailable)."""
    cv2 = pytest.importorskip("cv2")
    h, w = frames_u8_rgb.shape[1:3]
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        pytest.skip("cv2 VideoWriter cannot encode mp4 in this build")
    for f in frames_u8_rgb:
        writer.write(np.ascontiguousarray(f[..., ::-1]))   # RGB -> BGR
    writer.release()


class TestVideoFileSource:
    """Encoded-clip ingest (VideoFileSource, cv2 backend) — the
    pre-recorded-file equivalent of the reference's live capture feed
    (VisionEngine.swift:55-75)."""

    # Solid primary colors: unambiguous under a lossy codec.
    COLORS = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]

    @pytest.fixture
    def clip(self, tmp_path):
        frames = np.stack([np.full((48, 64, 3), c, np.uint8)
                           for c in self.COLORS * 2])
        path = str(tmp_path / "clip.mp4")
        _write_test_mp4(path, frames)
        return path, frames

    def test_decode_shape_dtype_and_rgb_order(self, clip):
        from vaudio.io import VideoFileSource
        path, frames = clip
        src = VideoFileSource(path)
        assert src.backend == "cv2"
        assert src.shape == (48, 64)
        assert src.num_frames == len(frames)
        decoded = list(src.frames())
        assert len(decoded) == len(frames)
        for got, want in zip(decoded, frames):
            assert got.dtype == np.uint8 and got.shape == (48, 64, 3)
            # Channel ORDER is the thing to verify (cv2 decodes BGR and
            # the source must flip): per-channel mean within lossy-codec
            # tolerance of the solid input color.
            np.testing.assert_allclose(got.mean(axis=(0, 1)),
                                       want.mean(axis=(0, 1)), atol=30)

    def test_as_float_and_tensor(self, clip):
        from vaudio.io import VideoFileSource
        path, frames = clip
        src = VideoFileSource(path, as_float=True)
        t = src.tensor()
        assert t.dtype == np.float32 and t.shape == frames.shape
        assert 0.0 <= t.min() and t.max() <= 1.0

    def test_missing_file_raises(self):
        from vaudio.io import VideoFileSource
        with pytest.raises(FileNotFoundError):
            VideoFileSource("/nonexistent/clip.mp4")

    def test_bad_backend_rejected(self, clip):
        from vaudio.io import VideoFileSource
        with pytest.raises(ValueError):
            VideoFileSource(clip[0], backend="gstreamer")

    def test_sonify_decoded_clip(self, clip):
        """Library-level end-to-end: decode -> Auralizer.sonify."""
        from vaudio.api import Auralizer
        from vaudio.io import VideoFileSource
        path, _ = clip
        audio = np.asarray(Auralizer().sonify(VideoFileSource(path).tensor()))
        assert audio.size >= 8 * 2048 and np.isfinite(audio).all()

    def test_cli_stream_mp4_no_size(self, tmp_path, clip):
        """`vaudio stream --input clip.mp4` — no --size needed, decoded
        in-process, PCM on stdout."""
        import subprocess
        import sys
        path, frames = clip
        env = dict(os.environ)
        env["VAUDIO_PLATFORM"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/vaudio_test_jax_cache"
        proc = subprocess.Popen(
            [sys.executable, "-m", "vaudio", "stream", "--input", path,
             "--max-frames", "6", "--mip-level", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        out, err = proc.communicate(timeout=300)
        assert proc.returncode == 0, err.decode()[-2000:]
        pcm = np.frombuffer(out, "<f4")
        assert pcm.size >= 2048 and np.isfinite(pcm).all()


class TestCv2CameraSource:
    """Webcam capture via OpenCV — exercised against a video file,
    which VideoCapture treats identically to a camera stream."""

    @pytest.fixture
    def clip(self, tmp_path):
        frames = np.stack([np.full((48, 64, 3), (0, 255, 0), np.uint8)
                           for _ in range(6)])
        path = str(tmp_path / "cam.mp4")
        _write_test_mp4(path, frames)
        return path

    def test_probe_and_frames(self, clip):
        from vaudio.io import Cv2CameraSource
        with Cv2CameraSource(clip) as cam:
            assert cam.shape == (48, 64)
            got = list(cam.frames())
        assert len(got) == 6
        assert got[0].dtype == np.uint8 and got[0].shape == (48, 64, 3)
        assert got[0][..., 1].mean() > 200      # green, RGB order

    def test_live_continuation_and_max_frames(self, clip):
        """frames() continues the SAME stream (live semantics) and
        max_frames bounds TOTAL delivery across calls."""
        import itertools

        from vaudio.io import Cv2CameraSource
        with Cv2CameraSource(clip, max_frames=4) as cam:
            first = list(itertools.islice(cam.frames(), 2))
            rest = list(cam.frames())
        assert len(first) == 2 and len(rest) == 2

    def test_bad_device_raises(self):
        from vaudio.io import Cv2CameraSource
        with pytest.raises(RuntimeError):
            Cv2CameraSource("/nonexistent/cam.mp4")

    def test_cli_stream_cv2_scheme(self, clip):
        """`vaudio stream --input cv2:<path>` — the webcam scheme."""
        import subprocess
        import sys
        env = dict(os.environ)
        env["VAUDIO_PLATFORM"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/vaudio_test_jax_cache"
        proc = subprocess.Popen(
            [sys.executable, "-m", "vaudio", "stream", "--input",
             f"cv2:{clip}", "--max-frames", "5", "--mip-level", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        out, err = proc.communicate(timeout=300)
        assert proc.returncode == 0, err.decode()[-2000:]
        pcm = np.frombuffer(out, "<f4")
        assert pcm.size >= 2048 and np.isfinite(pcm).all()
