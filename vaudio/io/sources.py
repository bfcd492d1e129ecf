"""Frame sources.

A source is any object with ``.frames()`` yielding [H, W, 3] RGB arrays
(uint8, or f32 in [0,1] — the device step normalizes uint8 on-chip) and a
``.shape`` property — the host-side stand-in for the reference's
AVCaptureSession + CVPixelBuffer path (VisionEngine.swift:55-75, 91-128).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np


def hsb_to_rgb(h: float, s: float, b: float) -> np.ndarray:
    """HSB -> RGB, the UIColor(hue:saturation:brightness:) model used by the
    tutorial's synthetic frames (Tutorial/TutorialStart.swift:109-124)."""
    h = (h % 1.0) * 6.0
    i = int(h) % 6
    f = h - int(h)
    p = b * (1.0 - s)
    q = b * (1.0 - s * f)
    t = b * (1.0 - s * (1.0 - f))
    rgb = [(b, t, p), (q, b, p), (p, b, t), (p, q, b), (t, p, b),
           (b, p, q)][i]
    return np.asarray(rgb, dtype=np.float32)


def solid_color_frames(rgb, width: int = 640, height: int = 480,
                       num_frames: int = 1) -> np.ndarray:
    """Constant-color frames — createColorBuffer equivalent
    (Utilities/CreateColorBuffer.swift:16-65, which fills a BGRA
    CVPixelBuffer with one color; we produce the RGB tensor directly).

    Returns f32[num_frames, height, width, 3].
    """
    rgb = np.asarray(rgb, dtype=np.float32).reshape(3)
    out = np.empty((num_frames, height, width, 3), np.float32)
    out[...] = rgb
    return out


def hsb_frames(hue: float, saturation: float, brightness: float,
               width: int = 640, height: int = 480,
               num_frames: int = 1) -> np.ndarray:
    """Tutorial-style synthetic frames parameterized in HSB
    (Tutorial/TutorialStart.swift:46,109-124: 640x480 solid color at the
    slider-selected hue/saturation/brightness)."""
    return solid_color_frames(hsb_to_rgb(hue, saturation, brightness),
                              width, height, num_frames)


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                  studio_swing: bool = True) -> np.ndarray:
    """Planar YUV 4:2:0 (I420) -> uint8 RGB, BT.601.

    Camera/video pipelines commonly deliver I420/NV12; this is the host
    conversion for those sources (``studio_swing``: 16-235/16-240 range,
    the common camera output; False = full swing).

    Args: y: u8[H, W]; u, v: u8[H/2, W/2] — or pre-aligned at full luma
    resolution (same shape as ``y``), in which case the 2x upsample is
    skipped (used by the subsampled preview path,
    :func:`vaudio.utils.render.input_preview_image`).
    Returns u8[H, W, 3].
    """
    y = y.astype(np.float32)
    u = u.astype(np.float32) - 128.0
    v = v.astype(np.float32) - 128.0
    if u.shape != y.shape:
        u = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:y.shape[0],
                                                          :y.shape[1]]
        v = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:y.shape[0],
                                                          :y.shape[1]]
    if studio_swing:
        yv = (y - 16.0) * (255.0 / 219.0)
        scale = 255.0 / 224.0
        u, v = u * scale, v * scale
    else:
        yv = y
    r = yv + 1.402 * v
    g = yv - 0.344136 * u - 0.714136 * v
    b = yv + 1.772 * u
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


class BorrowedFrame(np.ndarray):
    """Marker subclass: an ndarray VIEW whose backing memory belongs to
    the native reader's slot pool and is recycled a few iterations later
    (:meth:`NativeFrameReader.frames_view` lifetime contract).  Carries
    no behavior — it exists so consumers that buffer frames past the
    current iteration (e.g. the chunk-batched streaming producer) can
    detect borrowed memory and copy it; plain owned arrays are passed
    through untouched."""


def own_frame(frame):
    """Return ``frame`` with any borrowed (pool-backed) arrays copied —
    safe to hold indefinitely.  Accepts an ndarray or a planar-YUV dict."""
    if isinstance(frame, dict):
        return {k: (np.array(v) if isinstance(v, BorrowedFrame) else v)
                for k, v in frame.items()}
    return np.array(frame) if isinstance(frame, BorrowedFrame) else frame


class NativeFrameReader:
    """ctypes binding to the C++ double-buffered frame reader
    (native/framereader.cpp): a background thread reads fixed-size raw
    frames from a file/FIFO/device node into a bounded buffer pool, so
    the consumer's device dispatch overlaps the next frame's I/O — the
    native equivalent of the reference's capture-delegate thread
    (VisionEngine.swift:55-75).

    Two consumption APIs:

    * :meth:`frames_bytes` — per-frame ``bytes`` (one copy out of the
      pool slot; the slot is recycled immediately; no lifetime rules).
    * :meth:`frames_view` — TRUE zero-copy: read-only NumPy views over
      the slot memory itself, with a deferred release protocol (a slot
      is recycled ``release_lag`` iterations after it was yielded).
    """

    def __init__(self, path: str, frame_bytes: int, n_buffers: int = 4,
                 timeout_ms: Optional[int] = None):
        """``timeout_ms``: per-frame wait bound; None (default) blocks
        indefinitely — a live capture source legitimately waits for its
        producer to connect (the reference's capture delegate simply
        idles until frames arrive)."""
        from vaudio.runtime.ringbuffer import _load_native
        lib = _load_native()
        if lib is None or not hasattr(lib, "va_fr_open"):
            raise RuntimeError("native frame reader unavailable")
        self._lib = lib
        self._h = lib.va_fr_open(path.encode(), frame_bytes, n_buffers)
        if not self._h:
            raise FileNotFoundError(f"cannot open {path!r}")
        self.frame_bytes = frame_bytes
        self.n_buffers = n_buffers
        self.timeout_ms = timeout_ms

    def _next_slot(self) -> int:
        """Block for the next filled slot; -1 = stream done and drained."""
        while True:
            slot = self._lib.va_fr_next(
                self._h,
                self.timeout_ms if self.timeout_ms is not None else 1000)
            if slot == -2:
                if self.timeout_ms is None:
                    continue               # block until frames arrive
                raise TimeoutError(
                    f"no frame within {self.timeout_ms} ms")
            return slot

    def frames_bytes(self) -> Iterator[bytes]:
        import ctypes
        while True:
            slot = self._next_slot()
            if slot == -1:
                return                     # stream done and drained
            ptr = self._lib.va_fr_buffer(self._h, slot)
            data = ctypes.string_at(ptr, self.frame_bytes)
            self._lib.va_fr_release(self._h, slot)
            yield data

    def frames_view(self, release_lag: int = 2) -> Iterator[np.ndarray]:
        """Zero-copy frame iteration: yields read-only u8[frame_bytes]
        NumPy views wrapping the pool slot's memory directly (the
        protocol framereader.cpp's acquire/release was built for — no
        per-frame memcpy, ~6 MB saved per 1080p RGB frame).

        Lifetime contract: the view yielded at iteration *n* is backed
        by pool memory that is recycled at iteration ``n + release_lag``
        (and on generator close).  The consumer must be finished reading
        a frame — e.g. its device transfer forced — within that window;
        consumers that buffer frames longer (the chunk-batched stream
        path) must copy or use :meth:`frames_bytes`.  The default lag of
        2 matches the pipelined streaming producer, which fully consumes
        frame k while dispatching frame k+1 (vaudio/runtime/stream.py).

        Requires ``n_buffers > release_lag`` so the reader thread always
        has a free slot to fill ahead (enforced: holding every slot
        un-released would deadlock the reader silently).
        """
        import ctypes
        from collections import deque
        if release_lag < 1:
            raise ValueError("release_lag must be >= 1")
        if release_lag >= self.n_buffers:
            raise ValueError(
                f"release_lag ({release_lag}) must be < n_buffers "
                f"({self.n_buffers}): holding every pool slot leaves the "
                f"reader thread no free slot and deadlocks the stream")
        pending: deque = deque()
        try:
            while True:
                slot = self._next_slot()
                if slot == -1:
                    return
                ptr = self._lib.va_fr_buffer(self._h, slot)
                buf = (ctypes.c_uint8 * self.frame_bytes).from_address(
                    ctypes.addressof(ptr.contents))
                view = np.frombuffer(buf, np.uint8).view(BorrowedFrame)
                view.flags.writeable = False
                pending.append(slot)
                while len(pending) > release_lag:
                    self._lib.va_fr_release(self._h, pending.popleft())
                yield view
        finally:
            while pending:
                self._lib.va_fr_release(self._h, pending.popleft())

    @property
    def frames_read(self) -> int:
        return self._lib.va_fr_frames_read(self._h)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.va_fr_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def parse_yuv420(buf: bytes, height: int, width: int, fmt: str = "i420"):
    """Split one raw YUV 4:2:0 frame into (y, u, v) uint8 planes.

    ``i420``: planar Y, U, V.  ``nv12``: planar Y then interleaved UVUV...
    (the most common camera/ISP memory layout).  Frame size: H*W*3/2 bytes.
    """
    h, w = height, width
    ysz, csz = h * w, (h // 2) * (w // 2)
    y = np.frombuffer(buf, np.uint8, ysz).reshape(h, w)
    if fmt == "i420":
        u = np.frombuffer(buf, np.uint8, csz, ysz).reshape(h // 2, w // 2)
        v = np.frombuffer(buf, np.uint8, csz, ysz + csz).reshape(
            h // 2, w // 2)
    else:  # nv12: interleaved UV plane
        uv = np.frombuffer(buf, np.uint8, 2 * csz, ysz).reshape(h // 2, w)
        u = np.ascontiguousarray(uv[:, 0::2])
        v = np.ascontiguousarray(uv[:, 1::2])
    return y, u, v


class RawVideoSource:
    """Uncompressed frames from any readable node — plain file, FIFO, or a
    capture-device node (e.g. a V4L2 ``/dev/video*`` configured for a raw
    pixel format).

    The live-camera capability equivalent (CameraModel.swift:12-37 +
    VisionEngine.swift:55-75: AVCaptureSession delivering raw BGRA pixel
    buffers) without any codec dependency: the OS/capture process produces
    rawvideo bytes and this source blocks on ``read`` until each full
    frame arrives — exactly the FIFO/device contract.

    ``pix_fmt``: ``rgb24`` (H*W*3 bytes/frame, yields u8[H, W, 3]) or
    ``i420`` / ``nv12`` (H*W*3/2 bytes/frame; yields host-converted u8
    RGB, or with ``raw=True`` planar ``{"y","u","v"}`` dicts for the
    device-side conversion path — half the ingest bytes, see
    vision.yuv420_mip_to_rgb_planes).

    ``max_frames``: stop after N frames (a live device node never EOFs).
    """

    def __init__(self, path: str, width: int, height: int,
                 pix_fmt: str = "rgb24", fps: float = 30.0,
                 studio_swing: bool = True, raw: bool = False,
                 max_frames: Optional[int] = None,
                 native: Optional[bool] = None,
                 zero_copy: bool = False):
        """``native``: use the C++ double-buffered reader
        (:class:`NativeFrameReader` — a background thread overlaps frame
        I/O with the consumer's device dispatch).  None = auto (native
        when the library loads, silent Python fallback otherwise);
        True = required; False = pure Python.

        ``zero_copy``: with the native reader, yield frames as read-only
        NumPy views over the reader's pool slots instead of copying each
        frame out (:meth:`NativeFrameReader.frames_view` — saves a
        frame-sized memcpy per frame, ~6 MB at 1080p RGB).  Lifetime
        contract: a yielded frame's memory is recycled two iterations
        later, so the consumer must be done with frame k before pulling
        frame k+2 — true for the pipelined single-frame streaming
        producer, NOT for consumers that buffer frames (chunked
        streaming) or keep long-lived references.  Ignored (plain
        copies) when the native reader is unavailable."""
        if pix_fmt not in ("rgb24", "i420", "nv12"):
            raise ValueError(f"unknown pix_fmt {pix_fmt!r} "
                             f"(expected rgb24, i420 or nv12)")
        if raw and pix_fmt == "rgb24":
            raise ValueError("raw planar output requires a YUV pix_fmt")
        self.path = path
        self._w, self._h = int(width), int(height)
        self.pix_fmt = pix_fmt
        self.fps = fps
        self.studio_swing = studio_swing
        self.raw = raw
        self.max_frames = max_frames
        self.native = native
        self.zero_copy = zero_copy

    @property
    def shape(self) -> Tuple[int, int]:
        return self._h, self._w

    @property
    def frame_bytes(self) -> int:
        if self.pix_fmt == "rgb24":
            return self._h * self._w * 3
        return self._h * self._w * 3 // 2

    def _read_exact(self, f, n: int) -> bytes:
        """Read exactly n bytes; FIFOs/devices return short reads at
        pipe-buffer boundaries, so loop until the frame is complete."""
        chunks = []
        got = 0
        while got < n:
            chunk = f.read(n - got)
            if not chunk:
                break
            chunks.append(chunk)
            got += len(chunk)
        return b"".join(chunks)

    def _frame_bytes_iter(self) -> Iterator[bytes]:
        """Raw frame payloads — the native read-ahead reader when
        available, else the Python exact-read loop."""
        if self.native is not False:
            reader = None
            try:
                reader = NativeFrameReader(self.path, self.frame_bytes)
            except FileNotFoundError:
                raise
            except Exception:
                if self.native:
                    raise
            if reader is not None:
                try:
                    if self.zero_copy:
                        yield from reader.frames_view()
                    else:
                        yield from reader.frames_bytes()
                finally:
                    reader.close()
                return
        with open(self.path, "rb", buffering=0) as f:
            while True:
                buf = self._read_exact(f, self.frame_bytes)
                if len(buf) < self.frame_bytes:
                    break
                yield buf

    def frames(self) -> Iterator[np.ndarray]:
        h, w = self._h, self._w
        n = 0
        it = self._frame_bytes_iter()
        try:
            # max_frames is checked BEFORE pulling: a live source that
            # delivered exactly max_frames must not block on frame N+1.
            while self.max_frames is None or n < self.max_frames:
                buf = next(it, None)
                if buf is None:
                    break
                n += 1
                borrowed = isinstance(buf, BorrowedFrame)
                if self.pix_fmt == "rgb24":
                    frame = np.frombuffer(buf, np.uint8).reshape(h, w, 3)
                    # np.frombuffer strips the subclass; re-mark so
                    # buffering consumers know to copy (zero-copy mode).
                    yield frame.view(BorrowedFrame) if borrowed else frame
                    continue
                y, u, v = parse_yuv420(buf, h, w, self.pix_fmt)
                if self.raw:
                    if borrowed:
                        # Mark only true pool-slot views: i420 u/v are
                        # views into the slot, but nv12 u/v were copied
                        # out by parse_yuv420's de-interleave — marking
                        # those would force own_frame to re-copy them.
                        y = y.view(BorrowedFrame)
                        if self.pix_fmt == "i420":
                            u = u.view(BorrowedFrame)
                            v = v.view(BorrowedFrame)
                    yield {"y": y, "u": u, "v": v}
                else:
                    yield yuv420_to_rgb(y, u, v, self.studio_swing)
        finally:
            it.close()


class CameraSource(RawVideoSource):
    """Live capture-device source — the framework's CameraModel
    (CameraModel.swift:12-37: AVCaptureSession on the built-in camera,
    started by the UI and feeding the vision engine).

    On Linux the camera is a V4L2 node delivering raw frames; point this
    at ``/dev/video0`` (configure the device for a raw pixel format with
    ``v4l2-ctl --set-fmt-video`` or have a capture process feed a FIFO).
    Defaults match common webcams: NV12, device-side YUV conversion (half
    the ingest bytes), endless stream (stop via ``max_frames`` or
    ``Auralizer.stop()``).
    """

    def __init__(self, device: str = "/dev/video0", width: int = 1920,
                 height: int = 1080, pix_fmt: str = "nv12",
                 fps: float = 30.0, max_frames: Optional[int] = None):
        super().__init__(device, width=width, height=height,
                         pix_fmt=pix_fmt, fps=fps,
                         raw=pix_fmt in ("i420", "nv12"),
                         max_frames=max_frames)


class Cv2CameraSource:
    """Live webcam capture via OpenCV ``VideoCapture`` — the zero-config
    camera front door (the AVCaptureSession of CameraModel.swift:12-37
    for arbitrary webcams).

    :class:`CameraSource` reads a V4L2 node already configured for a RAW
    pixel format; most webcams instead deliver compressed MJPEG/H.264,
    which cv2's bundled codecs decode.  ``device`` is a cv2 capture
    index (0 = default camera) or any string cv2 accepts (a device path,
    a GStreamer pipeline, or a video file — the latter is how tests
    exercise this path without hardware).

    Live semantics: the capture is opened once at construction (shape/
    fps probed from the device) and ``frames()`` drains it until the
    device stops delivering or ``max_frames`` is reached — a second
    ``frames()`` call continues the SAME live stream, it does not
    rewind.  Yields uint8 RGB (the exact int8 ingest path).
    """

    def __init__(self, device=0, width: Optional[int] = None,
                 height: Optional[int] = None, fps: Optional[float] = None,
                 max_frames: Optional[int] = None):
        try:
            import cv2
        except ImportError:
            raise RuntimeError(
                "Cv2CameraSource requires the opencv-python package; "
                "for raw V4L2 nodes use CameraSource instead")
        self._cv2 = cv2
        self._cap = cv2.VideoCapture(device)
        if not self._cap.isOpened():
            self._cap.release()
            raise RuntimeError(f"cv2 could not open capture device "
                               f"{device!r}")
        # Requested capture properties are best-effort (drivers may
        # ignore them); the authoritative shape is re-probed below.
        if width is not None:
            self._cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
        if height is not None:
            self._cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
        if fps is not None:
            self._cap.set(cv2.CAP_PROP_FPS, fps)
        self._w = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self._h = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.fps = float(self._cap.get(cv2.CAP_PROP_FPS)) or (fps or 30.0)
        self.max_frames = max_frames
        self._delivered = 0

    @property
    def shape(self) -> Tuple[int, int]:
        return self._h, self._w

    def frames(self) -> Iterator[np.ndarray]:
        if self._cap is None:
            raise RuntimeError("capture is closed")
        while self.max_frames is None or self._delivered < self.max_frames:
            ok, bgr = self._cap.read()
            if not ok:
                break
            self._delivered += 1
            yield np.ascontiguousarray(bgr[..., ::-1])   # BGR -> RGB
        # Live device: leave the capture open for a subsequent frames()
        # call; close() is the explicit release.

    def close(self) -> None:
        if self._cap is not None:
            self._cap.release()
            self._cap = None

    def __enter__(self) -> "Cv2CameraSource":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class Yuv420FileSource(RawVideoSource):
    """Raw YUV 4:2:0 file/stream source (the codec-free camera formats) —
    a :class:`RawVideoSource` restricted to the YUV pixel formats, kept as
    the planar-ingest front door."""

    def __init__(self, path: str, width: int, height: int,
                 fps: float = 30.0, studio_swing: bool = True,
                 raw: bool = False, fmt: str = "i420"):
        """``raw=True`` yields planar ``{"y", "u", "v"}`` uint8 dicts for
        the device-side conversion path (half the ingest bytes of RGB; see
        vision.yuv420_mip_to_rgb_planes) instead of host-converted RGB."""
        if fmt not in ("i420", "nv12"):
            raise ValueError(f"unknown YUV format {fmt!r}")
        super().__init__(path, width, height, pix_fmt=fmt, fps=fps,
                         studio_swing=studio_swing, raw=raw)
        self.fmt = fmt


def bgra_to_rgb(frame_bgra_u8: np.ndarray) -> np.ndarray:
    """Camera-format conversion: BGRA uint8 -> RGB float32 in [0,1]
    (the reference forces kCVPixelFormatType_32BGRA,
    VisionEngine.swift:62-64, and reads .rgb in the kernels)."""
    f = frame_bgra_u8.astype(np.float32) / 255.0
    return f[..., [2, 1, 0]]


class ArraySource:
    """Wrap a decoded video tensor [T, H, W, 3] as a source.

    uint8 tensors are kept as uint8 by default — the device step normalizes
    on-chip, so host->device ingest ships 1 byte per channel instead of 4
    (pass ``as_float=True`` to convert up front instead).

    A 3-D ``[H, W, 3]`` array is accepted as a single frame (wrapped to a
    T=1 clip).  Ambiguity note: a ``[T, H, 3]`` clip of 3-pixel-wide
    frames has the same shape signature and is therefore interpreted as
    ONE ``[H, W, 3]`` frame — pass such degenerate clips pre-expanded as
    ``frames[:, :, None, :]`` broadcast to ``[T, H, W, 3]``, or as an
    explicit 4-D tensor.
    """

    def __init__(self, frames: np.ndarray, fps: float = 30.0,
                 as_float: bool = False):
        frames = np.asarray(frames)
        if frames.ndim == 3 and frames.shape[-1] == 3:
            frames = frames[None]            # single frame -> T=1 clip
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError(
                f"expected [T,H,W,3] or [H,W,3], got {frames.shape}")
        if frames.dtype == np.uint8 and as_float:
            frames = frames.astype(np.float32) / 255.0
        if frames.dtype != np.uint8:
            frames = frames.astype(np.float32)
        self._frames = frames
        self.fps = fps

    @property
    def shape(self) -> Tuple[int, int]:
        return self._frames.shape[1], self._frames.shape[2]

    @property
    def num_frames(self) -> int:
        return self._frames.shape[0]

    def tensor(self) -> np.ndarray:
        return self._frames

    def frames(self) -> Iterator[np.ndarray]:
        yield from self._frames

    @classmethod
    def load(cls, path: str, fps: float = 30.0) -> "ArraySource":
        """Load frames from .npy/.npz (key 'frames')."""
        if path.endswith(".npz"):
            return cls(np.load(path)["frames"], fps)
        return cls(np.load(path), fps)


# File extensions routed to VideoFileSource by the CLI front doors
# (anything else on --input is treated as raw frames / a device node).
VIDEO_FILE_EXTENSIONS = (".mp4", ".m4v", ".mov", ".avi", ".mkv", ".webm",
                         ".mpg", ".mpeg", ".wmv", ".flv")


class VideoFileSource:
    """Decode an encoded video file (mp4/avi/mkv/...) into RGB frames.

    The host-side equivalent of the AVCaptureSession frame feed for
    pre-recorded clips (VisionEngine.swift:55-75 feeds live capture; the
    capability is "sonify video", so encoded files must ingest too).

    Two decode backends, picked by ``backend``:

    * ``"cv2"`` — OpenCV ``VideoCapture`` (bundles FFmpeg codecs; no
      external binary needed).  Frames are yielded as stored — no
      resampling; ``fps`` is taken from the container unless overridden.
    * ``"ffmpeg"`` — an ``ffmpeg`` subprocess decoding rawvideo rgb24 on
      a pipe, resampled to ``fps`` via ``-r``.
    * ``"auto"`` (default) — cv2 if importable, else ffmpeg, else a
      clear error naming both options.

    Frames are uint8 RGB by default — the device step normalizes
    on-chip and uint8 takes the exact int8 pooling path while shipping
    4x fewer bytes (same rationale as ArraySource); ``as_float=True``
    yields f32 in [0,1] instead.
    """

    def __init__(self, path: str, width: Optional[int] = None,
                 height: Optional[int] = None, fps: Optional[float] = None,
                 backend: str = "auto", as_float: bool = False):
        if backend not in ("auto", "cv2", "ffmpeg"):
            raise ValueError(f"unknown backend {backend!r}")
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self.path = path
        self.as_float = as_float
        self._cv2 = None
        if backend in ("auto", "cv2"):
            try:
                import cv2
                self._cv2 = cv2
            except ImportError:
                if backend == "cv2":
                    raise RuntimeError(
                        "backend='cv2' requires the opencv-python package")
        if self._cv2 is None and shutil.which("ffmpeg") is None:
            raise RuntimeError(
                "VideoFileSource needs a decode backend: neither the cv2 "
                "module nor an ffmpeg binary on PATH is available. Use "
                "ArraySource (.npy/.npz tensors), RawVideoSource (raw "
                "rgb24/yuv), or the synthetic generators instead.")
        self.backend = "cv2" if self._cv2 is not None else "ffmpeg"
        self._num_frames: Optional[int] = None
        probed_fps: Optional[float] = None
        if self.backend == "cv2":
            cap = self._cv2.VideoCapture(path)
            if not cap.isOpened():
                cap.release()
                raise RuntimeError(
                    f"cv2 could not open {path!r} (unsupported container "
                    "or codec); try backend='ffmpeg' or a raw source")
            if width is None or height is None:
                width = int(cap.get(self._cv2.CAP_PROP_FRAME_WIDTH))
                height = int(cap.get(self._cv2.CAP_PROP_FRAME_HEIGHT))
            probed_fps = float(cap.get(self._cv2.CAP_PROP_FPS)) or None
            n = int(cap.get(self._cv2.CAP_PROP_FRAME_COUNT))
            self._num_frames = n if n > 0 else None
            cap.release()
        elif width is None or height is None:
            width, height = self._probe_dims()
        self.fps = float(fps if fps is not None else (probed_fps or 30.0))
        self._resample = fps is not None      # ffmpeg -r only when asked
        if not width or not height:
            raise RuntimeError(f"could not determine frame size of {path!r}")
        self._w, self._h = int(width), int(height)

    def _probe_dims(self) -> Tuple[int, int]:
        probe = shutil.which("ffprobe")
        if probe is None:
            raise RuntimeError("ffprobe not found; pass width/height")
        out = subprocess.check_output([
            probe, "-v", "error", "-select_streams", "v:0",
            "-show_entries", "stream=width,height", "-of", "csv=p=0",
            self.path]).decode().strip().split(",")
        return int(out[0]), int(out[1])

    @property
    def shape(self) -> Tuple[int, int]:
        return self._h, self._w

    @property
    def num_frames(self) -> Optional[int]:
        """Container frame count when the backend can probe it, else None."""
        return self._num_frames

    def _finish(self, rgb_u8: np.ndarray) -> np.ndarray:
        if self.as_float:
            return rgb_u8.astype(np.float32) / 255.0
        return rgb_u8

    def frames(self) -> Iterator[np.ndarray]:
        if self.backend == "cv2":
            cap = self._cv2.VideoCapture(self.path)
            try:
                while True:
                    ok, bgr = cap.read()
                    if not ok:
                        break
                    # cv2 decodes BGR; the pipeline is RGB throughout.
                    yield self._finish(
                        np.ascontiguousarray(bgr[..., ::-1]))
            finally:
                cap.release()
            return
        cmd = ["ffmpeg", "-v", "error", "-i", self.path,
               "-f", "rawvideo", "-pix_fmt", "rgb24"]
        if self._resample:
            cmd += ["-r", str(self.fps)]
        cmd += ["pipe:1"]
        frame_bytes = self._w * self._h * 3
        with subprocess.Popen(cmd, stdout=subprocess.PIPE) as proc:
            while True:
                buf = proc.stdout.read(frame_bytes)
                if len(buf) < frame_bytes:
                    break
                yield self._finish(np.frombuffer(buf, np.uint8).reshape(
                    self._h, self._w, 3))

    def tensor(self) -> np.ndarray:
        """Decode the whole clip to one [T, H, W, 3] tensor."""
        return np.stack(list(self.frames()))
