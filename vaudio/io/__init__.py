"""Host-side I/O: frame sources and PCM sinks (ref L6 + AVFoundation edges).

Sources mirror the reference's inputs:

* :func:`solid_color_frames` — the synthetic solid-color generator
  (Utilities/CreateColorBuffer.swift:16-65 + Tutorial/TutorialStart.swift),
  the reference's embryonic "fake backend" used for known-hue -> known-f0
  testing.
* :func:`hsb_frames` — HSB-parameterized variant matching the tutorial
  screen's sliders.
* :class:`ArraySource` / :class:`VideoFileSource` — decoded tensors and
  (ffmpeg-gated) video files standing in for the AVCaptureSession path.
* :class:`RawVideoSource` — uncompressed frames from a file, FIFO or
  capture-device node (rgb24/i420/nv12): the codec-free live-camera path
  (CameraModel.swift:12-37).
* :func:`bgra_to_rgb` — the camera pixel-format conversion
  (kCVPixelFormatType_32BGRA, VisionEngine.swift:62-64).

Sinks:

* :func:`write_wav` — stdlib WAV writer (float32 -> PCM16).
* :class:`SubprocessPlayer` — actual speaker playback via a CLI player
  subprocess (the AVAudioSourceNode output, SoundEngine.swift:156-228).
* The real-time pull sink lives in vaudio.runtime.stream (ring buffer).
"""

from vaudio.io.sources import (
    VIDEO_FILE_EXTENSIONS,
    ArraySource,
    CameraSource,
    Cv2CameraSource,
    NativeFrameReader,
    RawVideoSource,
    VideoFileSource,
    Yuv420FileSource,
    bgra_to_rgb,
    hsb_frames,
    hsb_to_rgb,
    parse_yuv420,
    solid_color_frames,
    yuv420_to_rgb,
)
from vaudio.io.push import PushSource
from vaudio.io.sinks import SubprocessPlayer, read_wav, write_wav

__all__ = [
    "VIDEO_FILE_EXTENSIONS",
    "ArraySource",
    "CameraSource",
    "Cv2CameraSource",
    "NativeFrameReader",
    "RawVideoSource",
    "VideoFileSource",
    "Yuv420FileSource",
    "parse_yuv420",
    "yuv420_to_rgb",
    "bgra_to_rgb",
    "hsb_frames",
    "hsb_to_rgb",
    "solid_color_frames",
    "read_wav",
    "write_wav",
    "PushSource",
    "SubprocessPlayer",
]
