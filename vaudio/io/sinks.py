"""PCM sinks: WAV file writing/reading via the stdlib (no audio deps)."""

from __future__ import annotations

import wave

import numpy as np


def write_wav(path: str, audio: np.ndarray, sample_rate: float = 44100.0,
              channels: int = 1) -> None:
    """Write float32 PCM in [-1, 1] to a 16-bit WAV file.

    The file-output equivalent of the reference's AVAudioSourceNode speaker
    path (SoundEngine.swift:156-228) for offline rendering.
    """
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[:, None]
    if audio.shape[1] != channels:
        if channels == 2 and audio.shape[1] == 1:
            audio = np.repeat(audio, 2, axis=1)
        else:
            raise ValueError(
                f"audio has {audio.shape[1]} channels, expected {channels}")
    pcm16 = np.clip(audio, -1.0, 1.0)
    pcm16 = (pcm16 * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(int(round(sample_rate)))
        w.writeframes(pcm16.tobytes())


def read_wav(path: str):
    """Read a 16-bit WAV back to (float32 array [-1,1], sample_rate)."""
    with wave.open(path, "rb") as w:
        n = w.getnframes()
        data = np.frombuffer(w.readframes(n), dtype="<i2")
        audio = data.astype(np.float32) / 32767.0
        ch = w.getnchannels()
        if ch > 1:
            audio = audio.reshape(-1, ch)
        return audio, float(w.getframerate())
