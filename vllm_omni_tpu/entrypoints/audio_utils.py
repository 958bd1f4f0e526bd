"""Waveform -> WAV/PCM bytes + base64.

Parity: AudioMixin (reference entrypoints/openai/audio_utils_mixin.py:
21-76) without the soundfile dependency — stdlib `wave` + numpy.
"""

from __future__ import annotations

import base64
import io
import wave

import numpy as np


def waveform_to_wav_bytes(
    waveform, sample_rate: int = 24000, speed: float = 1.0
) -> bytes:
    """float waveform in [-1, 1] -> 16-bit PCM WAV bytes. `speed` resamples
    by simple linear interpolation (parity with the reference's speed
    adjustment)."""
    arr = np.asarray(waveform, np.float32).reshape(-1)
    if speed != 1.0 and arr.size:
        n_out = max(1, int(round(arr.size / speed)))
        arr = np.interp(
            np.linspace(0, arr.size - 1, n_out), np.arange(arr.size), arr
        ).astype(np.float32)
    pcm = np.clip(arr, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def waveform_to_pcm_bytes(waveform) -> bytes:
    arr = np.clip(np.asarray(waveform, np.float32).reshape(-1), -1.0, 1.0)
    return (arr * 32767.0).astype("<i2").tobytes()


def waveform_to_base64_wav(waveform, sample_rate: int = 24000) -> str:
    return base64.b64encode(
        waveform_to_wav_bytes(waveform, sample_rate)
    ).decode("ascii")
