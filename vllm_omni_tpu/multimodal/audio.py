"""Audio preprocessing: whisper-compatible log-mel spectrogram in JAX.

TPU-native replacement for the librosa/WhisperFeatureExtractor path the
reference uses for audio input (reference chat_utils.py:42-127 pulls audio
via librosa; feature extraction happens in the HF processor). Running the
mel on-device keeps the preprocessing hot loop in XLA (BASELINE.json north
star: "fuse the multimodal preprocessing hot loops ... into XLA").

Semantics: n_fft 400, hop 160, periodic Hann, centered reflect padding,
slaney-scale mel filterbank (librosa default), log10 clamp, max-8 floor,
(x+4)/4 scaling — numerically matched against WhisperFeatureExtractor in
tests/multimodal/test_audio.py.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 128


@functools.lru_cache(maxsize=8)
def mel_filter_bank(
    n_mels: int = N_MELS,
    n_fft: int = N_FFT,
    sample_rate: int = SAMPLE_RATE,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-scale triangular mel filters [n_mels, n_fft//2 + 1]
    (librosa.filters.mel(htk=False, norm='slaney') equivalent)."""
    fmax = fmax or sample_rate / 2

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f * 3.0 / 200.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz * 3.0 / 200.0
        logstep = math.log(6.4) / 27.0
        return np.where(
            f >= min_log_hz,
            min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
            mel,
        )

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * 200.0 / 3.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz * 3.0 / 200.0
        logstep = math.log(6.4) / 27.0
        return np.where(
            m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f
        )

    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram(
    audio: jax.Array,  # [n_samples] f32 at 16 kHz
    n_mels: int = N_MELS,
) -> jax.Array:
    """[n_mels, n_frames] log-mel, whisper conventions (last frame dropped)."""
    window = jnp.hanning(N_FFT + 1)[:-1]  # periodic hann
    pad = N_FFT // 2
    x = jnp.pad(audio.astype(jnp.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - N_FFT) // HOP_LENGTH
    idx = (
        jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    )
    frames = x[idx] * window[None, :]
    spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)
    power = jnp.abs(spec) ** 2  # [n_frames, n_freq]
    power = power[:-1]  # whisper drops the final frame
    mel_f = jnp.asarray(mel_filter_bank(n_mels))
    mel = power @ mel_f.T  # [n_frames, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T  # [n_mels, n_frames]


def audio_num_frames(n_samples: int) -> int:
    return n_samples // HOP_LENGTH


def audio_output_lengths(n_mel_frames: int) -> int:
    """Mel frames -> encoder output tokens: conv stride 2 then avg-pool 2.

    Parity: HF _get_feat_extract_output_lengths ((L - 1) // 2 + 1, then
    pooled by 2)."""
    after_cnn = (n_mel_frames - 1) // 2 + 1
    return (after_cnn - 2) // 2 + 1
