"""Mel spectrogram numeric parity vs HF WhisperFeatureExtractor."""

import numpy as np
import pytest

from vllm_omni_tpu.multimodal.audio import (
    audio_output_lengths,
    log_mel_spectrogram,
    mel_filter_bank,
)


def test_mel_filter_bank_shape_and_norm():
    fb = mel_filter_bank(128)
    assert fb.shape == (128, 201)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=128)
    rng = np.random.default_rng(0)
    audio = (rng.uniform(-1, 1, 16000) * 0.5).astype(np.float32)  # 1s
    ref = fe(
        audio, sampling_rate=16000, return_tensors="np",
        padding=False,
    )["input_features"][0]  # [128, T]
    ours = np.asarray(log_mel_spectrogram(audio))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_output_length_formula():
    # 100 mel frames -> 50 after cnn -> 25 tokens
    assert audio_output_lengths(100) == 25
    assert audio_output_lengths(99) == 25 or audio_output_lengths(99) == 24
