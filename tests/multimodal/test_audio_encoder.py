"""Audio encoder numeric parity vs HF Qwen2_5OmniAudioEncoder."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.models.audio_encoder import AudioEncoder, AudioEncoderConfig


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniAudioEncoderConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniAudioEncoder,
    )

    torch.manual_seed(0)
    hf_cfg = Qwen2_5OmniAudioEncoderConfig(
        num_mel_bins=32, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=128,
        n_window=25, output_dim=48, max_source_positions=300,
        attn_implementation="sdpa",
    )
    hf = Qwen2_5OmniAudioEncoder(hf_cfg).eval()
    ours = AudioEncoder(AudioEncoderConfig(
        num_mel_bins=32, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=128,
        n_window=25, output_dim=48, max_source_positions=300,
    ))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = ours.load_from_state_dict(sd)
    return hf, ours, params


@pytest.mark.parametrize("T", [50, 73, 100, 130])
def test_audio_encoder_matches_hf(hf_pair, T):
    import torch

    hf, ours, params = hf_pair
    rng = np.random.default_rng(T)
    mel = rng.normal(size=(32, T)).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            input_features=torch.from_numpy(mel),
            feature_lens=torch.tensor([T]),
            aftercnn_lens=torch.tensor([(T - 1) // 2 + 1]),
        ).last_hidden_state.numpy()
    got = np.asarray(ours.forward(params, jnp.asarray(mel)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)
