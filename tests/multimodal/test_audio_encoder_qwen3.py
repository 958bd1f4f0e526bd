"""Qwen3-Omni audio tower parity vs HF Qwen3OmniMoeAudioEncoder."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.models.audio_encoder_qwen3 import (
    Qwen3AudioEncoder,
    Qwen3AudioEncoderConfig,
    qwen3_audio_output_length,
)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoderConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoder,
    )

    torch.manual_seed(0)
    # NOTE: HF's _get_feat_extract_output_lengths hardcodes 100-frame
    # blocks, which is only self-consistent when n_window*2 == 100;
    # other n_window values crash or mis-mask in HF itself.
    kwargs = dict(
        num_mel_bins=32, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=96,
        n_window=50, n_window_infer=200, conv_chunksize=500,
        downsample_hidden_size=16, output_dim=48, max_source_positions=300,
    )
    hf = Qwen3OmniMoeAudioEncoder(
        Qwen3OmniMoeAudioEncoderConfig(**kwargs, attn_implementation="sdpa")
    ).eval()
    ours = Qwen3AudioEncoder(Qwen3AudioEncoderConfig(**kwargs))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = ours.load_from_state_dict(sd)
    return hf, ours, params


@pytest.mark.parametrize("T", [50, 100, 137, 230])
def test_qwen3_audio_encoder_matches_hf(hf_pair, T):
    import torch

    hf, ours, params = hf_pair
    rng = np.random.default_rng(T)
    mel = rng.normal(size=(32, T)).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            input_features=torch.from_numpy(mel),
            feature_lens=torch.tensor([T]),
        ).last_hidden_state.numpy()
    got = np.asarray(ours.forward(params, jnp.asarray(mel)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
