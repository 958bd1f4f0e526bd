"""Qwen3-Omni code2wav parity vs HF (full + chunked decode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.models.qwen3_omni.code2wav import Qwen3OmniMoeCode2Wav


@pytest.fixture(scope="module")
def tiny_pair():
    import torch
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeCode2WavConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeCode2Wav as HFC2W,
    )

    torch.manual_seed(0)
    kwargs = dict(
        codebook_size=32, num_quantizers=4, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        intermediate_size=64, sliding_window=8,
        max_position_embeddings=512, decoder_dim=32,
        upsample_rates=[3, 2], upsampling_ratios=[2],
        layer_scale_initial_scale=0.01,
    )
    hf = HFC2W._from_config(
        Qwen3OmniMoeCode2WavConfig(**kwargs), attn_implementation="sdpa"
    ).eval()
    ours = Qwen3OmniMoeCode2Wav(dict(kwargs))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = ours.load_from_state_dict(sd)
    return hf, ours, params


def test_code2wav_matches_hf(tiny_pair):
    import torch

    hf, ours, params = tiny_pair
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 32, size=(1, 4, 20))
    with torch.no_grad():
        ref = hf(torch.from_numpy(codes)).numpy().reshape(-1)
    got = np.asarray(ours.forward(params, jnp.asarray(codes)))
    assert got.shape == ref.shape  # 20 * 3*2*2 = 240 samples
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_chunked_decode_matches_hf(tiny_pair):
    import torch

    hf, ours, params = tiny_pair
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 32, size=(1, 4, 23))
    with torch.no_grad():
        ref = hf.chunked_decode(
            torch.from_numpy(codes), chunk_size=8, left_context_size=3
        ).numpy().reshape(-1)
    got = np.asarray(ours.chunked_decode(
        params, jnp.asarray(codes), chunk_size=8, left_context=3))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)
