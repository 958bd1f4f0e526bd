"""Token2wav parity vs HF: DiT velocity eval, BigVGAN, and the full
RK4-sampled pipeline (matched noise)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.models.qwen2_5_omni.token2wav import (
    BigVGANConfig,
    DiTConfig,
    Qwen2_5OmniToken2WavModel,
)

MEL = 16


@pytest.fixture(scope="module")
def tiny_pair():
    import torch
    from transformers import Qwen2_5OmniToken2WavConfig
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniToken2WavModel as HFToken2Wav,
    )

    torch.manual_seed(0)
    cfg = Qwen2_5OmniToken2WavConfig()
    d = cfg.dit_config
    d.mel_dim = MEL
    d.num_embeds = 64
    d.emb_dim = 24
    d.hidden_size = 64
    d.num_hidden_layers = 3
    d.num_attention_heads = 2
    d.head_dim = 32
    d.ff_mult = 2
    d.block_size = 4
    d.repeats = 2
    d.look_ahead_layers = [1]
    d.look_backward_layers = [0, 2]
    d.enc_dim = 12
    d.enc_emb_dim = 20
    d.enc_channels = [16, 16, 16, 16, 48]
    d.enc_kernel_sizes = [5, 3, 3, 3, 1]
    d.enc_dilations = [1, 2, 3, 4, 1]
    d.enc_res2net_scale = 2
    d.enc_se_channels = 8
    d.enc_attention_channels = 8
    b = cfg.bigvgan_config
    b.mel_dim = MEL
    b.upsample_initial_channel = 32
    b.upsample_rates = [3, 2]
    b.upsample_kernel_sizes = [7, 4]
    b.resblock_kernel_sizes = [3, 5]
    b.resblock_dilation_sizes = [[1, 3, 5], [1, 3, 5]]

    hf = HFToken2Wav._from_config(cfg, attn_implementation="sdpa").eval().float()

    ours = Qwen2_5OmniToken2WavModel(
        {"dit_config": d.to_dict(), "bigvgan_config": b.to_dict()})
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = ours.load_from_state_dict(sd)
    return hf, ours, params


def test_dit_velocity_parity(tiny_pair):
    import torch

    hf, ours, params = tiny_pair
    rng = np.random.default_rng(0)
    N = 12  # codes
    T = N * 2
    code = rng.integers(1, 60, size=(1, N))
    noised = rng.normal(size=(1, T, MEL)).astype(np.float32)
    cond = rng.normal(size=(1, 20)).astype(np.float32)
    ref_mel = rng.normal(size=(1, 50, MEL)).astype(np.float32)
    t = np.array([0.4], np.float32)

    with torch.no_grad():
        code_embed = hf.code2wav_dit_model.text_embed(
            torch.from_numpy(code), drop_code=False)
        spk = torch.from_numpy(cond)[:, None, :].repeat(1, T, 1)
        ref = hf.code2wav_dit_model(
            hidden_states=torch.from_numpy(noised),
            condition_vector=torch.from_numpy(ref_mel),
            speaker_embedding=spk,
            quantized_code=torch.from_numpy(code),
            time_step=torch.from_numpy(t),
            apply_cfg=False,
        ).numpy()

    emb = np.asarray(params["dit"]["codec_embed"])
    code_embed_j = jnp.repeat(jnp.asarray(emb[code[0]][None]), 2, axis=1)
    spk_j = jnp.broadcast_to(jnp.asarray(cond)[:, None, :], (1, T, 20))
    got = np.asarray(ours.dit.forward(
        params["dit"], jnp.asarray(noised), spk_j, jnp.asarray(ref_mel),
        code_embed_j, jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_bigvgan_parity(tiny_pair):
    import torch

    hf, ours, params = tiny_pair
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(1, MEL, 40)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf.code2wav_bigvgan_model(torch.from_numpy(mel)).numpy()
    got = np.asarray(ours.bigvgan.forward(params["bigvgan"], jnp.asarray(mel)))
    assert got.shape == ref.reshape(-1).shape
    np.testing.assert_allclose(got, ref.reshape(-1), atol=3e-4, rtol=3e-3)


def test_full_pipeline_parity(tiny_pair, monkeypatch):
    import torch

    hf, ours, params = tiny_pair
    rng = np.random.default_rng(2)
    N = 8
    T = N * 2
    code = rng.integers(1, 60, size=(1, N))
    cond = rng.normal(size=(1, 20)).astype(np.float32)
    ref_mel = rng.normal(size=(1, 30, MEL)).astype(np.float32)
    noise = rng.normal(size=(1, 30000, MEL)).astype(np.float32)

    real_randn = torch.randn

    def fake_randn(*shape, **kw):
        if shape and shape[0] == [1, 30000, MEL] or (
                isinstance(shape[0], list)):
            return torch.from_numpy(noise)
        return real_randn(*shape, **kw)

    monkeypatch.setattr(torch, "randn", fake_randn)
    with torch.no_grad():
        ref = hf(
            torch.from_numpy(code), torch.from_numpy(cond),
            torch.from_numpy(ref_mel), num_steps=4, guidance_scale=0.5,
        ).numpy()
    monkeypatch.undo()

    got = np.asarray(ours.forward(
        params, jnp.asarray(code), jnp.asarray(cond), jnp.asarray(ref_mel),
        num_steps=4, guidance_scale=0.5,
        noise=jnp.asarray(noise[:, :T]),
    ))
    assert got.shape == ref.reshape(-1).shape
    np.testing.assert_allclose(got, ref.reshape(-1), atol=2e-3, rtol=2e-2)
