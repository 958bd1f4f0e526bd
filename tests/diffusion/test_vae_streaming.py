"""Streamed temporal VAE decode (round 3): chunked decode with carried
causal-conv state must match single-shot decode exactly — the decoder is
causal in time, so streaming is not an approximation (reference parity:
autoencoder_kl_qwenimage.py feat_cache chunked `_decode`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
    AutoencoderKLQwenImage,
    QwenImageVAEConfig,
)

# two temporal-upsample stages like the real Wan/QwenImage VAE
VAE_CFG = QwenImageVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=1,
    temperal_downsample=(False, True, True))


@pytest.fixture(scope="module")
def vae_and_params():
    vae = AutoencoderKLQwenImage(VAE_CFG, jnp.float32)
    return vae, vae.init_params(jax.random.key(0))


@pytest.mark.parametrize("T,chunk", [(5, 1), (5, 2), (6, 3), (2, 1)])
def test_streamed_decode_matches_single_shot(vae_and_params, T, chunk):
    vae, params = vae_and_params
    z = jnp.asarray(
        np.random.default_rng(T).normal(size=(1, 4, T, 6, 6)), jnp.float32)
    full = np.asarray(vae.decode(params, z))
    streamed = np.asarray(vae.decode_streamed(params, z, chunk_frames=chunk))
    assert streamed.shape == full.shape
    # temporal expansion: frame 0 un-doubled, 4x for the rest
    assert full.shape[2] == (T - 1) * 4 + 1
    np.testing.assert_allclose(streamed, full, atol=1e-5, rtol=1e-5)


def test_streamed_decode_single_frame_passthrough(vae_and_params):
    vae, params = vae_and_params
    z = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 1, 6, 6)), jnp.float32)
    full = np.asarray(vae.decode(params, z))
    streamed = np.asarray(vae.decode_streamed(params, z, chunk_frames=4))
    np.testing.assert_array_equal(streamed, full)


def test_wan_phase_offload_matches_resident():
    """dit_phase_offload (host-pinned DiT device_put once per request,
    dropped before VAE decode) must not change the output."""
    from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
    from vllm_omni_tpu.diffusion.models.wan2_2.pipeline import WanPipeline
    from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
        WanTransformerConfig,
    )
    from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

    tf = WanTransformerConfig(
        num_attention_heads=2, attention_head_dim=32, num_layers=2,
        ffn_dim=64, text_dim=32, in_channels=4, out_channels=4)
    rng = np.random.default_rng(0)
    kw = dict(request_id="v", prompt="t",
              prompt_embeds=rng.normal(size=(1, 8, 32)).astype(np.float32),
              height=32, width=32, num_frames=5, num_inference_steps=2,
              seed=0, guidance_scale=1.0)
    outs = []
    for phase in (False, True):
        pipe = WanPipeline(
            OmniDiffusionConfig(model="tiny", dtype="float32",
                                dit_phase_offload=phase),
            transformer_config=tf, vae_config=VAE_CFG, load_weights=False)
        if phase:
            assert isinstance(
                jax.tree.leaves(pipe.params["transformer"])[0], np.ndarray)
        video, _ = pipe.forward(OmniDiffusionRequest(**kw))
        outs.append(np.asarray(video))
    np.testing.assert_allclose(outs[1], outs[0], atol=1e-6)


def test_wan_pipeline_uses_streamed_decode(monkeypatch):
    from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
    from vllm_omni_tpu.diffusion.models.wan2_2.pipeline import WanPipeline
    from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
        WanTransformerConfig,
    )
    from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

    tf = WanTransformerConfig(
        num_attention_heads=2, attention_head_dim=32, num_layers=2,
        ffn_dim=64, text_dim=32, in_channels=4, out_channels=4)
    pipe = WanPipeline(
        OmniDiffusionConfig(model="tiny", dtype="float32"),
        transformer_config=tf, vae_config=VAE_CFG, load_weights=False)
    calls = {"streamed": 0}
    orig = pipe.vae.decode_streamed

    def spy(params, z, chunk_frames=1):
        calls["streamed"] += 1
        return orig(params, z, chunk_frames=chunk_frames)

    monkeypatch.setattr(pipe.vae, "decode_streamed", spy)
    rng = np.random.default_rng(0)
    req = OmniDiffusionRequest(
        request_id="v", prompt="t",
        prompt_embeds=rng.normal(size=(1, 8, 32)).astype(np.float32),
        height=32, width=32, num_frames=9, num_inference_steps=2,
        seed=0, guidance_scale=1.0)
    video, _ = pipe.forward(req)
    assert calls["streamed"] == 1
    assert video.shape[2] == 9
    assert np.isfinite(np.asarray(video)).all()
