"""Flux-family (Ovis-Image / LongCat-Image) structural tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
from vllm_omni_tpu.diffusion import scheduling
from vllm_omni_tpu.diffusion.models.common.autoencoder_kl import (
    AutoencoderKLConfig,
)
from vllm_omni_tpu.diffusion.models.common.flux_like import (
    FluxLikeConfig,
    FluxLikeTransformer2DModel,
    flux_image_ids,
    pack_latents,
    unpack_latents,
)
from vllm_omni_tpu.diffusion.models.longcat_image import LongCatImagePipeline
from vllm_omni_tpu.diffusion.models.ovis_image import OvisImagePipeline
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

TF_KW = dict(
    in_channels=16, out_channels=16, num_layers=2, num_single_layers=2,
    attention_head_dim=12, num_attention_heads=2, joint_attention_dim=20,
    axes_dims_rope=(4, 4, 4),
)
VAE_CFG = AutoencoderKLConfig(
    latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
    norm_num_groups=4, scaling_factor=0.36, shift_factor=0.11,
)


def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.key(0), (2, 4, 6, 8))
    packed = pack_latents(x)
    assert packed.shape == (2, 12, 16)
    back = unpack_latents(packed, 3, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("ffn", ["swiglu", "gelu"])
def test_transformer_shapes(ffn):
    cfg = FluxLikeConfig(ffn=ffn, context_norm=(ffn == "swiglu"), **TF_KW)
    model = FluxLikeTransformer2DModel(cfg, jnp.float32)
    params = model.init_params(jax.random.key(0))
    B, N = 2, 12
    lat = jax.random.normal(jax.random.key(1), (B, N, 16))
    txt = jax.random.normal(jax.random.key(2), (B, 5, 20))
    out = model.forward(params, lat, txt, jnp.asarray([0.5, 0.1]),
                        flux_image_ids(3, 4))
    assert out.shape == (B, N, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_timestep_conditions(ffn="swiglu"):
    cfg = FluxLikeConfig(ffn=ffn, **TF_KW)
    model = FluxLikeTransformer2DModel(cfg, jnp.float32)
    params = model.init_params(jax.random.key(0))
    lat = jax.random.normal(jax.random.key(1), (1, 12, 16))
    txt = jax.random.normal(jax.random.key(2), (1, 3, 20))
    ids = flux_image_ids(3, 4)
    o1 = model.forward(params, lat, txt, jnp.asarray([0.9]), ids)
    o2 = model.forward(params, lat, txt, jnp.asarray([0.1]), ids)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


@pytest.mark.parametrize("pipe_cls", [OvisImagePipeline,
                                      LongCatImagePipeline])
def test_pipeline_e2e(pipe_cls):
    od = OmniDiffusionConfig(
        model="", dtype=jnp.float32, default_height=16, default_width=16)
    tf_cfg = FluxLikeConfig(
        ffn=pipe_cls.ffn_kind, context_norm=pipe_cls.context_norm, **TF_KW)
    pipe = pipe_cls(od, transformer_config=tf_cfg, vae_config=VAE_CFG,
                    load_weights=False)
    rng = np.random.default_rng(0)
    req = OmniDiffusionRequest(
        request_id="f0", prompt="x",
        prompt_embeds=rng.normal(size=(1, 4, 20)).astype(np.float32),
        num_inference_steps=2, output_type="np", guidance_scale=1.0)
    img, metrics = pipe.forward(req)
    assert img.shape == (1, 3, 16, 16)
    assert metrics.num_steps == 2


def test_cfg_matches_manual():
    od = OmniDiffusionConfig(
        model="", dtype=jnp.float32, default_height=16, default_width=16)
    tf_cfg = FluxLikeConfig(ffn="swiglu", context_norm=True, **TF_KW)
    pipe = OvisImagePipeline(od, transformer_config=tf_cfg,
                             vae_config=VAE_CFG, load_weights=False)
    rng = np.random.default_rng(1)
    embeds = rng.normal(size=(1, 4, 20)).astype(np.float32)
    neg = rng.normal(size=(1, 4, 20)).astype(np.float32)
    req = OmniDiffusionRequest(
        request_id="f1", prompt="x", prompt_embeds=embeds,
        negative_prompt_embeds=neg, num_inference_steps=1,
        output_type="latent", guidance_scale=4.0, seed=3)
    lat, _ = pipe.forward(req)

    noise = jax.random.normal(jax.random.key(3), (1, 4, 8, 8), jnp.float32)
    latents = pack_latents(noise)
    mu = scheduling.calculate_shift(16)
    sched = scheduling.set_timesteps(1, mu=mu)
    t = jnp.full((1,), sched.timesteps[0] / 1000.0, jnp.float32)
    # the pipeline's per-arch position-id scheme (Ovis text ids [0, i, i],
    # reference pipeline_ovis_image.py:290-293)
    ids = OvisImagePipeline.image_ids(4, 4, 4)
    tids = OvisImagePipeline.text_ids(4)
    tp = pipe.params["transformer"]
    pos = pipe.transformer.forward(
        tp, latents, jnp.asarray(embeds), t, ids, tids)
    negp = pipe.transformer.forward(
        tp, latents, jnp.asarray(neg), t, ids, tids)
    vel = negp + 4.0 * (pos - negp)
    ref = scheduling.step(latents, vel, sched.sigmas[0], sched.sigmas[1])
    np.testing.assert_allclose(np.asarray(lat), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_loader_mapping(tmp_path):
    import torch
    from safetensors.torch import save_file

    cfg = FluxLikeConfig(ffn="swiglu", context_norm=True, **TF_KW)
    dim = cfg.inner_dim
    hd = cfg.attention_head_dim
    mlp = int(dim * cfg.mlp_ratio)
    g = torch.Generator().manual_seed(0)

    def W(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "x_embedder.weight": W(dim, cfg.in_channels),
        "x_embedder.bias": W(dim),
        "context_embedder.weight": W(dim, cfg.joint_attention_dim),
        "context_embedder.bias": W(dim),
        "context_embedder_norm.weight": W(cfg.joint_attention_dim),
        "timestep_embedder.linear_1.weight": W(dim, 256),
        "timestep_embedder.linear_1.bias": W(dim),
        "timestep_embedder.linear_2.weight": W(dim, dim),
        "timestep_embedder.linear_2.bias": W(dim),
        "norm_out.linear.weight": W(2 * dim, dim),
        "norm_out.linear.bias": W(2 * dim),
        "proj_out.weight": W(cfg.out_channels, dim),
        "proj_out.bias": W(cfg.out_channels),
    }
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        sd[f"{pre}.norm1.linear.weight"] = W(6 * dim, dim)
        sd[f"{pre}.norm1.linear.bias"] = W(6 * dim)
        sd[f"{pre}.norm1_context.linear.weight"] = W(6 * dim, dim)
        sd[f"{pre}.norm1_context.linear.bias"] = W(6 * dim)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj", "to_out.0", "to_add_out"):
            sd[f"{pre}.attn.{n}.weight"] = W(dim, dim)
            sd[f"{pre}.attn.{n}.bias"] = W(dim)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{pre}.attn.{n}.weight"] = W(hd)
        for ff in ("ff", "ff_context"):
            sd[f"{pre}.{ff}.net.0.proj.weight"] = W(2 * mlp, dim)
            sd[f"{pre}.{ff}.net.0.proj.bias"] = W(2 * mlp)
            sd[f"{pre}.{ff}.net.2.weight"] = W(dim, mlp)
            sd[f"{pre}.{ff}.net.2.bias"] = W(dim)
    for i in range(cfg.num_single_layers):
        pre = f"single_transformer_blocks.{i}"
        sd[f"{pre}.norm.linear.weight"] = W(3 * dim, dim)
        sd[f"{pre}.norm.linear.bias"] = W(3 * dim)
        sd[f"{pre}.proj_mlp.weight"] = W(2 * mlp, dim)
        sd[f"{pre}.proj_mlp.bias"] = W(2 * mlp)
        sd[f"{pre}.proj_out.weight"] = W(dim, dim + mlp)
        sd[f"{pre}.proj_out.bias"] = W(dim)
        for n in ("to_q", "to_k", "to_v"):
            sd[f"{pre}.attn.{n}.weight"] = W(dim, dim)
            sd[f"{pre}.attn.{n}.bias"] = W(dim)
        sd[f"{pre}.attn.norm_q.weight"] = W(hd)
        sd[f"{pre}.attn.norm_k.weight"] = W(hd)

    model = FluxLikeTransformer2DModel(cfg, jnp.float32)
    params = model.load_from_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    lat = jax.random.normal(jax.random.key(5), (1, 12, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(6),
                            (1, 3, cfg.joint_attention_dim))
    out = model.forward(params, lat, txt, jnp.asarray([0.4]),
                        flux_image_ids(3, 4))
    assert out.shape == (1, 12, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()
