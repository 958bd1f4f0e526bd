"""Z-Image DiT + pipeline structural tests.

Pins: unified [image, caption] sequence with pad tokens + (0,0,0) pad
positions, reversed timesteps, negated velocity, pos+g(pos-neg) CFG with
norm cap and truncation, loader mapping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
from vllm_omni_tpu.diffusion import scheduling
from vllm_omni_tpu.diffusion.models.common.autoencoder_kl import (
    AutoencoderKLConfig,
)
from vllm_omni_tpu.diffusion.models.z_image.pipeline import ZImagePipeline
from vllm_omni_tpu.diffusion.models.z_image.transformer import (
    ZImageTransformer2DModel,
    ZImageTransformerConfig,
)
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

TF_CFG = ZImageTransformerConfig(
    patch_size=2, in_channels=4, dim=48, n_layers=2, n_refiner_layers=1,
    n_heads=4, cap_feat_dim=24, axes_dims=(4, 4, 4),
    axes_lens=(256, 64, 64),
)
VAE_CFG = AutoencoderKLConfig(
    latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
    norm_num_groups=4, scaling_factor=0.36, shift_factor=0.11,
)


@pytest.fixture(scope="module")
def tf_pair():
    model = ZImageTransformer2DModel(TF_CFG, jnp.float32)
    return model, model.init_params(jax.random.key(0))


def test_forward_shapes(tf_pair):
    model, params = tf_pair
    lat = jax.random.normal(jax.random.key(1), (2, 4, 8, 12))
    cap = jax.random.normal(jax.random.key(2), (2, 7, 24))
    out = model.forward(params, lat, jnp.asarray([0.5, 0.9]), cap, 7)
    assert out.shape == (2, 4, 8, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_timestep_and_caption_condition(tf_pair):
    model, params = tf_pair
    lat = jax.random.normal(jax.random.key(1), (1, 4, 8, 8))
    cap = jax.random.normal(jax.random.key(2), (1, 5, 24))
    o1 = model.forward(params, lat, jnp.asarray([0.1]), cap, 5)
    o2 = model.forward(params, lat, jnp.asarray([0.9]), cap, 5)
    # NB: cap_embedder RMS-normalizes, so a pure scale would be erased
    o3 = model.forward(params, lat, jnp.asarray([0.1]),
                       cap + jnp.arange(24, dtype=cap.dtype) * 0.1, 5)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-6


def _pipeline(**kw):
    od = OmniDiffusionConfig(
        model="", dtype=jnp.float32, default_height=16, default_width=16)
    return ZImagePipeline(od, transformer_config=TF_CFG,
                          vae_config=VAE_CFG, load_weights=False, **kw)


def test_pipeline_e2e():
    pipe = _pipeline()
    rng = np.random.default_rng(0)
    req = OmniDiffusionRequest(
        request_id="z0", prompt="x",
        prompt_embeds=rng.normal(size=(1, 5, 24)).astype(np.float32),
        num_inference_steps=2, output_type="np", guidance_scale=1.0)
    img, metrics = pipe.forward(req)
    assert img.shape == (1, 3, 16, 16)
    assert metrics.num_steps == 2


def test_cfg_and_negated_velocity_match_manual():
    pipe = _pipeline()
    rng = np.random.default_rng(1)
    embeds = rng.normal(size=(1, 4, 24)).astype(np.float32)
    neg = rng.normal(size=(1, 4, 24)).astype(np.float32)
    req = OmniDiffusionRequest(
        request_id="z1", prompt="x", prompt_embeds=embeds,
        negative_prompt_embeds=neg, num_inference_steps=1,
        output_type="latent", guidance_scale=3.0, seed=5)
    lat, _ = pipe.forward(req)

    latents = jax.random.normal(jax.random.key(5), (1, 4, 8, 8),
                                jnp.float32)
    image_seq_len = 4 * 4
    mu = scheduling.calculate_shift(image_seq_len)
    sched = scheduling.set_timesteps(1, mu=mu)
    t = float(sched.timesteps[0])
    tn = jnp.asarray([(1000.0 - t) / 1000.0], jnp.float32)
    tp = pipe.params["transformer"]
    pos = pipe.transformer.forward(tp, latents, tn, jnp.asarray(embeds), 4)
    negp = pipe.transformer.forward(tp, latents, tn, jnp.asarray(neg), 4)
    pred = pos + 3.0 * (pos - negp)
    ref = scheduling.step(latents, -pred, sched.sigmas[0], sched.sigmas[1])
    np.testing.assert_allclose(np.asarray(lat), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_cfg_truncation_disables_guidance():
    pipe_t = _pipeline(cfg_truncation=0.0)  # always truncated
    pipe_n = _pipeline()
    rng = np.random.default_rng(2)
    embeds = rng.normal(size=(1, 4, 24)).astype(np.float32)
    neg = rng.normal(size=(1, 4, 24)).astype(np.float32)

    def run(pipe):
        req = OmniDiffusionRequest(
            request_id="z2", prompt="x", prompt_embeds=embeds,
            negative_prompt_embeds=neg, num_inference_steps=2,
            output_type="latent", guidance_scale=3.0, seed=5)
        lat, _ = pipe.forward(req)
        return np.asarray(lat)

    with_cfg = run(pipe_n)
    truncated = run(pipe_t)
    assert np.abs(with_cfg - truncated).max() > 1e-7


def test_loader_mapping(tmp_path):
    import torch
    from safetensors.torch import save_file

    c = TF_CFG
    dim = c.dim
    g = torch.Generator().manual_seed(0)

    def W(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    key = f"{c.patch_size}-{c.f_patch_size}"
    sd = {
        f"all_x_embedder.{key}.weight": W(dim, 4 * c.in_channels),
        f"all_x_embedder.{key}.bias": W(dim),
        f"all_final_layer.{key}.linear.weight": W(4 * c.in_channels, dim),
        f"all_final_layer.{key}.linear.bias": W(4 * c.in_channels),
        f"all_final_layer.{key}.adaLN_modulation.1.weight": W(dim, 48),
        f"all_final_layer.{key}.adaLN_modulation.1.bias": W(dim),
        "t_embedder.mlp.0.weight": W(1024, 256),
        "t_embedder.mlp.0.bias": W(1024),
        "t_embedder.mlp.2.weight": W(48, 1024),
        "t_embedder.mlp.2.bias": W(48),
        "cap_embedder.0.weight": W(c.cap_feat_dim),
        "cap_embedder.1.weight": W(dim, c.cap_feat_dim),
        "cap_embedder.1.bias": W(dim),
        "x_pad_token": W(1, dim),
        "cap_pad_token": W(1, dim),
    }

    def blk(prefix, n, modulation):
        for i in range(n):
            for nn in ("to_q", "to_k", "to_v", "to_out.0"):
                sd[f"{prefix}.{i}.attention.{nn}.weight"] = W(dim, dim)
            sd[f"{prefix}.{i}.attention.norm_q.weight"] = W(c.head_dim)
            sd[f"{prefix}.{i}.attention.norm_k.weight"] = W(c.head_dim)
            sd[f"{prefix}.{i}.feed_forward.w1.weight"] = W(c.ffn_dim, dim)
            sd[f"{prefix}.{i}.feed_forward.w3.weight"] = W(c.ffn_dim, dim)
            sd[f"{prefix}.{i}.feed_forward.w2.weight"] = W(dim, c.ffn_dim)
            for nn in ("attention_norm1", "attention_norm2", "ffn_norm1",
                       "ffn_norm2"):
                sd[f"{prefix}.{i}.{nn}.weight"] = W(dim)
            if modulation:
                sd[f"{prefix}.{i}.adaLN_modulation.0.weight"] = W(
                    4 * dim, 48)
                sd[f"{prefix}.{i}.adaLN_modulation.0.bias"] = W(4 * dim)

    blk("noise_refiner", c.n_refiner_layers, True)
    blk("context_refiner", c.n_refiner_layers, False)
    blk("layers", c.n_layers, True)

    tdir = tmp_path / "transformer"
    tdir.mkdir()
    save_file(sd, str(tdir / "diffusion_pytorch_model.safetensors"))

    model = ZImageTransformer2DModel(c, jnp.float32)
    params = model.load_weights(str(tmp_path))
    lat = jax.random.normal(jax.random.key(5), (1, c.in_channels, 8, 8))
    cap = jax.random.normal(jax.random.key(6), (1, 3, c.cap_feat_dim))
    out = model.forward(params, lat, jnp.asarray([0.4]), cap, 3)
    assert out.shape == (1, c.in_channels, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
