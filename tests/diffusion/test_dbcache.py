"""DBCache backend: skip/extrapolate behavior through the SD3 pipeline."""

import numpy as np

import jax.numpy as jnp

from vllm_omni_tpu.config.diffusion import (
    DiffusionCacheConfig,
    OmniDiffusionConfig,
)
from vllm_omni_tpu.diffusion.cache import get_cache_backend
from vllm_omni_tpu.diffusion.cache.dbcache import DBCacheBackend
from vllm_omni_tpu.diffusion.models.common.autoencoder_kl import (
    AutoencoderKLConfig,
)
from vllm_omni_tpu.diffusion.models.sd3.pipeline import (
    StableDiffusion3Pipeline,
)
from vllm_omni_tpu.diffusion.models.sd3.transformer import (
    SD3TransformerConfig,
)
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

TF_CFG = SD3TransformerConfig(
    sample_size=16, patch_size=2, in_channels=4, out_channels=4,
    num_layers=2, attention_head_dim=8, num_attention_heads=4,
    joint_attention_dim=24, caption_projection_dim=32,
    pooled_projection_dim=20, pos_embed_max_size=16,
)
VAE_CFG = AutoencoderKLConfig(
    latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
    norm_num_groups=4)


def test_factory_resolves_dbcache():
    cfg = DiffusionCacheConfig(cache_backend="dbcache")
    assert isinstance(get_cache_backend(cfg, None), DBCacheBackend)
    cfg = DiffusionCacheConfig(cache_backend="cache_dit")
    assert isinstance(get_cache_backend(cfg, None), DBCacheBackend)


def test_dbcache_skips_steady_velocity():
    b = DBCacheBackend(DiffusionCacheConfig(
        cache_backend="dbcache", residual_diff_threshold=0.5,
        Fn_compute_blocks=4, Bn_compute_blocks=1))
    b.begin_run(8)
    lat = jnp.zeros((1, 4))
    # two computed steps with nearly identical velocities
    b.observe(0, lat, lat + 1.0, jnp.float32(1.0), jnp.float32(0.5))
    b.observe(1, lat, lat + 1.01, jnp.float32(1.0), jnp.float32(0.5))
    assert not b.should_skip(0, None, 0.5, lat)   # head
    assert b.should_skip(2, None, 0.5, lat)       # steady -> skip
    out = b.apply_skip(lat, jnp.float32(0.5), jnp.float32(0.25))
    assert np.isfinite(np.asarray(out)).all()
    assert not b.should_skip(7, None, 0.1, lat)   # tail always computes
    # consecutive-skip cap
    assert b.should_skip(3, None, 0.4, lat)
    assert b.should_skip(4, None, 0.3, lat)
    assert not b.should_skip(5, None, 0.2, lat)   # max_consecutive=3


def test_dbcache_through_pipeline():
    od = OmniDiffusionConfig(
        model="", dtype=jnp.float32, default_height=16, default_width=16,
        cache_config=DiffusionCacheConfig(
            cache_backend="dbcache", residual_diff_threshold=10.0,
            Fn_compute_blocks=4, Bn_compute_blocks=1))
    pipe = StableDiffusion3Pipeline(
        od, transformer_config=TF_CFG, vae_config=VAE_CFG,
        load_weights=False)
    pipe.cache_backend = get_cache_backend(od.cache_config, pipe)
    rng = np.random.default_rng(0)
    req = OmniDiffusionRequest(
        request_id="d0", prompt="x",
        prompt_embeds=rng.normal(size=(1, 4, 24)).astype(np.float32),
        pooled_prompt_embeds=rng.normal(size=(1, 20)).astype(np.float32),
        num_inference_steps=6, output_type="latent", guidance_scale=1.0)
    lat, metrics = pipe.forward(req)
    # huge threshold -> every eligible middle step skipped
    assert metrics.steps_skipped >= 2
    assert np.isfinite(np.asarray(lat)).all()
