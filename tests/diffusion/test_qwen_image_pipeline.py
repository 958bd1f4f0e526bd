"""Tiny QwenImage pipeline end-to-end on CPU (random weights)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.config.diffusion import (
    DiffusionCacheConfig,
    OmniDiffusionConfig,
)
from vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
    QwenImagePipeline,
    QwenImageEditPipeline,
    pack_latents,
    unpack_latents,
)
from vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
    QwenImageTransformerConfig,
)
from vllm_omni_tpu.diffusion.models.qwen_image.vae import QwenImageVAEConfig
from vllm_omni_tpu.diffusion.omni_diffusion import OmniDiffusion
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

TINY_TF = QwenImageTransformerConfig(
    num_layers=2,
    attention_head_dim=32,
    num_attention_heads=2,
    joint_attention_dim=48,
    in_channels=16,  # z_dim 4 * packed 4
    out_channels=4,
    axes_dims_rope=(8, 12, 12),
)
TINY_VAE = QwenImageVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1)


def make_pipeline(**od_kwargs):
    od = OmniDiffusionConfig(model="tiny", dtype="float32", **od_kwargs)
    return QwenImagePipeline(
        od, transformer_config=TINY_TF, vae_config=TINY_VAE,
        load_weights=False,
    )


def embeds(batch=1, n=7, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(batch, n, 48)).astype(np.float32)
    m = np.ones((batch, n), bool)
    return e, m


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(2, 4, 1, 8, 6)).astype(np.float32))
    packed = pack_latents(lat)
    assert packed.shape == (2, 4 * 3, 16)
    back = unpack_latents(packed, 4, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(lat))


@pytest.fixture(scope="module")
def pipe():
    return make_pipeline()


def test_t2i_no_cfg(pipe):
    e, m = embeds()
    req = OmniDiffusionRequest(
        prompt_embeds=e, prompt_embeds_mask=m, height=32, width=32,
        num_inference_steps=4, true_cfg_scale=1.0, seed=3,
    )
    image, metrics = pipe.forward(req)
    # VAE spatial compression here is 2x (one downsample stage): latent
    # grid 32/16=2 → 2*2=4 latent px → *2 = 8 px output? No: pipeline uses
    # vae_scale_factor 8 for grids; tiny VAE upsamples 2x from latents.
    assert image.shape[0] == 1 and image.shape[1] == 3
    assert np.isfinite(np.asarray(image)).all()
    assert metrics.num_steps == 4


def test_t2i_cfg_and_determinism(pipe):
    e, m = embeds()
    ne, nm = embeds(seed=9)
    kw = dict(
        prompt_embeds=e, prompt_embeds_mask=m,
        negative_prompt_embeds=ne, negative_prompt_embeds_mask=nm,
        height=32, width=32, num_inference_steps=3, true_cfg_scale=3.0,
        seed=7, output_type="latent",
    )
    a, _ = pipe.forward(OmniDiffusionRequest(**kw))
    b, _ = pipe.forward(OmniDiffusionRequest(**kw))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c, _ = pipe.forward(OmniDiffusionRequest(**{**kw, "seed": 8}))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # CFG path differs from no-CFG
    d, _ = pipe.forward(OmniDiffusionRequest(**{**kw, "true_cfg_scale": 1.0}))
    assert not np.allclose(np.asarray(a), np.asarray(d))


def test_trajectory_capture(pipe):
    e, m = embeds()
    req = OmniDiffusionRequest(
        prompt_embeds=e, prompt_embeds_mask=m, height=32, width=32,
        num_inference_steps=3, true_cfg_scale=1.0, return_trajectory=True,
        output_type="latent",
    )
    pipe.forward(req)
    assert len(req.trajectory_latents) == 3
    assert len(req.trajectory_timesteps) == 3


def test_edit_pipeline_strength():
    od = OmniDiffusionConfig(model="tiny", dtype="float32")
    pipe = QwenImageEditPipeline(
        od, transformer_config=TINY_TF, vae_config=TINY_VAE, load_weights=False,
    )
    e, m = embeds()
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, size=(1, 3, 32, 32)).astype(np.float32)
    req = OmniDiffusionRequest(
        prompt_embeds=e, prompt_embeds_mask=m, image=img, strength=0.5,
        height=32, width=32, num_inference_steps=3, true_cfg_scale=1.0,
        output_type="latent",
    )
    out, _ = pipe.forward(req)
    assert np.isfinite(np.asarray(out)).all()


def test_omni_diffusion_api():
    od = OmniDiffusionConfig(model="tiny", dtype="float32")
    pipe = make_pipeline()
    omni = OmniDiffusion(od_config=od, pipeline=pipe)
    e, m = embeds()
    outs = omni.generate(
        "a cat", prompt_embeds=e, prompt_embeds_mask=m,
        height=32, width=32, num_inference_steps=2, true_cfg_scale=1.0,
        output_type="np",
    )
    assert len(outs) == 1
    assert outs[0].error is None
    assert outs[0].final_output_type == "image"
    assert outs[0].images[0].ndim == 3
    assert outs[0].metrics.num_steps == 2


def test_teacache_skips_steps():
    od = OmniDiffusionConfig(
        model="tiny", dtype="float32",
        cache_config=DiffusionCacheConfig(
            cache_backend="teacache", rel_l1_thresh=1e9, num_warmup_steps=1,
        ),
    )
    pipe = QwenImagePipeline(
        od, transformer_config=TINY_TF, vae_config=TINY_VAE, load_weights=False,
    )
    from vllm_omni_tpu.diffusion.cache import get_cache_backend

    pipe.cache_backend = get_cache_backend(od.cache_config, pipe)
    e, m = embeds()
    req = OmniDiffusionRequest(
        prompt_embeds=e, prompt_embeds_mask=m, height=32, width=32,
        num_inference_steps=6, true_cfg_scale=1.0, output_type="latent",
    )
    out, metrics = pipe.forward(req)
    assert metrics.steps_skipped > 0
    assert np.isfinite(np.asarray(out)).all()


def test_vae_roundtrip_shapes():
    from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
        AutoencoderKLQwenImage,
    )
    import jax

    vae = AutoencoderKLQwenImage(TINY_VAE)
    params = vae.init_params(jax.random.key(0))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 3, 1, 16, 16)), jnp.float32)
    z = vae.encode(params, x)
    assert z.shape == (1, 4, 1, 8, 8)  # one 2x downsample stage
    y = vae.decode(params, z)
    assert y.shape == (1, 3, 1, 16, 16)
    assert np.isfinite(np.asarray(y)).all()
