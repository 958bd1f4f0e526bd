"""Structural tests: QwenImageLayeredPipeline + LongcatImageEditPipeline
(tiny random configs; no diffusers oracle exists in this environment —
shape/determinism/conditioning invariants only, matching the suite's
diffusion test strategy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
from vllm_omni_tpu.diffusion.models.common.autoencoder_kl import (
    AutoencoderKLConfig,
)
from vllm_omni_tpu.diffusion.models.common.flux_like import FluxLikeConfig
from vllm_omni_tpu.diffusion.models.longcat_image import (
    LongcatImageEditPipeline,
    LongCatImagePipeline,
)
from vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
    QwenImageLayeredPipeline,
)
from vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
    QwenImageTransformerConfig,
)
from vllm_omni_tpu.diffusion.models.qwen_image.vae import QwenImageVAEConfig
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

LAYERED_TF = QwenImageTransformerConfig(
    num_layers=2, attention_head_dim=32, num_attention_heads=2,
    joint_attention_dim=48, in_channels=16, out_channels=4,
    axes_dims_rope=(8, 12, 12),
    use_layer3d_rope=True, use_additional_t_cond=True, zero_cond_t=True,
)
TINY_VAE = QwenImageVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2),
                              num_res_blocks=1)


@pytest.fixture(scope="module")
def layered_pipe():
    od = OmniDiffusionConfig(model="tiny", dtype="float32")
    return QwenImageLayeredPipeline(
        od, transformer_config=LAYERED_TF, vae_config=TINY_VAE,
        load_weights=False,
    )


def _embeds(batch=1, n=7, seed=0, dim=48):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(batch, n, dim)).astype(np.float32),
            np.ones((batch, n), bool))


def test_layered_shapes_and_determinism(layered_pipe):
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (1, 3, 64, 96)).astype(np.float32)
    e, m = _embeds()
    ne, nm = _embeds(seed=1)

    def run():
        req = OmniDiffusionRequest(
            prompt_embeds=e, prompt_embeds_mask=m,
            negative_prompt_embeds=ne, negative_prompt_embeds_mask=nm,
            image=img, layers=2, resolution=48, num_inference_steps=2,
            seed=7, true_cfg_scale=2.0, output_type="np",
        )
        out, metrics = layered_pipe.forward(req)
        return np.asarray(out), metrics

    out1, metrics = run()
    # [B, layers, 3, H, W]; dims derived from resolution 48 + aspect 96/64
    assert out1.shape[0] == 1 and out1.shape[1] == 2 and out1.shape[2] == 3
    assert out1.shape[3] % 8 == 0 and out1.shape[4] % 8 == 0
    assert out1.shape[4] > out1.shape[3]  # aspect preserved (wider input)
    assert np.isfinite(out1).all()
    assert metrics.num_steps == 2
    out2, _ = run()
    np.testing.assert_array_equal(out1, out2)


def test_layered_requires_image(layered_pipe):
    e, m = _embeds()
    req = OmniDiffusionRequest(prompt_embeds=e, prompt_embeds_mask=m,
                               layers=2, num_inference_steps=1)
    with pytest.raises(ValueError, match="input image"):
        layered_pipe.forward(req)


def test_layered_conditioning_matters(layered_pipe):
    """Different input images must produce different layer stacks."""
    rng = np.random.default_rng(3)
    e, m = _embeds()
    outs = []
    for seed in (0, 1):
        img = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
        req = OmniDiffusionRequest(
            prompt_embeds=e, prompt_embeds_mask=m, image=img, layers=2,
            resolution=48, num_inference_steps=1, seed=5, true_cfg_scale=1.0,
            output_type="latent",
        )
        outs.append(np.asarray(layered_pipe.forward(req)[0]))
    assert np.abs(outs[0] - outs[1]).max() > 1e-6


# ------------------------------------------------------------- LongCat edit

LC_TF = FluxLikeConfig(
    num_layers=2, num_single_layers=2, attention_head_dim=32,
    num_attention_heads=2, joint_attention_dim=32,
    in_channels=16, out_channels=16,  # tiny VAE: 4 latent ch x 2x2 pack
    axes_dims_rope=(8, 12, 12), ffn="gelu", context_norm=False,
)
LC_VAE = AutoencoderKLConfig(
    latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
    norm_num_groups=4, scaling_factor=0.3611, shift_factor=0.1159)


@pytest.fixture(scope="module")
def lc_edit():
    od = OmniDiffusionConfig(model="tiny", dtype="float32")
    return LongcatImageEditPipeline(
        od, transformer_config=LC_TF, vae_config=LC_VAE, load_weights=False)


def test_longcat_edit_shapes_and_conditioning(lc_edit):
    rng = np.random.default_rng(0)
    e = rng.normal(size=(1, 6, 32)).astype(np.float32)

    def run(img_seed):
        img = np.random.default_rng(img_seed).uniform(
            -1, 1, (1, 3, 32, 32)).astype(np.float32)
        req = OmniDiffusionRequest(
            prompt_embeds=e, image=img, height=32, width=32,
            num_inference_steps=2, seed=3, guidance_scale=1.0,
            output_type="np")
        out, metrics = lc_edit.forward(req)
        return np.asarray(out)

    out1 = run(0)
    assert out1.shape == (1, 3, 32, 32) and np.isfinite(out1).all()
    np.testing.assert_array_equal(out1, run(0))  # deterministic
    assert np.abs(out1 - run(1)).max() > 1e-6  # image conditioning matters


def test_longcat_edit_requires_image(lc_edit):
    e = np.zeros((1, 4, 32), np.float32)
    req = OmniDiffusionRequest(prompt_embeds=e, height=32, width=32,
                               num_inference_steps=1)
    with pytest.raises(ValueError, match="input image"):
        lc_edit.forward(req)


def test_longcat_base_t2i_still_works():
    od = OmniDiffusionConfig(model="tiny", dtype="float32")
    pipe = LongCatImagePipeline(
        od, transformer_config=LC_TF, vae_config=LC_VAE, load_weights=False)
    e = np.random.default_rng(0).normal(size=(1, 6, 32)).astype(np.float32)
    req = OmniDiffusionRequest(
        prompt_embeds=e, height=32, width=32, num_inference_steps=1,
        seed=0, guidance_scale=1.0, output_type="np")
    out, _ = pipe.forward(req)
    assert np.asarray(out).shape == (1, 3, 32, 32)
