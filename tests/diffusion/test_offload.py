"""CPU offload flags: offloaded components' params become host arrays;
pipeline outputs are bitwise-unchanged."""

import numpy as np

import jax

from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
from vllm_omni_tpu.diffusion.offload import apply_offload_policy


def _leaves(tree):
    return jax.tree.leaves(tree)


def test_policy_moves_selected_components():
    params = {
        "transformer": {"w": jax.numpy.ones((2, 2))},
        "vae": {"w": jax.numpy.ones((2, 2))},
        "text_encoder": None,
    }
    od = OmniDiffusionConfig(vae_cpu_offload=True)
    out = apply_offload_policy(params, od)
    assert all(isinstance(x, np.ndarray) for x in _leaves(out["vae"]))
    assert all(not isinstance(x, np.ndarray)
               for x in _leaves(out["transformer"]))


def test_offloaded_pipeline_output_identical():
    from vllm_omni_tpu.diffusion.models.common.flux_like import (
        FluxLikeConfig,
    )
    from vllm_omni_tpu.diffusion.models.common.autoencoder_kl import (
        AutoencoderKLConfig,
    )
    from vllm_omni_tpu.diffusion.models.common.flux_pipeline import (
        FluxLikePipeline,
    )
    from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

    tf_cfg = FluxLikeConfig(
        num_layers=1, num_single_layers=1, attention_head_dim=8,
        num_attention_heads=2, joint_attention_dim=16, in_channels=16,
        out_channels=16, axes_dims_rope=(2, 4, 2))
    v_cfg = AutoencoderKLConfig(
        latent_channels=4, block_out_channels=[32, 32], layers_per_block=1)

    def run(**flags):
        od = OmniDiffusionConfig(
            dtype="float32", default_height=32, default_width=32, **flags)
        pipe = FluxLikePipeline(od, transformer_config=tf_cfg,
                                vae_config=v_cfg, load_weights=False,
                                rng_seed=0)
        req = OmniDiffusionRequest(
            prompt_embeds=np.ones((1, 3, 16), np.float32),
            num_inference_steps=2, guidance_scale=1.0, seed=1)
        img, _ = pipe.forward(req)
        return np.asarray(img)

    base = run()
    off = run(dit_cpu_offload=True, vae_cpu_offload=True,
              text_encoder_cpu_offload=True)
    np.testing.assert_array_equal(base, off)
