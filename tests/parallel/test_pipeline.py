"""Intra-model pipeline parallelism (parallel/pipeline.py): GPipe
schedule under shard_map matches the single-device lax.scan exactly.

Parity target: the reference's PipelineGroupCoordinator intra-model PP
(reference diffusion/distributed/group_coordinator.py:552-908) — here
exercised as one SPMD program on a virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vllm_omni_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pipeline_blocks,
    shard_blocks_for_pipeline,
)


def _mesh(n) -> Mesh:
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return make_pipe_mesh(devs, n)


def _toy_blocks(L, dim, key):
    ks = jax.random.split(key, 2)
    return {
        "w": jax.random.normal(ks[0], (L, dim, dim), jnp.float32) * 0.2,
        "b": jax.random.normal(ks[1], (L, dim), jnp.float32) * 0.1,
    }


def _toy_block(carry, p):
    x = carry["x"]
    y = jnp.tanh(x @ p["w"] + p["b"] + carry["cond"][:, None, :])
    return dict(carry, x=x + y)


@pytest.mark.parametrize("pp,M", [(2, 4), (4, 4), (4, 8)])
def test_pipeline_matches_scan(pp, M):
    mesh = _mesh(pp)
    L, B, N, dim = 8, 8, 16, 32
    key = jax.random.key(0)
    blocks = _toy_blocks(L, dim, key)
    x = jax.random.normal(jax.random.key(1), (B, N, dim), jnp.float32)
    cond = jax.random.normal(jax.random.key(2), (B, dim), jnp.float32)
    carry = {"x": x, "cond": cond}

    ref, _ = jax.lax.scan(
        lambda c, p: (_toy_block(c, p), None), carry, blocks)
    got = pipeline_blocks(_toy_block, blocks, carry, mesh, M)
    np.testing.assert_allclose(np.asarray(got["x"]),
                               np.asarray(ref["x"]), rtol=1e-5, atol=1e-5)
    # conditioning passes through unchanged
    np.testing.assert_array_equal(np.asarray(got["cond"]),
                                  np.asarray(cond))


def test_pipeline_rejects_indivisible():
    mesh = _mesh(2)
    blocks = _toy_blocks(3, 8, jax.random.key(0))  # 3 % 2 != 0
    carry = {"x": jnp.zeros((2, 4, 8)), "cond": jnp.zeros((2, 8))}
    with pytest.raises(ValueError):
        pipeline_blocks(_toy_block, blocks, carry, mesh, 2)


def test_qwen_image_transformer_pp_matches_scan():
    from vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
        QwenImageTransformer2DModel,
        QwenImageTransformerConfig,
    )

    pp = 4
    mesh = _mesh(pp)
    cfg = QwenImageTransformerConfig(
        num_layers=8, attention_head_dim=16, num_attention_heads=4,
        joint_attention_dim=64, in_channels=16, out_channels=4,
        axes_dims_rope=(4, 6, 6))
    model = QwenImageTransformer2DModel(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.key(0))
    B, gh, gw, Ntxt = 4, 4, 4, 7
    img = jax.random.normal(jax.random.key(1), (B, gh * gw, 16),
                            jnp.float32)
    txt = jax.random.normal(jax.random.key(2), (B, Ntxt, 64), jnp.float32)
    t = jnp.full((B,), 0.4, jnp.float32)
    mask = jnp.asarray([[True] * 5 + [False] * 2] * B)

    ref = model.forward(params, img, txt, t, (1, gh, gw), txt_mask=mask)

    model.pp_mesh = mesh
    model.pp_microbatches = 4
    pparams = shard_blocks_for_pipeline(params, "blocks", mesh)
    got = model.forward(pparams, img, txt, t, (1, gh, gw), txt_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_wan_transformer_pp_matches_scan():
    from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
        WanTransformer3DModel,
        WanTransformerConfig,
    )

    pp = 4
    mesh = _mesh(pp)
    # head_dim 24: the 3-axis rope split [8, 8, 8] stays even
    cfg = WanTransformerConfig(
        num_attention_heads=4, attention_head_dim=24, num_layers=8,
        ffn_dim=64, text_dim=32, freq_dim=32, text_len=6)
    model = WanTransformer3DModel(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.key(0))
    B, F, Hpx, Wpx = 4, 2, 8, 8
    lat = jax.random.normal(jax.random.key(1), (B, 16, F, Hpx, Wpx),
                            jnp.float32)
    t = jnp.full((B,), 500.0, jnp.float32)
    txt = jax.random.normal(jax.random.key(2), (B, 6, 32), jnp.float32)

    ref = model.forward(params, lat, t, txt)

    model.pp_mesh = mesh
    model.pp_microbatches = 4
    from vllm_omni_tpu.parallel.pipeline import shard_blocks_for_pipeline

    pparams = shard_blocks_for_pipeline(params, "blocks", mesh)
    got = model.forward(pparams, lat, t, txt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_setup_parallel_placement_pp():
    from vllm_omni_tpu.config.diffusion import (
        DiffusionParallelConfig,
        OmniDiffusionConfig,
    )
    from vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
        QwenImagePipeline,
    )
    from vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
        QwenImageTransformerConfig,
    )
    from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
        QwenImageVAEConfig,
    )
    from vllm_omni_tpu.diffusion.parallel_placement import (
        setup_parallel_placement,
    )
    from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    od = OmniDiffusionConfig(
        model="test", dtype="float32", vae_dtype="float32",
        parallel_config=DiffusionParallelConfig(pipeline_parallel_size=2))
    tf = QwenImageTransformerConfig(
        num_layers=4, attention_head_dim=16, num_attention_heads=4,
        joint_attention_dim=64, in_channels=16, out_channels=4,
        axes_dims_rope=(4, 6, 6))
    vae = QwenImageVAEConfig(base_dim=16, z_dim=4, dim_mult=(1, 2),
                             num_res_blocks=1, temperal_downsample=(False,))
    pipe = QwenImagePipeline(od, transformer_config=tf, vae_config=vae,
                             load_weights=False)
    rng = np.random.default_rng(0)
    req_kw = dict(
        request_id="r", prompt="x",
        prompt_embeds=rng.normal(size=(1, 8, 64)).astype(np.float32),
        negative_prompt_embeds=rng.normal(size=(1, 8, 64)).astype(
            np.float32),
        height=32, width=32, num_inference_steps=2, seed=0,
        true_cfg_scale=4.0, output_type="latent")
    lat_ref, _ = pipe.forward(OmniDiffusionRequest(**req_kw))
    lat_ref = np.asarray(lat_ref)

    setup_parallel_placement(pipe, od)
    assert pipe.transformer.pp_mesh is not None
    lat_pp, _ = pipe.forward(OmniDiffusionRequest(**req_kw))
    np.testing.assert_allclose(np.asarray(lat_pp), lat_ref,
                               rtol=2e-5, atol=2e-5)
