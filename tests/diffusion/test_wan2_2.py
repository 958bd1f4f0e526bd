"""Wan2.2 video DiT + pipeline structural tests.

Pins: 3D rope axis splits + Wan pair rotation, per-token (ti2v)
timesteps, boundary-ratio expert switching, batched CFG equivalence,
3D patchify/unpatchify round-trip, loader name mapping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
from vllm_omni_tpu.diffusion import scheduling
from vllm_omni_tpu.diffusion.models.qwen_image.vae import QwenImageVAEConfig
from vllm_omni_tpu.diffusion.models.wan2_2.pipeline import WanPipeline
from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
    WanTransformer3DModel,
    WanTransformerConfig,
    apply_wan_rope,
    wan_rope_angles,
)
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

TF_CFG = WanTransformerConfig(
    patch_size=(1, 2, 2), num_attention_heads=2, attention_head_dim=12,
    in_channels=4, out_channels=4, text_dim=16, freq_dim=32, ffn_dim=48,
    num_layers=2, cross_attn_norm=True,
)
VAE_CFG = QwenImageVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
    temperal_downsample=(True,),  # one entry per downsample stage
)


@pytest.fixture(scope="module")
def tf_pair():
    model = WanTransformer3DModel(TF_CFG, jnp.float32)
    return model, model.init_params(jax.random.key(0))


def test_rope_pair_rotation_matches_torch_semantics():
    """apply_wan_rope == the reference apply_rotary_emb_wan math."""
    import torch

    angles = wan_rope_angles(TF_CFG, 2, 2, 2)  # [8, 6]
    x = np.random.default_rng(0).normal(size=(1, 8, 2, 12)).astype(
        np.float32)
    got = np.asarray(apply_wan_rope(jnp.asarray(x), angles))

    # reference math (wan2_2_transformer.py:24-46): repeat_interleave'd
    # cos/sin, even/odd pair rotation
    ang = np.asarray(angles)  # [S, D/2]
    cos = np.repeat(np.cos(ang), 2, axis=-1)[None, :, None, :]
    sin = np.repeat(np.sin(ang), 2, axis=-1)[None, :, None, :]
    t = torch.tensor(x)
    x1, x2 = t.unflatten(-1, (-1, 2)).unbind(-1)
    tcos = torch.tensor(cos[..., 0::2])
    tsin = torch.tensor(sin[..., 1::2])
    out = torch.empty_like(t)
    out[..., 0::2] = x1 * tcos - x2 * tsin
    out[..., 1::2] = x1 * tsin + x2 * tcos
    np.testing.assert_allclose(got, out.numpy(), atol=1e-6)


def test_forward_shapes(tf_pair):
    model, params = tf_pair
    B, F, H, W = 2, 2, 4, 6
    lat = jax.random.normal(jax.random.key(1), (B, 4, F, H, W))
    txt = jax.random.normal(jax.random.key(2), (B, 5, 16))
    out = model.forward(params, lat, jnp.asarray([500.0, 10.0]), txt)
    assert out.shape == (B, 4, F, H, W)
    assert np.isfinite(np.asarray(out)).all()


def test_per_token_timesteps(tf_pair):
    """ti2v: [B, S] timesteps run and differ from scalar timesteps."""
    model, params = tf_pair
    lat = jax.random.normal(jax.random.key(1), (1, 4, 2, 4, 4))
    txt = jax.random.normal(jax.random.key(2), (1, 3, 16))
    S = 2 * 2 * 2  # (F/1) * (H/2) * (W/2)
    ts = jnp.full((1, S), 500.0).at[0, :4].set(0.0)
    o_tok = model.forward(params, lat, ts, txt)
    o_scalar = model.forward(params, lat, jnp.asarray([500.0]), txt)
    assert o_tok.shape == o_scalar.shape
    assert np.abs(np.asarray(o_tok) - np.asarray(o_scalar)).max() > 1e-6


def test_patchify_roundtrip():
    """proj = identity-ish check: unpatchify(patchify(x)) recovers layout."""
    c = TF_CFG
    model = WanTransformer3DModel(c, jnp.float32)
    params = model.init_params(jax.random.key(0))
    # identity patch proj and output proj, zero blocks influence is hard;
    # instead just verify output spatial layout via shape on odd sizes
    lat = jax.random.normal(jax.random.key(3), (1, 4, 3, 6, 4))
    txt = jax.random.normal(jax.random.key(4), (1, 2, 16))
    out = model.forward(params, lat, jnp.asarray([100.0]), txt)
    # pt=1 keeps frames; spatial multiples of 2 preserved
    assert out.shape == (1, 4, 3, 6, 4)


def _pipeline(boundary=None, **od_kw):
    od = OmniDiffusionConfig(
        model="", dtype=jnp.float32, default_height=16, default_width=16,
        boundary_ratio=boundary, **od_kw)
    return WanPipeline(od, transformer_config=TF_CFG, vae_config=VAE_CFG,
                       load_weights=False,
                       has_transformer_2=boundary is not None)


def test_pipeline_t2v_e2e():
    pipe = _pipeline()
    rng = np.random.default_rng(0)
    req = OmniDiffusionRequest(
        request_id="w0", prompt="x",
        prompt_embeds=rng.normal(size=(1, 4, 16)).astype(np.float32),
        num_inference_steps=2, num_frames=5, output_type="latent",
        guidance_scale=1.0)
    lat, metrics = pipe.forward(req)
    # 5 frames -> (5-1)/2+1 = 3 latent frames, 16px -> 8 latent px
    assert lat.shape == (1, 4, 3, 8, 8)
    assert metrics.num_steps == 2


def test_pipeline_video_decode():
    pipe = _pipeline()
    rng = np.random.default_rng(0)
    req = OmniDiffusionRequest(
        request_id="w1", prompt="x",
        prompt_embeds=rng.normal(size=(1, 4, 16)).astype(np.float32),
        num_inference_steps=1, num_frames=3, output_type="np",
        guidance_scale=1.0)
    video, _ = pipe.forward(req)
    assert video.shape == (1, 3, 3, 16, 16)  # [B, 3, F, H, W]
    assert np.isfinite(np.asarray(video)).all()


def test_boundary_expert_switching():
    """t >= boundary uses transformer, t < boundary uses transformer_2."""
    pipe = _pipeline(boundary=0.5)
    assert pipe.params["transformer_2"] is not None
    rng = np.random.default_rng(1)
    embeds = rng.normal(size=(1, 4, 16)).astype(np.float32)

    base = OmniDiffusionRequest(
        request_id="w2", prompt="x", prompt_embeds=embeds,
        num_inference_steps=4, num_frames=1, output_type="latent",
        guidance_scale=1.0, seed=3)
    lat_moe, _ = pipe.forward(base)

    # same run with the experts swapped must differ (low-noise steps use
    # the other weights)
    pipe.params["transformer"], pipe.params["transformer_2"] = (
        pipe.params["transformer_2"], pipe.params["transformer"])
    req2 = OmniDiffusionRequest(
        request_id="w3", prompt="x", prompt_embeds=embeds,
        num_inference_steps=4, num_frames=1, output_type="latent",
        guidance_scale=1.0, seed=3)
    lat_swap, _ = pipe.forward(req2)
    assert np.abs(np.asarray(lat_moe) - np.asarray(lat_swap)).max() > 1e-6


def test_cfg_batched_matches_manual():
    pipe = _pipeline()
    rng = np.random.default_rng(2)
    embeds = rng.normal(size=(1, 4, 16)).astype(np.float32)
    neg = rng.normal(size=(1, 4, 16)).astype(np.float32)
    req = OmniDiffusionRequest(
        request_id="w4", prompt="x", prompt_embeds=embeds,
        negative_prompt_embeds=neg, num_inference_steps=1, num_frames=1,
        output_type="latent", guidance_scale=4.0, seed=9)
    lat, _ = pipe.forward(req)

    latents = jax.random.normal(jax.random.key(9), (1, 4, 1, 8, 8),
                                jnp.float32)
    sched = scheduling.set_timesteps(1, shift=3.0)
    t = jnp.full((1,), sched.timesteps[0], jnp.float32)
    tp = pipe.params["transformer"]
    pos = pipe.transformer.forward(tp, latents, t, jnp.asarray(embeds))
    negp = pipe.transformer.forward(tp, latents, t, jnp.asarray(neg))
    vel = negp + 4.0 * (pos - negp)
    ref = scheduling.step(latents, vel, sched.sigmas[0], sched.sigmas[1])
    np.testing.assert_allclose(np.asarray(lat), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_loader_mapping(tmp_path):
    import torch
    from safetensors.torch import save_file

    c = TF_CFG
    dim = c.inner_dim
    g = torch.Generator().manual_seed(0)

    def W(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "patch_embedding.weight": W(dim, c.in_channels, 1, 2, 2),
        "patch_embedding.bias": W(dim),
        "condition_embedder.time_embedder.linear_1.weight": W(
            dim, c.freq_dim),
        "condition_embedder.time_embedder.linear_1.bias": W(dim),
        "condition_embedder.time_embedder.linear_2.weight": W(dim, dim),
        "condition_embedder.time_embedder.linear_2.bias": W(dim),
        "condition_embedder.time_proj.weight": W(6 * dim, dim),
        "condition_embedder.time_proj.bias": W(6 * dim),
        "condition_embedder.text_embedder.linear_1.weight": W(
            dim, c.text_dim),
        "condition_embedder.text_embedder.linear_1.bias": W(dim),
        "condition_embedder.text_embedder.linear_2.weight": W(dim, dim),
        "condition_embedder.text_embedder.linear_2.bias": W(dim),
        "scale_shift_table": W(1, 2, dim),
        "proj_out.weight": W(c.out_channels * 4, dim),
        "proj_out.bias": W(c.out_channels * 4),
    }
    for i in range(c.num_layers):
        pre = f"blocks.{i}"
        sd[f"{pre}.scale_shift_table"] = W(1, 6, dim)
        for a in ("attn1", "attn2"):
            for n in ("to_q", "to_k", "to_v", "to_out.0"):
                sd[f"{pre}.{a}.{n}.weight"] = W(dim, dim)
                sd[f"{pre}.{a}.{n}.bias"] = W(dim)
            sd[f"{pre}.{a}.norm_q.weight"] = W(dim)
            sd[f"{pre}.{a}.norm_k.weight"] = W(dim)
        sd[f"{pre}.norm2.weight"] = W(dim)
        sd[f"{pre}.norm2.bias"] = W(dim)
        sd[f"{pre}.ffn.net.0.proj.weight"] = W(c.ffn_dim, dim)
        sd[f"{pre}.ffn.net.0.proj.bias"] = W(c.ffn_dim)
        sd[f"{pre}.ffn.net.2.weight"] = W(dim, c.ffn_dim)
        sd[f"{pre}.ffn.net.2.bias"] = W(dim)
    tdir = tmp_path / "transformer"
    tdir.mkdir()
    save_file(sd, str(tdir / "diffusion_pytorch_model.safetensors"))

    model = WanTransformer3DModel(c, jnp.float32)
    params = model.load_weights(str(tmp_path))

    # 3D conv patchify == our linear on a probe
    lat = jax.random.normal(jax.random.key(5), (1, c.in_channels, 2, 4, 4))
    with torch.no_grad():
        ref = torch.nn.functional.conv3d(
            torch.tensor(np.asarray(lat)), sd["patch_embedding.weight"],
            sd["patch_embedding.bias"], stride=(1, 2, 2))
    ref_tokens = ref.flatten(2).transpose(1, 2).numpy()
    x = np.asarray(lat).reshape(1, c.in_channels, 2, 1, 2, 2, 2, 2)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(1, 8, -1)
    ours = np.asarray(
        x @ np.asarray(params["patch_proj"]["w"])
        + np.asarray(params["patch_proj"]["b"]))
    np.testing.assert_allclose(ours, ref_tokens, atol=1e-5, rtol=1e-5)

    txt = jax.random.normal(jax.random.key(6), (1, 3, c.text_dim))
    out = model.forward(params, lat, jnp.asarray([500.0]), txt)
    assert out.shape == (1, c.out_channels, 2, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_i2v_concat_conditioning():
    """Wan2.1-style A14B i2v: 36-channel input (16 noise + 4 mask +
    16 latent condition), optional CLIP image-prefix cross-attention."""
    from vllm_omni_tpu.diffusion.models.wan2_2.pipeline import (
        WanImageToVideoPipeline,
    )

    tf_cfg = WanTransformerConfig(
        patch_size=(1, 2, 2), num_attention_heads=2, attention_head_dim=12,
        in_channels=4 + 2 + 4, out_channels=4, text_dim=16, freq_dim=32,
        ffn_dim=48, num_layers=2, cross_attn_norm=True,
        image_dim=10, added_kv_proj_dim=24, text_len=4)
    od = OmniDiffusionConfig(
        model="", dtype=jnp.float32, default_height=16, default_width=16)
    pipe = WanImageToVideoPipeline(
        od, transformer_config=tf_cfg, vae_config=VAE_CFG,
        load_weights=False, expand_timesteps=False)
    rng = np.random.default_rng(0)
    req = OmniDiffusionRequest(
        request_id="i2v", prompt="x",
        prompt_embeds=rng.normal(size=(1, 4, 16)).astype(np.float32),
        image=rng.normal(size=(1, 3, 16, 16)).astype(np.float32) * 0.5,
        image_embeds=rng.normal(size=(1, 6, 10)).astype(np.float32),
        num_inference_steps=2, num_frames=3, output_type="latent",
        guidance_scale=1.0)
    lat, metrics = pipe.forward(req)
    assert lat.shape == (1, 4, 2, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()
    assert metrics.num_steps == 2


def test_wan_sequence_parallel_matches_single(tiny_t2v=None):
    """SP (GSPMD USP mapping): latents sharded over 'seq' must reproduce
    the single-device video (reference test role:
    test_ulysses_sequence_parallel.py:47-120)."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    import numpy as np

    from vllm_omni_tpu.config.diffusion import (
        DiffusionParallelConfig,
        OmniDiffusionConfig,
    )
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine
    from vllm_omni_tpu.diffusion.models.wan2_2.pipeline import WanPipeline
    from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

    def run(sp):
        od = OmniDiffusionConfig(
            model="tiny", dtype="float32",
            parallel_config=DiffusionParallelConfig(ulysses_degree=sp))
        pipe = WanPipeline(od, transformer_config=TF_CFG,
                           vae_config=VAE_CFG, load_weights=False)
        eng = DiffusionEngine(od, pipeline=pipe, load_weights=False)
        rng = np.random.default_rng(0)
        req = OmniDiffusionRequest(
            request_id="w", prompt="x",
            prompt_embeds=rng.normal(size=(1, 5, TF_CFG.text_dim)
                                     ).astype(np.float32),
            height=32, width=32, num_frames=5, num_inference_steps=2,
            seed=3, guidance_scale=1.0, output_type="latent")
        out = eng.step([req])[0]
        assert out.error is None, out.error
        return np.asarray(out.latents)

    ref = run(sp=1)
    got = run(sp=4)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_rope_mm_matches_pair_rotation():
    """apply_wan_rope_mm (the attention path: x*cos + (x@rot)*sin, no
    lane relayout) == apply_wan_rope exactly — rot only permutes and
    negates values."""
    from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
        apply_wan_rope_mm,
        wan_rope_tables,
    )

    angles = wan_rope_angles(TF_CFG, 2, 2, 2)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 8, 2, 12)).astype(np.float32))
    ref = np.asarray(apply_wan_rope(x, angles))
    cos, sin, rot = wan_rope_tables(angles)
    got = np.asarray(apply_wan_rope_mm(x, cos, sin, rot))
    np.testing.assert_allclose(got, ref, atol=1e-6)
