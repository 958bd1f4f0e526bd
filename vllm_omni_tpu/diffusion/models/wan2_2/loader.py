"""Wan2.2 diffusers checkpoint loaders.

Maps diffusers `WanTransformer3DModel` safetensors onto our functional
tree (parity role: the fused-qkv load_weights at reference
wan2_2_transformer.py:664-704 and the component sources of
pipeline_wan2_2.py:193-236; the VAE reuses the shared Wan-family causal
3D VAE loader from qwen_image)."""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def _read_safetensors(path: str) -> dict[str, np.ndarray]:
    from vllm_omni_tpu.models.weight_loader import iter_safetensors

    return {k: v for k, v in iter_safetensors(path)}


def wan_transformer_params_from_state_dict(model, sd: dict[str, Any]):
    c = model.cfg
    dt = model.dtype
    L = c.num_layers

    def t(name):
        return jnp.asarray(np.asarray(sd[name], np.float32).T).astype(dt)

    def v(name):
        return jnp.asarray(np.asarray(sd[name], np.float32)).astype(dt)

    def lin_stack(fmt):
        return {
            "w": jnp.stack([t(fmt.format(i) + ".weight")
                            for i in range(L)]),
            "b": jnp.stack([v(fmt.format(i) + ".bias") for i in range(L)]),
        }

    def vec_stack(fmt):
        return jnp.stack([v(fmt.format(i)) for i in range(L)])

    blocks: dict[str, Any] = {
        "scale_shift_table": jnp.stack([
            jnp.asarray(np.asarray(
                sd[f"blocks.{i}.scale_shift_table"], np.float32)
                ).reshape(6, -1)
            for i in range(L)]),
        "attn1": {
            "to_q": lin_stack("blocks.{}.attn1.to_q"),
            "to_k": lin_stack("blocks.{}.attn1.to_k"),
            "to_v": lin_stack("blocks.{}.attn1.to_v"),
            "to_out": lin_stack("blocks.{}.attn1.to_out.0"),
            "norm_q": vec_stack("blocks.{}.attn1.norm_q.weight"),
            "norm_k": vec_stack("blocks.{}.attn1.norm_k.weight"),
        },
        "attn2": {
            "to_q": lin_stack("blocks.{}.attn2.to_q"),
            "to_k": lin_stack("blocks.{}.attn2.to_k"),
            "to_v": lin_stack("blocks.{}.attn2.to_v"),
            "to_out": lin_stack("blocks.{}.attn2.to_out.0"),
            "norm_q": vec_stack("blocks.{}.attn2.norm_q.weight"),
            "norm_k": vec_stack("blocks.{}.attn2.norm_k.weight"),
        },
        "ffn": {"fc1": lin_stack("blocks.{}.ffn.net.0.proj"),
                "fc2": lin_stack("blocks.{}.ffn.net.2")},
    }
    if c.cross_attn_norm:
        blocks["norm2_g"] = vec_stack("blocks.{}.norm2.weight")
        blocks["norm2_b"] = vec_stack("blocks.{}.norm2.bias")
    if c.added_kv_proj_dim is not None:
        blocks["attn2"]["add_k"] = lin_stack("blocks.{}.attn2.add_k_proj")
        blocks["attn2"]["add_v"] = lin_stack("blocks.{}.attn2.add_v_proj")
        blocks["attn2"]["norm_added_k"] = vec_stack(
            "blocks.{}.attn2.norm_added_k.weight")

    conv = np.asarray(sd["patch_embedding.weight"], np.float32)
    # conv3d [O, C, pt, ph, pw] -> linear [(C, pt, ph, pw), O]
    patch_w = conv.transpose(1, 2, 3, 4, 0).reshape(-1, conv.shape[0])

    params: dict[str, Any] = {
        "patch_proj": {"w": jnp.asarray(patch_w).astype(dt),
                       "b": v("patch_embedding.bias")},
        "time_embed": {
            "fc1": {"w": t("condition_embedder.time_embedder.linear_1"
                           ".weight"),
                    "b": v("condition_embedder.time_embedder.linear_1"
                           ".bias")},
            "fc2": {"w": t("condition_embedder.time_embedder.linear_2"
                           ".weight"),
                    "b": v("condition_embedder.time_embedder.linear_2"
                           ".bias")}},
        "time_proj": {"w": t("condition_embedder.time_proj.weight"),
                      "b": v("condition_embedder.time_proj.bias")},
        "text_embed": {
            "fc1": {"w": t("condition_embedder.text_embedder.linear_1"
                           ".weight"),
                    "b": v("condition_embedder.text_embedder.linear_1"
                           ".bias")},
            "fc2": {"w": t("condition_embedder.text_embedder.linear_2"
                           ".weight"),
                    "b": v("condition_embedder.text_embedder.linear_2"
                           ".bias")}},
        "blocks": blocks,
        "head_table": jnp.asarray(
            np.asarray(sd["scale_shift_table"], np.float32)).reshape(1, 2, -1),
        "proj_out": {"w": t("proj_out.weight"), "b": v("proj_out.bias")},
    }
    if c.image_dim is not None:
        pre = "condition_embedder.image_embedder"
        img = {
            "norm1_g": v(f"{pre}.norm1.weight"),
            "norm1_b": v(f"{pre}.norm1.bias"),
            "ff_fc1": {"w": t(f"{pre}.ff.net.0.proj.weight"),
                       "b": v(f"{pre}.ff.net.0.proj.bias")},
            "ff_fc2": {"w": t(f"{pre}.ff.net.2.weight"),
                       "b": v(f"{pre}.ff.net.2.bias")},
            "norm2_g": v(f"{pre}.norm2.weight"),
            "norm2_b": v(f"{pre}.norm2.bias"),
        }
        if f"{pre}.pos_embed" in sd:
            img["pos_embed"] = v(f"{pre}.pos_embed").reshape(
                -1, c.image_dim)
        params["image_embed"] = img
    return params


def load_wan_transformer_weights(path: str, model,
                                 subfolder: str = "transformer",
                                 od_config=None):
    from vllm_omni_tpu.diffusion.lora import merge_lora_for

    sub = os.path.join(path, subfolder)
    root = sub if os.path.isdir(sub) else path
    return wan_transformer_params_from_state_dict(
        model, merge_lora_for(_read_safetensors(root), od_config,
                              component=subfolder))


def read_wan_configs(model_root: str, tf_cfg, vae_cfg, sched_cfg):
    from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
        QwenImageVAEConfig,
    )
    from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
        WanTransformerConfig,
    )

    def read(sub, name="config.json"):
        fp = os.path.join(model_root, sub, name)
        if os.path.isfile(fp):
            with open(fp) as f:
                return json.load(f)
        return None

    tc = read("transformer")
    if tc is not None:
        tf_cfg = WanTransformerConfig.from_hf(tc)
    vc = read("vae")
    if vc is not None:
        vae_cfg = QwenImageVAEConfig.from_hf(vc)
    sc = read("scheduler", "scheduler_config.json")
    if sc is not None:
        sched_cfg = {"shift": sc.get("shift", sc.get("flow_shift", 3.0)),
                     **sc}
    has_t2 = os.path.isdir(os.path.join(model_root, "transformer_2"))
    expand = False
    mi = os.path.join(model_root, "model_index.json")
    if os.path.isfile(mi):
        with open(mi) as f:
            expand = bool(json.load(f).get("expand_timesteps", False))
    return tf_cfg, vae_cfg, sched_cfg, has_t2, expand


def load_wan_weights(model_root: str, pipeline) -> dict[str, Any]:
    from vllm_omni_tpu.diffusion.models.qwen_image.loader import (
        load_qwen_image_vae_weights,
    )

    od = getattr(pipeline, "od_config", None)
    params = {
        "transformer": load_wan_transformer_weights(
            model_root, pipeline.transformer, od_config=od),
        "transformer_2": None,
        "vae": load_qwen_image_vae_weights(
            model_root, pipeline.vae.cfg, jnp.float32),
    }
    if pipeline.has_transformer_2:
        params["transformer_2"] = load_wan_transformer_weights(
            model_root, pipeline.transformer, subfolder="transformer_2",
            od_config=od)
    return params
