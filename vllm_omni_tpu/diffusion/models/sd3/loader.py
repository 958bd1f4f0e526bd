"""SD3 diffusers checkpoint loaders.

Maps diffusers `SD3Transformer2DModel` + `AutoencoderKL` safetensors onto
our functional param trees (parity role: DiffusersPipelineLoader component
sources, reference diffusion/models/sd3/pipeline_sd3.py:139-147 and the
stacked-qkv load_weights at sd3_transformer.py:436-471)."""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax.numpy as jnp


def _read_safetensors(path: str) -> dict[str, np.ndarray]:
    from vllm_omni_tpu.models.weight_loader import iter_safetensors

    return {k: v for k, v in iter_safetensors(path)}


def load_sd3_transformer_weights(path: str, model, prefix: str = "",
                                 od_config=None):
    """path: diffusers model root or the transformer subfolder."""
    from vllm_omni_tpu.diffusion.lora import merge_lora_for

    sub = os.path.join(path, "transformer")
    root = sub if os.path.isdir(sub) else path
    sd = _read_safetensors(root)
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    sd = merge_lora_for(sd, od_config)
    return sd3_transformer_params_from_state_dict(model, sd)


def sd3_transformer_params_from_state_dict(
    model, sd: dict[str, Any]
) -> dict[str, Any]:
    c = model.cfg
    dt = model.dtype
    p = c.patch_size

    def t(name):
        return jnp.asarray(
            np.asarray(sd[name], np.float32).T).astype(dt)

    def v(name):
        return jnp.asarray(np.asarray(sd[name], np.float32)).astype(dt)

    def lin(name):
        return {"w": t(f"{name}.weight"), "b": v(f"{name}.bias")}

    def block(i: int, dual: bool, last: bool):
        pre = f"transformer_blocks.{i}"
        out = {
            "norm1": lin(f"{pre}.norm1.linear"),
            "norm1_context": lin(f"{pre}.norm1_context.linear"),
            "attn": {
                "to_q": lin(f"{pre}.attn.to_q"),
                "to_k": lin(f"{pre}.attn.to_k"),
                "to_v": lin(f"{pre}.attn.to_v"),
                "add_q": lin(f"{pre}.attn.add_q_proj"),
                "add_k": lin(f"{pre}.attn.add_k_proj"),
                "add_v": lin(f"{pre}.attn.add_v_proj"),
                "norm_q": _qk(sd, f"{pre}.attn.norm_q.weight", c, dt),
                "norm_k": _qk(sd, f"{pre}.attn.norm_k.weight", c, dt),
                "norm_added_q": _qk(sd, f"{pre}.attn.norm_added_q.weight",
                                    c, dt),
                "norm_added_k": _qk(sd, f"{pre}.attn.norm_added_k.weight",
                                    c, dt),
                "to_out": lin(f"{pre}.attn.to_out.0"),
            },
            "ff": {"fc1": lin(f"{pre}.ff.net.0.proj"),
                   "fc2": lin(f"{pre}.ff.net.2")},
        }
        if not last:
            out["attn"]["to_add_out"] = lin(f"{pre}.attn.to_add_out")
            out["ff_context"] = {"fc1": lin(f"{pre}.ff_context.net.0.proj"),
                                 "fc2": lin(f"{pre}.ff_context.net.2")}
        if dual:
            out["attn2"] = {
                "to_q": lin(f"{pre}.attn2.to_q"),
                "to_k": lin(f"{pre}.attn2.to_k"),
                "to_v": lin(f"{pre}.attn2.to_v"),
                "norm_q": _qk(sd, f"{pre}.attn2.norm_q.weight", c, dt),
                "norm_k": _qk(sd, f"{pre}.attn2.norm_k.weight", c, dt),
                "to_out": lin(f"{pre}.attn2.to_out.0"),
            }
        return out

    def stack(blocks: list[dict]) -> dict:
        import jax

        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    # patch embed conv [dim, C, p, p] -> linear [(ph, pw, C) x dim]
    conv = np.asarray(sd["pos_embed.proj.weight"], np.float32)
    patch_w = conv.transpose(2, 3, 1, 0).reshape(p * p * c.in_channels, -1)
    pos = np.asarray(sd["pos_embed.pos_embed"], np.float32).reshape(
        c.pos_embed_max_size * c.pos_embed_max_size, -1)

    params: dict[str, Any] = {
        "patch_proj": {"w": jnp.asarray(patch_w).astype(dt),
                       "b": v("pos_embed.proj.bias")},
        "pos_embed": jnp.asarray(pos, jnp.float32),
        "time_embed": {
            "fc1": lin("time_text_embed.timestep_embedder.linear_1"),
            "fc2": lin("time_text_embed.timestep_embedder.linear_2")},
        "text_embed": {
            "fc1": lin("time_text_embed.text_embedder.linear_1"),
            "fc2": lin("time_text_embed.text_embedder.linear_2")},
        "context_embedder": lin("context_embedder"),
        "norm_out": lin("norm_out.linear"),
        "proj_out": lin("proj_out"),
    }
    L = c.num_layers
    n_dual = model.n_dual
    if n_dual:
        params["dual_blocks"] = stack(
            [block(i, dual=True, last=False) for i in range(n_dual)])
    if model.n_std:
        params["std_blocks"] = stack(
            [block(i, dual=False, last=False)
             for i in range(n_dual, L - 1)])
    params["last_block"] = block(L - 1, dual=False, last=True)
    return params


def _qk(sd, name, c, dt):
    if name in sd:
        return jnp.asarray(np.asarray(sd[name], np.float32)).astype(dt)
    # qk_norm disabled in the checkpoint -> identity norm weights; the
    # forward gates application on cfg.qk_norm, added-stream norms are
    # always applied so identity is the right neutral value
    return jnp.ones((c.attention_head_dim,), dt)


def read_sd3_configs(model_root: str, tf_cfg, vae_cfg, sched_cfg):
    """Read transformer/vae/scheduler configs from a diffusers dir."""
    from vllm_omni_tpu.diffusion.models.common.autoencoder_kl import (
        AutoencoderKLConfig,
    )
    from vllm_omni_tpu.diffusion.models.sd3.transformer import (
        SD3TransformerConfig,
    )

    def read_cfg(sub, name="config.json"):
        fp = os.path.join(model_root, sub, name)
        if os.path.isfile(fp):
            with open(fp) as f:
                return json.load(f)
        return None

    tc = read_cfg("transformer")
    if tc is not None:
        tf_cfg = SD3TransformerConfig.from_hf(tc)
    vc = read_cfg("vae")
    if vc is not None:
        vae_cfg = AutoencoderKLConfig.from_hf(vc)
    sc = read_cfg("scheduler", "scheduler_config.json")
    if sc is not None:
        sched_cfg = sc
    return tf_cfg, vae_cfg, sched_cfg


def load_sd3_weights(model_root: str, pipeline) -> dict[str, Any]:
    """Load transformer + VAE weights from a diffusers dir."""
    return {
        "transformer": load_sd3_transformer_weights(
            model_root, pipeline.transformer,
            od_config=getattr(pipeline, "od_config", None)),
        "vae": pipeline.vae.load_from_state_dict(
            _read_safetensors(os.path.join(model_root, "vae"))),
    }
