"""Diffusers checkpoint -> JAX pytree mapping for QwenImage.

Parity role: DiffusersPipelineLoader component sources (reference
model_loader/diffusers_loader.py:36-228). Reads the `transformer/` and
`vae/` subfolders of a diffusers model dir.
"""

from __future__ import annotations

import os
import re
from typing import Any

import numpy as np

import jax.numpy as jnp

from vllm_omni_tpu.models.weight_loader import iter_safetensors


def _collect(path: str) -> dict[str, np.ndarray]:
    return {name: arr for name, arr in iter_safetensors(path)}


_BLOCK_RE = re.compile(r"^transformer_blocks\.(\d+)\.(.+)$")

# diffusers sub-name -> (our key path inside blocks, transpose)
_BLOCK_MAP = {
    "img_mod.1.weight": ("img_mod.w", True),
    "img_mod.1.bias": ("img_mod.b", False),
    "txt_mod.1.weight": ("txt_mod.w", True),
    "txt_mod.1.bias": ("txt_mod.b", False),
    "attn.to_q.weight": ("attn.to_q.w", True),
    "attn.to_q.bias": ("attn.to_q.b", False),
    "attn.to_k.weight": ("attn.to_k.w", True),
    "attn.to_k.bias": ("attn.to_k.b", False),
    "attn.to_v.weight": ("attn.to_v.w", True),
    "attn.to_v.bias": ("attn.to_v.b", False),
    "attn.add_q_proj.weight": ("attn.add_q.w", True),
    "attn.add_q_proj.bias": ("attn.add_q.b", False),
    "attn.add_k_proj.weight": ("attn.add_k.w", True),
    "attn.add_k_proj.bias": ("attn.add_k.b", False),
    "attn.add_v_proj.weight": ("attn.add_v.w", True),
    "attn.add_v_proj.bias": ("attn.add_v.b", False),
    "attn.norm_q.weight": ("attn.norm_q", False),
    "attn.norm_k.weight": ("attn.norm_k", False),
    "attn.norm_added_q.weight": ("attn.norm_added_q", False),
    "attn.norm_added_k.weight": ("attn.norm_added_k", False),
    "attn.to_out.0.weight": ("attn.to_out.w", True),
    "attn.to_out.0.bias": ("attn.to_out.b", False),
    "attn.to_add_out.weight": ("attn.to_add_out.w", True),
    "attn.to_add_out.bias": ("attn.to_add_out.b", False),
    "img_mlp.net.0.proj.weight": ("img_mlp.fc1.w", True),
    "img_mlp.net.0.proj.bias": ("img_mlp.fc1.b", False),
    "img_mlp.net.2.weight": ("img_mlp.fc2.w", True),
    "img_mlp.net.2.bias": ("img_mlp.fc2.b", False),
    "txt_mlp.net.0.proj.weight": ("txt_mlp.fc1.w", True),
    "txt_mlp.net.0.proj.bias": ("txt_mlp.fc1.b", False),
    "txt_mlp.net.2.weight": ("txt_mlp.fc2.w", True),
    "txt_mlp.net.2.bias": ("txt_mlp.fc2.b", False),
}

_TOP_MAP = {
    "img_in.weight": ("img_in.w", True),
    "img_in.bias": ("img_in.b", False),
    "txt_in.weight": ("txt_in.w", True),
    "txt_in.bias": ("txt_in.b", False),
    "txt_norm.weight": ("txt_norm", False),
    "time_text_embed.timestep_embedder.linear_1.weight": ("time_embed.mlp1.w", True),
    "time_text_embed.timestep_embedder.linear_1.bias": ("time_embed.mlp1.b", False),
    "time_text_embed.timestep_embedder.linear_2.weight": ("time_embed.mlp2.w", True),
    "time_text_embed.timestep_embedder.linear_2.bias": ("time_embed.mlp2.b", False),
    "time_text_embed.addition_t_embedding.weight": ("addition_t_embedding", False),
    "norm_out.linear.weight": ("norm_out.w", True),
    "norm_out.linear.bias": ("norm_out.b", False),
    "proj_out.weight": ("proj_out.w", True),
    "proj_out.bias": ("proj_out.b", False),
}


def _set_path(tree: dict, dotted: str, value):
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def load_qwen_image_transformer_weights(
    model_dir: str, cfg, dtype, prefix: str = "", od_config=None
) -> dict[str, Any]:
    from vllm_omni_tpu.diffusion.lora import merge_lora_for

    sub = os.path.join(model_dir, "transformer")
    tensors = _collect(sub if os.path.isdir(sub) else model_dir)
    tensors = merge_lora_for(tensors, od_config)
    L = cfg.num_layers
    out: dict[str, Any] = {}
    per_layer: dict[str, dict[int, np.ndarray]] = {}
    for name, arr in tensors.items():
        if prefix and name.startswith(prefix):
            name = name[len(prefix):]
        m = _BLOCK_RE.match(name)
        if m:
            li, sub_name = int(m.group(1)), m.group(2)
            if sub_name in _BLOCK_MAP:
                key, transpose = _BLOCK_MAP[sub_name]
                per_layer.setdefault(key, {})[li] = arr.T if transpose else arr
        elif name in _TOP_MAP:
            key, transpose = _TOP_MAP[name]
            _set_path(out, key, jnp.asarray(arr.T if transpose else arr, dtype))
    blocks: dict[str, Any] = {}
    for key, by_layer in per_layer.items():
        if len(by_layer) != L:
            raise ValueError(f"{key}: {len(by_layer)} layers, expected {L}")
        stacked = np.stack([by_layer[i] for i in range(L)])
        _set_path(blocks, key, jnp.asarray(stacked, dtype))
    out["blocks"] = blocks
    return out


def load_qwen_image_vae_weights(model_dir: str, cfg, dtype) -> dict[str, Any]:
    """diffusers AutoencoderKLQwenImage state dict -> our functional tree.

    Name scheme (reference autoencoder_kl_qwenimage.py): encoder
    `down_blocks` is a FLAT ModuleList interleaving residual blocks and
    resamples (`:416-430`); decoder nests `up_blocks.{i}.resnets.{r}` +
    `.upsamplers.0` (`:480-519,118-138`); RMS norms store `gamma` with
    trailing broadcast dims (`:86-105`); resample convs sit at Sequential
    index 1 behind a ZeroPad2d/Upsample (`:148-163`).
    """
    sub = os.path.join(model_dir, "vae")
    t = _collect(sub if os.path.isdir(sub) else model_dir)

    def conv(pfx):
        return {"w": jnp.asarray(t[pfx + ".weight"], dtype),
                "b": jnp.asarray(t[pfx + ".bias"], dtype)}

    def gamma(name):
        return jnp.asarray(np.asarray(t[name]).reshape(-1), dtype)

    def res(pfx):
        p = {"norm1": gamma(pfx + ".norm1.gamma"),
             "conv1": conv(pfx + ".conv1"),
             "norm2": gamma(pfx + ".norm2.gamma"),
             "conv2": conv(pfx + ".conv2")}
        if pfx + ".conv_shortcut.weight" in t:
            p["shortcut"] = conv(pfx + ".conv_shortcut")
        return p

    def mid(pfx):
        return {
            "res0": res(pfx + ".resnets.0"),
            "attn": {"norm": gamma(pfx + ".attentions.0.norm.gamma"),
                     "qkv": conv(pfx + ".attentions.0.to_qkv"),
                     "proj": conv(pfx + ".attentions.0.proj")},
            "res1": res(pfx + ".resnets.1"),
        }

    n_stages = len(cfg.dim_mult)
    enc_blocks = []
    j = 0
    for i in range(n_stages):
        stage = {"res": []}
        for _ in range(cfg.num_res_blocks):
            stage["res"].append(res(f"encoder.down_blocks.{j}"))
            j += 1
        if i != n_stages - 1:
            pfx = f"encoder.down_blocks.{j}"
            j += 1
            stage["down"] = conv(pfx + ".resample.1")
            if pfx + ".time_conv.weight" in t:
                stage["time_down"] = conv(pfx + ".time_conv")
        enc_blocks.append(stage)
    encoder = {
        "conv_in": conv("encoder.conv_in"),
        "blocks": enc_blocks,
        "mid": mid("encoder.mid_block"),
        "norm_out": gamma("encoder.norm_out.gamma"),
        "conv_out": conv("encoder.conv_out"),
    }
    dec_blocks = []
    for i in range(n_stages):
        pfx = f"decoder.up_blocks.{i}"
        stage = {"res": [res(f"{pfx}.resnets.{r}")
                         for r in range(cfg.num_res_blocks + 1)]}
        up = f"{pfx}.upsamplers.0"
        if up + ".resample.1.weight" in t:
            stage["up"] = conv(up + ".resample.1")
            if up + ".time_conv.weight" in t:
                stage["time_up"] = conv(up + ".time_conv")
        dec_blocks.append(stage)
    decoder = {
        "conv_in": conv("decoder.conv_in"),
        "mid": mid("decoder.mid_block"),
        "blocks": dec_blocks,
        "norm_out": gamma("decoder.norm_out.gamma"),
        "conv_out": conv("decoder.conv_out"),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
    }
