"""Z-Image checkpoint loader (reference z_image_transformer.py:670-698
load_weights name mapping, un-fused here)."""

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


def z_image_params_from_state_dict(model, sd: dict[str, Any]):
    c = model.cfg
    dt = model.dtype

    def t(name):
        return jnp.asarray(np.asarray(sd[name], np.float32).T).astype(dt)

    def v(name):
        return jnp.asarray(np.asarray(sd[name], np.float32)).astype(dt)

    def block_stack(prefix, n, modulation):
        def stack_t(fmt):
            return jnp.stack([t(fmt.format(i)) for i in range(n)])

        def stack_v(fmt):
            return jnp.stack([v(fmt.format(i)) for i in range(n)])

        p = {
            "to_q": {"w": stack_t(f"{prefix}.{{}}.attention.to_q.weight")},
            "to_k": {"w": stack_t(f"{prefix}.{{}}.attention.to_k.weight")},
            "to_v": {"w": stack_t(f"{prefix}.{{}}.attention.to_v.weight")},
            "to_out": {"w": stack_t(
                f"{prefix}.{{}}.attention.to_out.0.weight")},
            "norm_q": stack_v(f"{prefix}.{{}}.attention.norm_q.weight"),
            "norm_k": stack_v(f"{prefix}.{{}}.attention.norm_k.weight"),
            "w1": {"w": stack_t(f"{prefix}.{{}}.feed_forward.w1.weight")},
            "w3": {"w": stack_t(f"{prefix}.{{}}.feed_forward.w3.weight")},
            "w2": {"w": stack_t(f"{prefix}.{{}}.feed_forward.w2.weight")},
            "attention_norm1": stack_v(
                f"{prefix}.{{}}.attention_norm1.weight"),
            "attention_norm2": stack_v(
                f"{prefix}.{{}}.attention_norm2.weight"),
            "ffn_norm1": stack_v(f"{prefix}.{{}}.ffn_norm1.weight"),
            "ffn_norm2": stack_v(f"{prefix}.{{}}.ffn_norm2.weight"),
        }
        if modulation:
            p["adaln"] = {
                "w": stack_t(f"{prefix}.{{}}.adaLN_modulation.0.weight"),
                "b": stack_v(f"{prefix}.{{}}.adaLN_modulation.0.bias"),
            }
        return p

    key = f"{c.patch_size}-{c.f_patch_size}"
    return {
        "x_embedder": {"w": t(f"all_x_embedder.{key}.weight"),
                       "b": v(f"all_x_embedder.{key}.bias")},
        "final": {
            "linear": {"w": t(f"all_final_layer.{key}.linear.weight"),
                       "b": v(f"all_final_layer.{key}.linear.bias")},
            "adaln": {
                "w": t(f"all_final_layer.{key}.adaLN_modulation.1.weight"),
                "b": v(f"all_final_layer.{key}.adaLN_modulation.1.bias")},
        },
        "t_embedder": {
            "fc1": {"w": t("t_embedder.mlp.0.weight"),
                    "b": v("t_embedder.mlp.0.bias")},
            "fc2": {"w": t("t_embedder.mlp.2.weight"),
                    "b": v("t_embedder.mlp.2.bias")},
        },
        "cap_embedder": {
            "norm": v("cap_embedder.0.weight"),
            "proj": {"w": t("cap_embedder.1.weight"),
                     "b": v("cap_embedder.1.bias")},
        },
        "x_pad_token": v("x_pad_token").reshape(-1),
        "cap_pad_token": v("cap_pad_token").reshape(-1),
        "noise_refiner": block_stack(
            "noise_refiner", c.n_refiner_layers, True),
        "context_refiner": block_stack(
            "context_refiner", c.n_refiner_layers, False),
        "layers": block_stack("layers", c.n_layers, True),
    }


def load_z_image_transformer_weights(path: str, model,
                                     subfolder: str = "transformer",
                                     od_config=None):
    from vllm_omni_tpu.diffusion.lora import merge_lora_for

    sub = os.path.join(path, subfolder)
    root = sub if os.path.isdir(sub) else path
    return z_image_params_from_state_dict(
        model, merge_lora_for(_read_safetensors(root), od_config))


def read_z_image_configs(model_root: str, tf_cfg, vae_cfg, sched_cfg):
    from vllm_omni_tpu.diffusion.models.common.autoencoder_kl import (
        AutoencoderKLConfig,
    )
    from vllm_omni_tpu.diffusion.models.z_image.transformer import (
        ZImageTransformerConfig,
    )

    def read(sub, name="config.json"):
        fp = os.path.join(model_root, sub, name)
        if os.path.isfile(fp):
            with open(fp) as f:
                return json.load(f)
        return None

    tc = read("transformer")
    if tc is not None:
        tf_cfg = ZImageTransformerConfig.from_hf(tc)
    vc = read("vae")
    if vc is not None:
        vae_cfg = AutoencoderKLConfig.from_hf(vc)
    sc = read("scheduler", "scheduler_config.json")
    if sc is not None:
        sched_cfg = sc
    return tf_cfg, vae_cfg, sched_cfg
