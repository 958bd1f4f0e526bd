"""HF safetensors → stacked JAX pytrees.

TPU-native replacement for the vLLM weight loader + DiffusersPipelineLoader
component sources the reference relies on (SURVEY.md §5 "Checkpoint /
resume"; reference diffusers_loader.py:36-228). HF stores linear weights
[out, in]; we transpose to [in, out] and stack per-layer tensors along a
leading L axis for scanned decoders.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Callable, Iterator, Optional

import numpy as np

import jax.numpy as jnp

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


def iter_safetensors(path: str, prefix: str = "") -> Iterator[tuple[str, np.ndarray]]:
    """Yield (name, array) from every *.safetensors under `path`, filtered
    and stripped by `prefix`."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors under {path}")
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for name in sf.keys():
                if prefix and not name.startswith(prefix):
                    continue
                yield name[len(prefix):], sf.get_tensor(name)


_LAYER_RE = re.compile(r"^(?:model\.)?layers\.(\d+)\.(.+)\.weight$")
_LAYER_BIAS_RE = re.compile(r"^(?:model\.)?layers\.(\d+)\.(.+)\.bias$")

# HF sub-path -> (stacked key, transpose?)
_DECODER_MAP = {
    "input_layernorm": ("input_layernorm", False),
    "post_attention_layernorm": ("post_attention_layernorm", False),
    "self_attn.q_proj": ("q_proj", True),
    "self_attn.k_proj": ("k_proj", True),
    "self_attn.v_proj": ("v_proj", True),
    "self_attn.o_proj": ("o_proj", True),
    "self_attn.q_norm": ("q_norm", False),
    "self_attn.k_norm": ("k_norm", False),
    "mlp.gate_proj": ("gate_proj", True),
    "mlp.up_proj": ("up_proj", True),
    "mlp.down_proj": ("down_proj", True),
}
_BIAS_MAP = {
    "self_attn.q_proj": "q_bias",
    "self_attn.k_proj": "k_bias",
    "self_attn.v_proj": "v_bias",
}


def load_qwen_decoder_weights(
    path: str,
    num_layers: int,
    dtype,
    qkv_bias: bool = True,
    qk_norm: bool = False,
    tie_embeddings: bool = False,
    prefix: str = "",
) -> dict[str, Any]:
    """Assemble a scanned Qwen2/Qwen3 param pytree from HF safetensors."""
    return decoder_params_from_tensors(
        iter_safetensors(path, prefix=prefix),
        num_layers=num_layers, dtype=dtype, tie_embeddings=tie_embeddings,
        source=path,
    )


def decoder_params_from_tensors(
    tensors,
    num_layers: int,
    dtype,
    tie_embeddings: bool = False,
    source: str = "<tensors>",
) -> dict[str, Any]:
    per_layer: dict[str, dict[int, np.ndarray]] = {}
    top: dict[str, np.ndarray] = {}
    for name, arr in tensors:
        m = _LAYER_RE.match(name)
        if m:
            li, sub = int(m.group(1)), m.group(2)
            if sub in _DECODER_MAP:
                key, transpose = _DECODER_MAP[sub]
                per_layer.setdefault(key, {})[li] = arr.T if transpose else arr
            continue
        m = _LAYER_BIAS_RE.match(name)
        if m:
            li, sub = int(m.group(1)), m.group(2)
            if sub in _BIAS_MAP:
                per_layer.setdefault(_BIAS_MAP[sub], {})[li] = arr
            continue
        if name in ("model.embed_tokens.weight", "embed_tokens.weight"):
            top["embed_tokens"] = arr
        elif name in ("model.norm.weight", "norm.weight"):
            top["norm"] = arr
        elif name == "lm_head.weight":
            top["lm_head"] = arr.T

    layers: dict[str, Any] = {}
    for key, by_layer in per_layer.items():
        if len(by_layer) != num_layers:
            raise ValueError(
                f"{key}: found {len(by_layer)} layers, expected {num_layers}"
            )
        stacked = np.stack([by_layer[i] for i in range(num_layers)])
        layers[key] = jnp.asarray(stacked, dtype)

    params: dict[str, Any] = {
        "embed_tokens": jnp.asarray(top["embed_tokens"], dtype),
        "norm": jnp.asarray(top["norm"], dtype),
        "layers": layers,
    }
    if not tie_embeddings:
        if "lm_head" in top:
            params["lm_head"] = jnp.asarray(top["lm_head"], dtype)
    logger.info(
        "loaded %d decoder layers from %s (%d top-level tensors)",
        num_layers, source, len(top),
    )
    return params


_EXPERT_RE = re.compile(
    r"^(?:model\.)?layers\.(\d+)\.mlp\.experts\.(\d+)\.(gate_proj|up_proj|down_proj)\.weight$"
)
_ROUTER_RE = re.compile(r"^(?:model\.)?layers\.(\d+)\.mlp\.gate\.weight$")

_EXPERT_KEY = {
    "gate_proj": "experts_gate",
    "up_proj": "experts_up",
    "down_proj": "experts_down",
}


def load_qwen_moe_weights(
    path: str,
    num_layers: int,
    num_experts: int,
    dtype,
    qk_norm: bool = True,
    tie_embeddings: bool = False,
    prefix: str = "",
) -> dict[str, Any]:
    """Qwen3-MoE: attention stack as load_qwen_decoder_weights plus
    per-layer router [H, E] and stacked expert weights [L, E, in, out]."""
    per_layer: dict[str, dict[int, np.ndarray]] = {}
    experts: dict[str, dict[tuple[int, int], np.ndarray]] = {}
    routers: dict[int, np.ndarray] = {}
    top: dict[str, np.ndarray] = {}
    attn_keys = {k: v for k, v in _DECODER_MAP.items() if not k.startswith("mlp.")}
    for name, arr in iter_safetensors(path, prefix=prefix):
        m = _EXPERT_RE.match(name)
        if m:
            li, ei, proj = int(m.group(1)), int(m.group(2)), m.group(3)
            experts.setdefault(_EXPERT_KEY[proj], {})[(li, ei)] = arr.T
            continue
        m = _ROUTER_RE.match(name)
        if m:
            routers[int(m.group(1))] = arr.T  # [H, E]
            continue
        m = _LAYER_RE.match(name)
        if m and m.group(2) in attn_keys:
            key, transpose = attn_keys[m.group(2)]
            per_layer.setdefault(key, {})[int(m.group(1))] = (
                arr.T if transpose else arr)
            continue
        m = _LAYER_BIAS_RE.match(name)
        if m and m.group(2) in _BIAS_MAP:
            per_layer.setdefault(_BIAS_MAP[m.group(2)], {})[int(m.group(1))] = arr
            continue
        if name in ("model.embed_tokens.weight", "embed_tokens.weight"):
            top["embed_tokens"] = arr
        elif name in ("model.norm.weight", "norm.weight"):
            top["norm"] = arr
        elif name == "lm_head.weight":
            top["lm_head"] = arr.T

    layers: dict[str, Any] = {}
    for key, by_layer in per_layer.items():
        if len(by_layer) != num_layers:
            raise ValueError(f"{key}: {len(by_layer)}/{num_layers} layers")
        layers[key] = jnp.asarray(
            np.stack([by_layer[i] for i in range(num_layers)]), dtype)
    if len(routers) != num_layers:
        raise ValueError(f"router: {len(routers)}/{num_layers} layers")
    layers["router"] = jnp.asarray(
        np.stack([routers[i] for i in range(num_layers)]), dtype)
    for key, by_le in experts.items():
        stacked = np.stack([
            np.stack([by_le[(li, ei)] for ei in range(num_experts)])
            for li in range(num_layers)
        ])  # [L, E, in, out]
        layers[key] = jnp.asarray(stacked, dtype)

    params: dict[str, Any] = {
        "embed_tokens": jnp.asarray(top["embed_tokens"], dtype),
        "norm": jnp.asarray(top["norm"], dtype),
        "layers": layers,
    }
    if not tie_embeddings and "lm_head" in top:
        params["lm_head"] = jnp.asarray(top["lm_head"], dtype)
    return params


def save_params_as_safetensors(params: dict[str, Any], path: str, num_layers: int):
    """Inverse of load_qwen_decoder_weights — used by tests to synthesize
    HF-format checkpoints from random params."""
    from safetensors.numpy import save_file

    out: dict[str, np.ndarray] = {}
    inv = {v[0]: (k, v[1]) for k, v in _DECODER_MAP.items()}
    inv_bias = {v: k for k, v in _BIAS_MAP.items()}
    for key, arr in params["layers"].items():
        arr = np.asarray(arr.astype(jnp.float32))
        for li in range(num_layers):
            a = arr[li]
            if key in inv:
                sub, transpose = inv[key]
                out[f"model.layers.{li}.{sub}.weight"] = a.T if transpose else a
            elif key in inv_bias:
                out[f"model.layers.{li}.{inv_bias[key]}.bias"] = a
    out["model.embed_tokens.weight"] = np.asarray(
        params["embed_tokens"].astype(jnp.float32))
    out["model.norm.weight"] = np.asarray(params["norm"].astype(jnp.float32))
    if "lm_head" in params:
        out["lm_head.weight"] = np.asarray(params["lm_head"].astype(jnp.float32)).T
    os.makedirs(path, exist_ok=True)
    save_file(out, os.path.join(path, "model.safetensors"))
