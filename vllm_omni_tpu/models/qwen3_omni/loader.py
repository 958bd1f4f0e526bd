"""Weight loading for Qwen3-Omni component models (prefix routing)."""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np

from vllm_omni_tpu.models.weight_loader import iter_safetensors


def split_thinker_tensors(tensors):
    audio_sd: dict[str, np.ndarray] = {}
    visual_sd: dict[str, np.ndarray] = {}
    text: list[tuple[str, np.ndarray]] = []
    for name, arr in tensors:
        if name.startswith("thinker."):
            name = name[len("thinker."):]
        if name.startswith("audio_tower."):
            audio_sd[name[len("audio_tower."):]] = arr
        elif name.startswith("visual."):
            visual_sd[name[len("visual."):]] = arr
        elif name.startswith(("model.", "lm_head.")):
            text.append((name, arr))
    return audio_sd, visual_sd, text


def thinker_params_from_tensors(model, tensors) -> dict[str, Any]:
    from vllm_omni_tpu.models.weight_loader import load_qwen_moe_weights

    audio_sd, visual_sd, text = split_thinker_tensors(tensors)
    # MoE text params assembled from the in-memory tensor list
    import tempfile, os
    from vllm_omni_tpu.models import weight_loader as wl

    # reuse the MoE assembly by monkey-free direct call: mimic
    # iter_safetensors with the collected list
    params_text = _moe_params_from_list(model, text)
    return {
        "text": params_text,
        "audio": model.audio.load_from_state_dict(audio_sd),
        "visual": model.visual.load_from_state_dict(visual_sd),
    }


def _moe_params_from_list(model, tensors):
    """Qwen3-MoE param assembly from (name, array) pairs."""
    import vllm_omni_tpu.models.weight_loader as wl
    import jax.numpy as jnp

    t = model.text
    per_layer = {}
    experts = {}
    routers = {}
    top = {}
    attn_keys = {k: v for k, v in wl._DECODER_MAP.items()
                 if not k.startswith("mlp.")}
    for name, arr in tensors:
        m = wl._EXPERT_RE.match(name)
        if m:
            li, ei, proj = int(m.group(1)), int(m.group(2)), m.group(3)
            experts.setdefault(wl._EXPERT_KEY[proj], {})[(li, ei)] = arr.T
            continue
        m = wl._ROUTER_RE.match(name)
        if m:
            routers[int(m.group(1))] = arr.T
            continue
        m = wl._LAYER_RE.match(name)
        if m and m.group(2) in attn_keys:
            key, transpose = attn_keys[m.group(2)]
            per_layer.setdefault(key, {})[int(m.group(1))] = (
                arr.T if transpose else arr)
            continue
        m = wl._LAYER_BIAS_RE.match(name)
        if m and m.group(2) in wl._BIAS_MAP:
            per_layer.setdefault(wl._BIAS_MAP[m.group(2)], {})[
                int(m.group(1))] = arr
            continue
        if name in ("model.embed_tokens.weight",):
            top["embed_tokens"] = arr
        elif name in ("model.norm.weight",):
            top["norm"] = arr
        elif name == "lm_head.weight":
            top["lm_head"] = arr.T

    dtype = t.dtype
    layers = {}
    for key, by_layer in per_layer.items():
        layers[key] = jnp.asarray(
            np.stack([by_layer[i] for i in range(t.L)]), dtype)
    layers["router"] = jnp.asarray(
        np.stack([routers[i] for i in range(t.L)]), dtype)
    for key, by_le in experts.items():
        layers[key] = jnp.asarray(np.stack([
            np.stack([by_le[(li, ei)] for ei in range(t.E)])
            for li in range(t.L)
        ]), dtype)
    params = {
        "embed_tokens": jnp.asarray(top["embed_tokens"], dtype),
        "norm": jnp.asarray(top["norm"], dtype),
        "layers": layers,
    }
    if not t.tie_embeddings and "lm_head" in top:
        params["lm_head"] = jnp.asarray(top["lm_head"], dtype)
    return params


def load_thinker_weights(model, path: str) -> dict[str, Any]:
    return thinker_params_from_tensors(model, iter_safetensors(path))
