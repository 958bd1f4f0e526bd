"""Weight loading for Qwen2.5-Omni component models.

Routes HF checkpoint tensors by prefix into the thinker's three towers.
Accepts both the full omni layout (thinker.audio_tower.*, thinker.visual.*,
thinker.model.*) and standalone-thinker layouts (audio_tower.* / visual.* /
model.*). Reference analogue: per-model load_weights
(reference qwen2_5_omni_thinker.py) over vLLM's loader.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np

from vllm_omni_tpu.models.weight_loader import (
    decoder_params_from_tensors,
    iter_safetensors,
)


def split_thinker_tensors(
    tensors: Iterable[tuple[str, np.ndarray]],
) -> tuple[dict, dict, list]:
    """-> (audio_sd, visual_sd, text_tensor_list)."""
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
    audio_sd, visual_sd, text = split_thinker_tensors(tensors)
    return {
        "text": decoder_params_from_tensors(
            text, num_layers=model.text.L, dtype=model.config.dtype,
            tie_embeddings=model.text.tie_embeddings,
        ),
        "audio": model.audio.load_from_state_dict(audio_sd),
        "visual": model.visual.load_from_state_dict(visual_sd),
    }


def load_thinker_weights(model, path: str) -> dict[str, Any]:
    return thinker_params_from_tensors(model, iter_safetensors(path))


def talker_params_from_tensors(model, tensors) -> dict[str, Any]:
    """HF talker layout: thinker_to_talker_proj.{weight,bias}, model.*,
    codec_head.weight (optionally under a 'talker.' prefix)."""
    import jax.numpy as jnp

    dt = model.dtype
    proj_w = proj_b = head = None
    text: list[tuple[str, np.ndarray]] = []
    for name, arr in tensors:
        if name.startswith("talker."):
            name = name[len("talker."):]
        if name == "thinker_to_talker_proj.weight":
            proj_w = jnp.asarray(np.asarray(arr).T, dt)
        elif name == "thinker_to_talker_proj.bias":
            proj_b = jnp.asarray(np.asarray(arr), dt)
        elif name == "codec_head.weight":
            head = jnp.asarray(np.asarray(arr).T, dt)
        elif name.startswith("model."):
            text.append((name, arr))
    params = decoder_params_from_tensors(
        text, num_layers=model.L, dtype=dt, tie_embeddings=True)
    params["thinker_to_talker_proj"] = {"w": proj_w, "b": proj_b}
    params["lm_head"] = head
    return params


def load_talker_weights(model, path: str) -> dict[str, Any]:
    return talker_params_from_tensors(model, iter_safetensors(path))
