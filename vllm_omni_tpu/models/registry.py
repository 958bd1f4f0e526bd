"""Model registry.

Parity: OmniModelRegistry lazy arch→(module, class) mapping
(reference model_executor/models/registry.py:59-76) and
DiffusionModelRegistry (reference diffusion/registry.py:70-78).
Here both AR and diffusion archs resolve through one table to a
`Model` object exposing: config_cls-free functional API
(init_params / load_weights / forward / compute_logits).
"""

from __future__ import annotations

import importlib
import json
import os
from typing import Any, Optional

# arch name -> (module under vllm_omni_tpu.models, attribute)
_AR_MODELS: dict[str, tuple[str, str]] = {
    "Qwen2ForCausalLM": ("qwen2", "Qwen2ForCausalLM"),
    "Qwen3ForCausalLM": ("qwen3", "Qwen3ForCausalLM"),
    "Qwen3MoeForCausalLM": ("qwen3_moe", "Qwen3MoeForCausalLM"),
    "Qwen2_5OmniForConditionalGeneration": (
        "qwen2_5_omni.qwen2_5_omni",
        "Qwen2_5OmniForConditionalGeneration",
    ),
    "Qwen2_5OmniThinkerForConditionalGeneration": (
        "qwen2_5_omni.thinker",
        "Qwen2_5OmniThinkerForConditionalGeneration",
    ),
    "Qwen2_5OmniTalkerForConditionalGeneration": (
        "qwen2_5_omni.talker",
        "Qwen2_5OmniTalkerForConditionalGeneration",
    ),
    "Qwen2_5OmniToken2WavModel": (
        "qwen2_5_omni.token2wav",
        "Qwen2_5OmniToken2WavModel",
    ),
    "Qwen3OmniMoeForConditionalGeneration": (
        "qwen3_omni.qwen3_omni",
        "Qwen3OmniMoeForConditionalGeneration",
    ),
    "Qwen3OmniMoeThinkerForConditionalGeneration": (
        "qwen3_omni.thinker",
        "Qwen3OmniMoeThinkerForConditionalGeneration",
    ),
}

# diffusion pipeline class name (model_index.json _class_name) -> module
_DIFFUSION_PIPELINES: dict[str, tuple[str, str]] = {
    "QwenImagePipeline": ("qwen_image", "QwenImagePipeline"),
    "QwenImageEditPipeline": ("qwen_image", "QwenImageEditPipeline"),
    "QwenImageEditPlusPipeline": ("qwen_image", "QwenImageEditPlusPipeline"),
    "QwenImageLayeredPipeline": ("qwen_image", "QwenImageLayeredPipeline"),
    "StableDiffusion3Pipeline": ("sd3", "StableDiffusion3Pipeline"),
    "WanPipeline": ("wan2_2", "WanPipeline"),
    "WanImageToVideoPipeline": ("wan2_2", "WanImageToVideoPipeline"),
    "ZImagePipeline": ("z_image", "ZImagePipeline"),
    "OvisImagePipeline": ("ovis_image", "OvisImagePipeline"),
    "LongCatImagePipeline": ("longcat_image", "LongCatImagePipeline"),
    "LongcatImageEditPipeline": ("longcat_image", "LongcatImageEditPipeline"),
}


def resolve_ar_model(arch: str):
    if arch not in _AR_MODELS:
        raise ValueError(
            f"Unsupported AR architecture {arch!r}; known: {sorted(_AR_MODELS)}"
        )
    mod_name, attr = _AR_MODELS[arch]
    mod = importlib.import_module(f"vllm_omni_tpu.models.{mod_name}")
    return getattr(mod, attr)


def resolve_diffusion_pipeline(class_name: str):
    if class_name not in _DIFFUSION_PIPELINES:
        raise ValueError(
            f"Unsupported diffusion pipeline {class_name!r}; "
            f"known: {sorted(_DIFFUSION_PIPELINES)}"
        )
    mod_name, attr = _DIFFUSION_PIPELINES[class_name]
    mod = importlib.import_module(f"vllm_omni_tpu.diffusion.models.{mod_name}")
    return getattr(mod, attr)


def register_ar_model(arch: str, module: str, attr: str) -> None:
    _AR_MODELS[arch] = (module, attr)


def register_diffusion_pipeline(name: str, module: str, attr: str) -> None:
    _DIFFUSION_PIPELINES[name] = (module, attr)


def is_diffusion_model_dir(model_path: str) -> bool:
    """A diffusers-style model dir has model_index.json
    (reference omni_diffusion.py:51-61)."""
    return os.path.isfile(os.path.join(model_path, "model_index.json"))


def pipeline_class_from_model_index(model_path: str) -> Optional[str]:
    p = os.path.join(model_path, "model_index.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return json.load(f).get("_class_name")


def default_stage_yaml_for_model(model_path: str) -> Optional[str]:
    """Built-in stage YAML for known omni model families.

    Parity: reference ships per-model YAMLs under
    model_executor/stage_configs/ and resolves them by model name.
    """
    name = os.path.basename(os.path.normpath(model_path)).lower()
    here = os.path.join(os.path.dirname(__file__), "..", "stage_configs")
    table = {
        "qwen3-omni": "qwen3_omni_moe.yaml",
        "qwen2.5-omni": "qwen2_5_omni.yaml",
        "qwen2_5-omni": "qwen2_5_omni.yaml",
    }
    for key, fname in table.items():
        if key in name:
            p = os.path.abspath(os.path.join(here, fname))
            if os.path.isfile(p):
                return p
    return None
