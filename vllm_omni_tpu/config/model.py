"""Model configuration.

Parity: OmniModelConfig (reference vllm_omni/config/model.py:46-388):
`architectures` forced to `model_arch`, per-stage text config drawn via
`hf_config_name` (reference engine/arg_utils.py:47-63), tolerant of missing
processors for talker/code2wav stages. TPU-specific: dtype defaults to
bfloat16 and the hf config is a plain dict (no torch objects).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp

_DTYPE_MAP = {
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "float16": jnp.float16,
    "fp16": jnp.float16,
    "fp8": jnp.float8_e4m3fn,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "float8_e4m3fn": jnp.float8_e4m3fn,
    # int8 KV cache (per-slot scales, ops/quant.py quantize_kv) — the
    # fast capacity path on v5e: int8->bf16 converts are VPU-native,
    # while the fp8-e4m3 upcast is emulated (2.5-3x slower than bf16)
    "int8": jnp.int8,
    "auto": jnp.bfloat16,
}


def resolve_dtype(dtype: Any):
    if isinstance(dtype, str):
        try:
            return _DTYPE_MAP[dtype.lower()]
        except KeyError:
            raise ValueError(f"Unknown dtype {dtype!r}") from None
    return dtype


def load_hf_config(model_path: str) -> dict[str, Any]:
    """Load a HuggingFace config.json as a plain dict.

    Local-dir only (no hub downloads in this environment); synthesized
    configs may also be passed directly as dicts to ModelConfig.
    """
    cfg_path = os.path.join(model_path, "config.json")
    if not os.path.isfile(cfg_path):
        raise FileNotFoundError(f"No config.json under {model_path}")
    with open(cfg_path) as f:
        return json.load(f)


@dataclass
class ModelConfig:
    model: str = ""  # path or name; may be "" when hf_config given directly
    model_arch: Optional[str] = None  # forces architectures[0]
    model_stage: Optional[str] = None  # thinker | talker | code2wav | ...
    hf_config_name: str = ""  # sub-config key, e.g. "thinker_config"
    hf_config: Optional[dict[str, Any]] = None
    dtype: Any = "bfloat16"
    seed: int = 0
    max_model_len: Optional[int] = None
    # weight-only quantization of decoder projections ("int8" | None)
    quantization: Optional[str] = None
    # Output routing for the stage hosting this model
    # ("text" | "latent" | "audio" | "image"); reference arg_utils.py:26-177.
    engine_output_type: str = "text"
    tokenizer: Optional[str] = None
    trust_remote_code: bool = False

    def __post_init__(self) -> None:
        self.dtype = resolve_dtype(self.dtype)
        if self.hf_config is None:
            if not self.model:
                raise ValueError("ModelConfig needs `model` path or `hf_config`")
            self.hf_config = load_hf_config(self.model)
        if self.hf_config_name:
            # Draw a nested per-stage config, e.g. thinker_config inside the
            # omni config (reference engine/arg_utils.py:47-63).
            sub = self.hf_config.get(self.hf_config_name)
            if sub is None:
                raise ValueError(
                    f"hf_config_name={self.hf_config_name!r} not present in config"
                )
            merged = dict(sub)
            merged.setdefault("_parent_config", self.hf_config)
            self.hf_config = merged
        if self.model_arch:
            self.hf_config["architectures"] = [self.model_arch]
        if self.max_model_len is None:
            self.max_model_len = int(
                self.hf_config.get("max_position_embeddings", 8192)
            )
        if self.tokenizer is None:
            self.tokenizer = self.model

    @property
    def architecture(self) -> str:
        archs = self.hf_config.get("architectures") or []
        if not archs:
            raise ValueError("hf_config has no architectures")
        return archs[0]

    # Convenience accessors into the (possibly stage-scoped) text config. ---
    def _text_cfg(self) -> dict[str, Any]:
        for key in ("text_config",):
            if key in self.hf_config and isinstance(self.hf_config[key], dict):
                return self.hf_config[key]
        return self.hf_config

    def get(self, key: str, default: Any = None) -> Any:
        return self._text_cfg().get(key, self.hf_config.get(key, default))

    @property
    def hidden_size(self) -> int:
        return int(self.get("hidden_size"))

    @property
    def num_layers(self) -> int:
        return int(self.get("num_hidden_layers"))

    @property
    def num_attention_heads(self) -> int:
        return int(self.get("num_attention_heads"))

    @property
    def num_kv_heads(self) -> int:
        return int(self.get("num_key_value_heads", self.num_attention_heads))

    @property
    def head_dim(self) -> int:
        hd = self.get("head_dim")
        if hd is not None:
            return int(hd)
        return self.hidden_size // self.num_attention_heads

    @property
    def vocab_size(self) -> int:
        return int(self.get("vocab_size", 151936))
