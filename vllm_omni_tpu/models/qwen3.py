"""Qwen3 dense causal LM (see qwen2.py for the shared implementation)."""

from vllm_omni_tpu.models.qwen2 import Qwen3ForCausalLM

__all__ = ["Qwen3ForCausalLM"]
