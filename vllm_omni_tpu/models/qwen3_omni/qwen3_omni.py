"""Unified Qwen3-Omni MoE model: model_stage selects the submodel.

Parity: Qwen3OmniMoeForConditionalGeneration (reference
model_executor/models/qwen3_omni/qwen3_omni.py:110-170): model_stage in
{thinker, talker, code2wav} selects the submodel, hf_config_name draws the
per-stage sub-config.
"""

from __future__ import annotations

from vllm_omni_tpu.config.model import ModelConfig


def Qwen3OmniMoeForConditionalGeneration(config: ModelConfig):
    stage = config.model_stage or "thinker"
    hf = config.hf_config
    if stage == "thinker":
        from vllm_omni_tpu.models.qwen3_omni.thinker import (
            Qwen3OmniMoeThinkerForConditionalGeneration,
        )

        if "thinker_config" in hf:
            config = ModelConfig(
                model=config.model, hf_config=hf, dtype=config.dtype,
                hf_config_name="thinker_config",
                engine_output_type=config.engine_output_type,
                model_stage=stage,
            )
        return Qwen3OmniMoeThinkerForConditionalGeneration(config)
    if stage == "talker":
        from vllm_omni_tpu.models.qwen3_omni.talker import Qwen3OmniTalker

        return Qwen3OmniTalker(hf.get("talker_config", hf),
                               dtype=config.dtype)
    if stage == "code2wav":
        from vllm_omni_tpu.models.qwen3_omni.code2wav import (
            Qwen3OmniMoeCode2Wav,
        )

        return Qwen3OmniMoeCode2Wav(hf.get("code2wav_config", hf),
                                    dtype=config.dtype)
    raise ValueError(f"unknown Qwen3-Omni stage {stage!r}")
