"""Unified Qwen2.5-Omni model: model_stage selects the submodel.

Parity: Qwen2_5OmniForConditionalGeneration (reference
model_executor/models/qwen2_5_omni/qwen2_5_omni.py:52): the same
architecture name is instantiated per stage with `model_stage` in
{thinker, talker, token2wav} selecting the submodel and `hf_config_name`
drawing the per-stage sub-config.
"""

from __future__ import annotations

from vllm_omni_tpu.config.model import ModelConfig


def Qwen2_5OmniForConditionalGeneration(config: ModelConfig):
    stage = config.model_stage or "thinker"
    # the stage sub-config may already be drawn via hf_config_name
    # (reference engine/arg_utils.py:47-63); fall back to nested keys
    hf = config.hf_config
    if stage == "thinker":
        from vllm_omni_tpu.models.qwen2_5_omni.thinker import (
            Qwen2_5OmniThinkerForConditionalGeneration,
        )

        if "thinker_config" in hf:
            config = ModelConfig(
                model=config.model, hf_config=hf, dtype=config.dtype,
                hf_config_name="thinker_config",
                engine_output_type=config.engine_output_type,
                model_stage=stage,
            )
        return Qwen2_5OmniThinkerForConditionalGeneration(config)
    if stage == "talker":
        from vllm_omni_tpu.models.qwen2_5_omni.talker import (
            Qwen2_5OmniTalkerForConditionalGeneration,
        )

        if "talker_config" in hf:
            config = ModelConfig(
                model=config.model, hf_config=hf, dtype=config.dtype,
                hf_config_name="talker_config",
                engine_output_type=config.engine_output_type,
                model_stage=stage,
            )
        return Qwen2_5OmniTalkerForConditionalGeneration(config)
    if stage in ("token2wav", "code2wav"):
        from vllm_omni_tpu.models.qwen2_5_omni.token2wav import (
            Qwen2_5OmniToken2WavModel,
        )

        sub = hf.get("token2wav_config", hf)
        return Qwen2_5OmniToken2WavModel(sub)
    raise ValueError(f"unknown model_stage {stage!r} for Qwen2.5-Omni")
