"""Stage engine wrapping the token2wav vocoder.

Parity role: the reference's code2wav/token2wav stage runs one forward per
request via GPUGenerationModelRunner + OmniGenerationScheduler (reference
gpu_generation_model_runner.py:44-182, omni_generation_scheduler.py:19-148);
here the non-AR model is its own one-shot engine exposing the LLM-stage
generate() surface so OmniStage can host it unchanged.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.model import ModelConfig
from vllm_omni_tpu.models.qwen2_5_omni.token2wav import Qwen2_5OmniToken2WavModel
from vllm_omni_tpu.outputs import CompletionOutput, RequestOutput
from vllm_omni_tpu.sampling_params import SamplingParams


class Token2WavEngine:
    def __init__(
        self,
        model_config: ModelConfig,
        load_weights: bool = True,
        params: Optional[dict] = None,
        speaker_map: Optional[dict[str, dict]] = None,
        num_steps: int = 10,
        guidance_scale: float = 0.5,
    ):
        self.model = Qwen2_5OmniToken2WavModel(
            model_config, dtype=model_config.dtype)
        if params is not None:
            self.params = params
        elif not load_weights or not model_config.model:
            self.params = self.model.init_params(jax.random.key(0))
        elif load_weights and model_config.model:
            from vllm_omni_tpu.models.weight_loader import iter_safetensors

            sd = {
                k[len("token2wav."):] if k.startswith("token2wav.") else k: v
                for k, v in iter_safetensors(model_config.model)
            }
            self.params = self.model.load_from_state_dict(sd)
        # speaker -> {"cond": [1, enc_emb], "ref_mel": [1, T, mel]}
        self.speaker_map = speaker_map or {}
        self.num_steps = num_steps
        self.guidance_scale = guidance_scale

    def _speaker(self, name: Optional[str]):
        if self.speaker_map:
            key = name if name in self.speaker_map else next(iter(self.speaker_map))
            sp = self.speaker_map[key]
            return jnp.asarray(sp["cond"]), jnp.asarray(sp["ref_mel"])
        d = self.model.dit_cfg
        return (
            jnp.zeros((1, d.enc_emb_dim), jnp.float32),
            jnp.zeros((1, 64, d.mel_dim), jnp.float32),
        )

    def generate(self, prompts, sampling_params) -> list[RequestOutput]:
        outs = []
        for p, sp in zip(prompts, sampling_params):
            codes = p["prompt_token_ids"] if isinstance(p, dict) else list(p)
            extra = (p.get("additional_information", {})
                     if isinstance(p, dict) else {})
            cond, ref_mel = self._speaker(extra.get("speaker"))
            code = jnp.asarray(np.asarray(codes, np.int32))[None]
            wav = self.model.forward(
                self.params, code, cond, ref_mel,
                num_steps=int(extra.get("num_steps", self.num_steps)),
                guidance_scale=float(
                    extra.get("guidance_scale", self.guidance_scale)),
            )
            outs.append(RequestOutput(
                request_id="t2w", prompt=None, prompt_token_ids=list(codes),
                outputs=[CompletionOutput(
                    index=0, text="", token_ids=[], finish_reason="stop",
                    multimodal_output={"waveform": wav})],
                finished=True,
            ))
        return outs
