"""Qwen2.5-Omni talker: thinker hidden/embeds -> speech codec tokens.

Parity: Qwen2_5OmniTalkerForConditionalGeneration (reference
model_executor/models/qwen2_5_omni/qwen2_5_omni_talker.py:40; HF
semantics):
- prefill embeds come entirely from the thinker (prompt hidden+embeds,
  speaker text-bos embed, first reply embed) with the talker's codec
  pad/bos embeddings ADDED at the last two positions;
- every decode step embeds the sampled codec token and ADDS the next
  streamed thinker reply embedding (engine `decode_embeds` ADD-overlay);
- a thinker_to_talker projection precedes the decoder; codec_head emits
  logits over the codec vocab (8448).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.model import ModelConfig
from vllm_omni_tpu.models.layers import linear
from vllm_omni_tpu.models.qwen2 import Qwen2ForCausalLM


class Qwen2_5OmniTalkerForConditionalGeneration(Qwen2ForCausalLM):
    qkv_bias = True
    qk_norm = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.embedding_size = int(config.get("embedding_size", self.H))
        self.codec_bos_id = int(config.get("tts_codec_start_token_id", 8293))
        self.codec_eos_id = int(config.get("tts_codec_end_token_id", 8294))
        self.codec_pad_id = int(config.get("tts_codec_pad_token_id", 8292))
        self.codec_mask_id = int(config.get("tts_codec_mask_token_id", 8296))
        self.text_bos_id = int(config.get("tts_text_start_token_id", 151860))
        self.text_eos_id = int(config.get("tts_text_end_token_id", 151861))
        self.text_pad_id = int(config.get("tts_text_pad_token_id", 151859))

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        params = super().init_params(rng)
        dt = self.dtype
        k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, 99), 3)
        # codec embedding lives in thinker embedding space (added to
        # streamed thinker embeds BEFORE the projection)
        params["embed_tokens"] = (
            jax.random.normal(k3, (self.V, self.embedding_size), jnp.float32)
            * 0.02
        ).astype(dt)
        params["thinker_to_talker_proj"] = {
            "w": (jax.random.normal(k1, (self.embedding_size, self.H),
                                    jnp.float32) * 0.02).astype(dt),
            "b": jnp.zeros((self.H,), dt),
        }
        # codec head (no bias)
        params["lm_head"] = (
            jax.random.normal(k2, (self.H, self.V), jnp.float32) * 0.02
        ).astype(dt)
        return params

    def load_weights(self, path: str) -> dict[str, Any]:
        from vllm_omni_tpu.models.qwen2_5_omni.loader import load_talker_weights

        return load_talker_weights(self, path)

    # ------------------------------------------------------------ forward
    def embed_tokens(self, params, token_ids):
        # codec-token embedding; reply-part ADD happens via the engine's
        # decode_embeds overlay BEFORE the projection, so embeds here are
        # in thinker (embedding_size) space
        return params["embed_tokens"][token_ids]

    def forward(self, params, hidden, kv_cache, meta, **kw):
        # thinker_to_talker projection on the (overlaid) input embeds
        p = params["thinker_to_talker_proj"]
        hidden = linear(hidden.astype(p["w"].dtype), p["w"], p["b"])
        return super().forward(params, hidden, kv_cache, meta, **kw)

    def codec_embedding(self, params, token_ids) -> jax.Array:
        return params["embed_tokens"][jnp.asarray(token_ids)]
