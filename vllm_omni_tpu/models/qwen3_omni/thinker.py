"""Qwen3-Omni MoE thinker: AuT audio + deepstack vision towers feeding a
Qwen3-MoE decoder with interleaved M-RoPE.

Parity: Qwen3OmniMoeThinkerForConditionalGeneration (reference
model_executor/models/qwen3_omni/qwen3_omni_moe_thinker.py:597-720:
deepstack multi-level visual embeds; multimodal processor :181-570).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.model import ModelConfig
from vllm_omni_tpu.models.audio_encoder_qwen3 import (
    Qwen3AudioEncoder,
    Qwen3AudioEncoderConfig,
)
from vllm_omni_tpu.models.qwen3_moe import Qwen3MoeForCausalLM
from vllm_omni_tpu.models.vision_encoder_qwen3 import (
    Qwen3VisionEncoder,
    Qwen3VisionEncoderConfig,
)
from vllm_omni_tpu.multimodal.audio import log_mel_spectrogram
from vllm_omni_tpu.multimodal.mrope import (
    MRopeParams,
    MRopeTokenIds,
    compute_mrope_positions_qwen3,
)
from vllm_omni_tpu.multimodal.processor import preprocess_image


def _sub_model_config(parent: ModelConfig, sub: dict, arch: str) -> ModelConfig:
    cfg = dict(sub)
    cfg["architectures"] = [arch]
    return ModelConfig(model=parent.model or "sub", hf_config=cfg,
                       dtype=parent.dtype,
                       max_model_len=parent.max_model_len)


class Qwen3OmniMoeThinkerForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.audio_cfg = Qwen3AudioEncoderConfig.from_hf(
            hf.get("audio_config", {}))
        self.vision_cfg = Qwen3VisionEncoderConfig.from_hf(
            hf.get("vision_config", {}))
        text_cfg = hf.get("text_config", hf)
        self.text = Qwen3MoeForCausalLM(
            _sub_model_config(config, text_cfg, "Qwen3MoeForCausalLM"))
        # Qwen3-Omni always applies interleaved M-RoPE in the text stack
        self.text.mrope_interleaved = True
        if self.text.mrope_section is None:
            self.text.mrope_section = [24, 20, 20]
        self.audio = Qwen3AudioEncoder(self.audio_cfg, dtype=config.dtype)
        self.visual = Qwen3VisionEncoder(self.vision_cfg, dtype=config.dtype)
        self.mrope_section = self.text.mrope_section
        self.emit_full_hidden = config.engine_output_type == "latent"
        # per-decode-step mm payload the downstream stage actually reads
        # (thinker2talker consumes only the re-entering token embeds;
        # prompt hidden/capture ship once via _collect_full_hidden)
        self.step_mm_keys = ("last_input_embed",)
        # talker taps thinker hidden states at accept_hidden_layer for
        # multimodal positions (HF Qwen3OmniMoeForConditionalGeneration.
        # generate: thinker_hidden); reachable via the parent omni config
        parent = hf.get("_parent_config") or {}
        accept = hf.get(
            "accept_hidden_layer",
            parent.get("talker_config", {}).get("accept_hidden_layer"))
        if self.emit_full_hidden and accept is not None:
            self.text.capture_layer = int(accept)
        self.mrope_params = MRopeParams(
            tokens=MRopeTokenIds(
                image_token_id=int(hf.get("image_token_id", 151655)),
                video_token_id=int(hf.get("video_token_id", 151656)),
                audio_token_id=int(hf.get("audio_token_id", 151646)),
                vision_start_token_id=int(hf.get("vision_start_token_id", 151652)),
                audio_start_token_id=int(hf.get("audio_start_token_id", 151647)),
            ),
            spatial_merge_size=self.vision_cfg.spatial_merge_size,
            position_id_per_seconds=int(hf.get("position_id_per_seconds", 25)),
        )

    # ------------------------------------------------------ model protocol
    @property
    def kv_spec(self):
        return self.text.kv_spec

    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "text": self.text.init_params(k1),
            "audio": self.audio.init_params(k2),
            "visual": self.visual.init_params(k3),
        }

    def load_weights(self, path: str) -> dict[str, Any]:
        from vllm_omni_tpu.models.qwen3_omni.loader import load_thinker_weights

        return load_thinker_weights(self, path)

    def embed_tokens(self, params, token_ids):
        return self.text.embed_tokens(params["text"], token_ids)

    @property
    def capture_layer(self):
        return self.text.capture_layer

    def forward(self, params, hidden, kv_cache, meta, **kw):
        return self.text.forward(params["text"], hidden, kv_cache, meta, **kw)

    def compute_logits(self, params, hidden, **kw):
        return self.text.compute_logits(params["text"], hidden, **kw)

    def finalize_multimodal(
        self, params, additional_information: dict[str, Any]
    ) -> dict[str, Any]:
        # tts special ids default from the parent omni config (HF
        # generate embeds tts_{bos,eos,pad}_token_id via the thinker
        # embedding table before projecting them for the talker)
        parent = self.config.hf_config.get("_parent_config") or {}
        defaults = {
            "tts_bos_id": parent.get("tts_bos_token_id"),
            "tts_eos_id": parent.get("tts_eos_token_id"),
            "tts_pad_id": parent.get("tts_pad_token_id"),
        }
        out: dict[str, Any] = {}
        for key in ("tts_bos_id", "tts_eos_id", "tts_pad_id"):
            tok = additional_information.get(key, defaults.get(key))
            if tok is not None:
                out[key.replace("_id", "_embed")] = self.text.embed_tokens(
                    params["text"], jnp.asarray([int(tok)]))[0]
        return out

    # ----------------------------------------------------- multimodal path
    def process_multimodal(
        self,
        params: dict[str, Any],
        token_ids: list[int],
        multi_modal_data: dict[str, Any],
        mm_kwargs: Optional[dict[str, Any]] = None,
    ) -> dict[str, Any]:
        mm_kwargs = mm_kwargs or {}
        ids = np.asarray(token_ids, np.int64)
        tk = self.mrope_params.tokens

        audio_feats = []
        audio_seqlens = []
        for wav in multi_modal_data.get("audio", []):
            if isinstance(wav, tuple):
                wav = wav[0]
            mel = log_mel_spectrogram(jnp.asarray(np.asarray(wav, np.float32)))
            audio_seqlens.append(int(mel.shape[1]))
            audio_feats.append(self.audio.forward(params["audio"], mel))

        image_feats, image_deep, image_grids = [], [], []
        video_feats, video_deep, video_grids = [], [], []
        for key, feats, deeps, grids in (
            ("image", image_feats, image_deep, image_grids),
            ("video", video_feats, video_deep, video_grids),
        ):
            for item in multi_modal_data.get(key, []):
                if isinstance(item, dict):
                    patches, grid = item["patches"], tuple(item["grid_thw"])
                elif key == "video":
                    from vllm_omni_tpu.multimodal.processor import (
                        preprocess_video,
                    )

                    patches, grid = preprocess_video(
                        item,
                        patch_size=self.vision_cfg.patch_size,
                        merge_size=self.vision_cfg.spatial_merge_size,
                        temporal_patch_size=self.vision_cfg.temporal_patch_size,
                        **mm_kwargs.get("video", {}),
                    )
                else:
                    patches, grid = preprocess_image(
                        item,
                        patch_size=self.vision_cfg.patch_size,
                        merge_size=self.vision_cfg.spatial_merge_size,
                        temporal_patch_size=self.vision_cfg.temporal_patch_size,
                        **mm_kwargs.get("image", {}),
                    )
                grids.append(grid)
                out, deep = self.visual.forward(
                    params["visual"], jnp.asarray(patches), [grid])
                feats.append(out)
                deeps.append(deep)

        # expand single placeholders to feature-count runs (serving path;
        # pre-expanded ids pass through). use_audio_in_video interleaved
        # layouts must arrive pre-expanded for Qwen3-Omni.
        from vllm_omni_tpu.multimodal.processor import expand_placeholders

        ids_list = ids.tolist()

        def maybe_expand(ids_list, token_id, feats):
            lens = [int(np.asarray(f).shape[0]) for f in feats]
            occ = sum(1 for t in ids_list if t == token_id)
            if lens and occ == len(lens) and occ != sum(lens):
                return expand_placeholders(ids_list, {token_id: lens})
            return ids_list

        if not multi_modal_data.get("use_audio_in_video"):
            ids_list = maybe_expand(ids_list, tk.image_token_id, image_feats)
            ids_list = maybe_expand(ids_list, tk.video_token_id, video_feats)
            ids_list = maybe_expand(ids_list, tk.audio_token_id, audio_feats)
        ids = np.asarray(ids_list, np.int64)

        embeds = np.array(
            self.text.embed_tokens(
                params["text"], jnp.asarray(ids)).astype(jnp.float32))
        n_levels = len(self.vision_cfg.deepstack_visual_indexes)
        deepstack = (
            np.zeros((n_levels, len(ids), embeds.shape[-1]), np.float32)
            if (image_feats or video_feats) else None
        )

        def splice(feats_list, deeps_list, token_id):
            if not feats_list:
                return
            mask = ids == token_id
            feats = np.concatenate([np.asarray(f, np.float32) for f in feats_list])
            n = int(mask.sum())
            if n != feats.shape[0]:
                raise ValueError(
                    f"placeholder count {n} != features {feats.shape[0]}")
            embeds[mask] = feats
            if deeps_list and deepstack is not None:
                for lvl in range(n_levels):
                    deepstack[lvl][mask] = np.concatenate(
                        [np.asarray(d[lvl], np.float32) for d in deeps_list])

        splice(audio_feats, None, tk.audio_token_id)
        splice(image_feats, image_deep, tk.image_token_id)
        splice(video_feats, video_deep, tk.video_token_id)

        positions, delta = compute_mrope_positions_qwen3(
            ids, self.mrope_params,
            image_grid_thw=image_grids or None,
            video_grid_thw=video_grids or None,
            audio_seqlens=audio_seqlens or None,
            second_per_grids=multi_modal_data.get("second_per_grids"),
            use_audio_in_video=bool(
                multi_modal_data.get("use_audio_in_video", False)),
        )
        return {
            "token_ids": ids.tolist(),
            "prompt_embeds": embeds,
            "mrope_positions": positions,
            "mrope_delta": delta,
            "deepstack_embeds": deepstack,
        }
