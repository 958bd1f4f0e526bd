"""Qwen2.5-Omni thinker: audio + vision towers feeding a Qwen2 decoder.

Parity: Qwen2_5OmniThinkerForConditionalGeneration (reference
model_executor/models/qwen2_5_omni/qwen2_5_omni_thinker.py:63,175):
multimodal AR model — placeholders in the token sequence are replaced by
audio/vision tower features, positions are M-RoPE streams. Numeric parity
vs the HF implementation is tested in tests/models/test_thinker_parity.py.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.model import ModelConfig
from vllm_omni_tpu.models.audio_encoder import AudioEncoder, AudioEncoderConfig
from vllm_omni_tpu.models.qwen2 import Qwen2ForCausalLM
from vllm_omni_tpu.models.vision_encoder import VisionEncoder, VisionEncoderConfig
from vllm_omni_tpu.multimodal.audio import log_mel_spectrogram
from vllm_omni_tpu.multimodal.mrope import (
    MRopeParams,
    MRopeTokenIds,
    compute_mrope_positions,
)
from vllm_omni_tpu.multimodal.processor import preprocess_image


def _sub_model_config(parent: ModelConfig, sub: dict, arch: str) -> ModelConfig:
    cfg = dict(sub)
    cfg["architectures"] = [arch]
    return ModelConfig(model=parent.model or "sub", hf_config=cfg,
                       dtype=parent.dtype,
                       max_model_len=parent.max_model_len)


class Qwen2_5OmniThinkerForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.audio_cfg = AudioEncoderConfig.from_hf(hf.get("audio_config", {}))
        self.vision_cfg = VisionEncoderConfig.from_hf(hf.get("vision_config", {}))
        text_cfg = hf.get("text_config", hf)
        self.text = Qwen2ForCausalLM(
            _sub_model_config(config, text_cfg, "Qwen2ForCausalLM"))
        self.audio = AudioEncoder(self.audio_cfg, dtype=config.dtype)
        self.visual = VisionEncoder(self.vision_cfg, dtype=config.dtype)
        self.mrope_section = self.text.mrope_section
        # speech pipelines need full prompt hidden/embeds shipped to the
        # talker stage (reference gpu_ar_model_runner.py:388-418)
        self.emit_full_hidden = config.engine_output_type == "latent"
        # thinker2talker (qwen2_5) reads per-step hidden AND embeds
        self.step_mm_keys = ("last_hidden", "last_input_embed")
        # token ids for placeholders (HF thinker config)
        self.mrope_params = MRopeParams(
            tokens=MRopeTokenIds(
                image_token_id=int(hf.get("image_token_index",
                                          hf.get("image_token_id", 151655))),
                video_token_id=int(hf.get("video_token_index",
                                          hf.get("video_token_id", 151656))),
                audio_token_id=int(hf.get("audio_token_index",
                                          hf.get("audio_token_id", 151646))),
                vision_start_token_id=int(hf.get("vision_start_token_id", 151652)),
                audio_start_token_id=int(hf.get("audio_start_token_id", 151647)),
            ),
            spatial_merge_size=self.vision_cfg.spatial_merge_size,
            position_id_per_seconds=int(hf.get("position_id_per_seconds", 25)),
            seconds_per_chunk=int(hf.get("seconds_per_chunk", 2)),
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
        from vllm_omni_tpu.models.qwen2_5_omni.loader import load_thinker_weights

        return load_thinker_weights(self, path)

    def embed_tokens(self, params, token_ids):
        return self.text.embed_tokens(params["text"], token_ids)

    def forward(self, params, hidden, kv_cache, meta, **kw):
        return self.text.forward(params["text"], hidden, kv_cache, meta, **kw)

    def compute_logits(self, params, hidden, **kw):
        return self.text.compute_logits(params["text"], hidden, **kw)

    def finalize_multimodal(
        self, params, additional_information: dict[str, Any]
    ) -> dict[str, Any]:
        """Per-request extras for the talker stage: thinker embeddings of
        the speaker/tts special tokens (HF: talker_text_bos/eos/pad embeds
        come from the thinker embedding table)."""
        out: dict[str, Any] = {}
        for key in ("tts_bos_id", "tts_eos_id", "tts_pad_id"):
            tok = additional_information.get(key)
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
        """Run towers, splice features, compute M-RoPE positions.

        token_ids must already contain expanded placeholder runs (one
        placeholder token per final mm token). Returns dict with
        prompt_embeds [L, H] (numpy), mrope_positions [3, L], mrope_delta.
        """
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

        image_feats = []
        image_grids = []
        for img in multi_modal_data.get("image", []):
            if isinstance(img, dict):  # pre-patchified
                patches, grid = img["patches"], tuple(img["grid_thw"])
            else:
                patches, grid = preprocess_image(
                    img,
                    patch_size=self.vision_cfg.patch_size,
                    merge_size=self.vision_cfg.spatial_merge_size,
                    temporal_patch_size=self.vision_cfg.temporal_patch_size,
                    **mm_kwargs.get("image", {}),
                )
            image_grids.append(grid)
            image_feats.append(
                self.visual.forward(params["visual"], jnp.asarray(patches), [grid])
            )

        video_feats = []
        video_grids = []
        for vid in multi_modal_data.get("video", []):
            if isinstance(vid, dict):
                patches, grid = vid["patches"], tuple(vid["grid_thw"])
            else:
                from vllm_omni_tpu.multimodal.processor import (
                    preprocess_video,
                )

                patches, grid = preprocess_video(
                    vid,
                    patch_size=self.vision_cfg.patch_size,
                    merge_size=self.vision_cfg.spatial_merge_size,
                    temporal_patch_size=self.vision_cfg.temporal_patch_size,
                    **mm_kwargs.get("video", {}),
                )
            video_grids.append(grid)
            video_feats.append(
                self.visual.forward(params["visual"], jnp.asarray(patches), [grid])
            )

        # expand single placeholders to feature-count runs (the serving
        # path tokenizes one <|IMAGE|>/<|AUDIO|>/<|VIDEO|> special per
        # item; pre-expanded ids pass through untouched). Parity: the HF
        # processor's placeholder expansion incl. use_audio_in_video
        # time-chunk interleaving (reference reaches it via HF).
        from vllm_omni_tpu.multimodal.processor import (
            build_video_audio_interleave,
            expand_placeholders,
        )

        use_aiv = bool(multi_modal_data.get("use_audio_in_video", False))
        ids_list = ids.tolist()

        def counts(feats):
            return [int(np.asarray(f).shape[0]) for f in feats]

        def maybe_expand(ids_list, token_id, lens):
            occ = sum(1 for t in ids_list if t == token_id)
            if lens and occ == len(lens) and occ != sum(lens):
                return expand_placeholders(ids_list, {token_id: lens})
            return ids_list

        ids_list = maybe_expand(ids_list, tk.image_token_id,
                                counts(image_feats))
        if use_aiv and video_feats:
            # i-th <|VIDEO|> becomes the chunk-interleaved video+audio
            # run; videos pair with their OWN extracted audio tracks
            # (video_audio_indices from the chat parser), so standalone
            # input_audio parts earlier in the message cannot shift the
            # pairing
            vai = multi_modal_data.get("video_audio_indices")
            if vai is None:
                vai = list(range(len(video_feats)))
            standalone = [i for i in range(len(audio_feats))
                          if i not in set(vai)]
            ids_list = maybe_expand(
                ids_list, tk.audio_token_id,
                [int(np.asarray(audio_feats[i]).shape[0])
                 for i in standalone])
            spg = multi_modal_data.get("second_per_grids") or [1.0] * len(
                video_grids)
            if ids_list.count(tk.video_token_id) == len(video_feats):
                out: list[int] = []
                vi = 0
                for t in ids_list:
                    if t == tk.video_token_id and vi < len(video_feats):
                        out.extend(build_video_audio_interleave(
                            video_grids[vi],
                            int(np.asarray(
                                audio_feats[vai[vi]]).shape[0]),
                            tk.video_token_id, tk.audio_token_id,
                            second_per_grid=float(spg[vi]),
                            merge_size=self.vision_cfg.spatial_merge_size,
                            position_id_per_seconds=(
                                self.mrope_params.position_id_per_seconds),
                            seconds_per_chunk=(
                                self.mrope_params.seconds_per_chunk),
                        ))
                        vi += 1
                    else:
                        out.append(t)
                ids_list = out
        else:
            ids_list = maybe_expand(ids_list, tk.video_token_id,
                                    counts(video_feats))
            ids_list = maybe_expand(ids_list, tk.audio_token_id,
                                    counts(audio_feats))
        ids = np.asarray(ids_list, np.int64)

        # text embeds + feature splice at placeholder positions
        embeds = np.array(
            self.text.embed_tokens(
                params["text"], jnp.asarray(ids)).astype(jnp.float32)
        )  # np.array: writable copy for feature splicing

        def splice(feats_list, token_id):
            if not feats_list:
                return
            mask = ids == token_id
            feats = np.concatenate([np.asarray(f, np.float32) for f in feats_list])
            n = int(mask.sum())
            if n != feats.shape[0]:
                raise ValueError(
                    f"placeholder count {n} != features {feats.shape[0]} "
                    f"for token {token_id}"
                )
            embeds[mask] = feats

        splice(audio_feats, tk.audio_token_id)
        splice(image_feats, tk.image_token_id)
        splice(video_feats, tk.video_token_id)

        positions, delta = compute_mrope_positions(
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
        }
