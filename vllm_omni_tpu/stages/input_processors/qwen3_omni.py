"""Stage input processors for the Qwen3-Omni speech pipeline.

Parity: reference stage_input_processors/qwen3_omni.py:15-183 and the HF
orchestration in Qwen3OmniMoeForConditionalGeneration.generate:

- thinker2talker re-implements the chatml segmentation: per
  <|im_start|> segment, system parts are skipped, user parts take
  `hidden_projection(thinker hidden @ accept_hidden_layer)` at
  multimodal positions and `text_projection(thinker embeds)` at text
  positions, and the final assistant part is the 9-slot text/codec
  embedding sum ([:3] + tts_pad*4 + tts_bos + first-text, plus zeros*3
  + codec [nothink, think_bos, think_eos, speaker, pad, bos]);
- talker2code2wav flattens the talker's [NQ, T] RVQ frame matrix into
  the code2wav stage's prompt token ids.

The segmentation/prefill builder is shared with the incremental
(streaming) processors in qwen3_omni_streaming.py: the talker prefill
depends only on the prompt plus the FIRST generated token's embedding,
so the streaming edge can build the identical prefill after the
thinker's second step.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax.numpy as jnp

from vllm_omni_tpu.stages.input_processors.qwen2_5_omni import (
    _mm_meta_from_prompt,
)


def _cfg_ids(cfg: dict[str, Any]) -> dict[str, int]:
    thinker = cfg.get("thinker_config", {})
    tc = thinker.get("text_config", thinker)
    return {
        "im_start": int(cfg.get("im_start_token_id", 151644)),
        "system": int(cfg.get("system_token_id", 8948)),
        "user": int(cfg.get("user_token_id", 872)),
        "assistant": int(cfg.get("assistant_token_id", 77091)),
        "tts_bos": int(cfg.get("tts_bos_token_id", 151672)),
        "tts_eos": int(cfg.get("tts_eos_token_id", 151673)),
        "tts_pad": int(cfg.get("tts_pad_token_id", 151671)),
        "audio": int(tc.get("audio_token_id",
                            thinker.get("audio_token_id", 151646))),
        "image": int(tc.get("image_token_id",
                            thinker.get("image_token_id", 151655))),
        "video": int(tc.get("video_token_id",
                            thinker.get("video_token_id", 151656))),
    }


def _resolve_speaker(stage, talker_cfg: dict, original_prompt) -> int:
    speaker = None
    if isinstance(original_prompt, dict):
        speaker = original_prompt.get("speaker")
    speaker = speaker or stage.config.diffusion_args.get("speaker")
    speaker_map = talker_cfg.get("speaker_id") or {}
    if isinstance(speaker, str):
        speaker_id = speaker_map.get(speaker.lower())
        if speaker_id is None:
            raise ValueError(f"unknown speaker {speaker!r}")
        return int(speaker_id)
    if speaker is not None:
        return int(speaker)
    return int(talker_cfg.get("codec_pad_id", 4196))


def _build_talker_prefill(
    stage,
    cfg: dict[str, Any],
    sequences: np.ndarray,
    P: int,
    thinker_embed: np.ndarray,
    capture: np.ndarray,
    tts_bos: np.ndarray,
    tts_pad: np.ndarray,
    speaker_id: int,
    original_prompt,
) -> tuple[dict[str, Any], int]:
    """Shared chatml segmentation -> talker prefill inputs.

    `thinker_embed` must cover at least positions [0, s_last+4) where
    s_last is the final <|im_start|> in the prompt — i.e. the prompt
    embeds plus (if the prompt ends with the bare assistant header) the
    first generated token's embedding. Returns the prefill prompt dict
    (without trailing_text_hidden) and s_last.
    """
    engine = stage.engine
    ids = _cfg_ids(cfg)
    talker_cfg = cfg.get("talker_config", cfg)

    mm_mask = np.isin(
        sequences[: len(thinker_embed)],
        [ids["audio"], ids["image"], ids["video"]])

    starts = list(np.nonzero(sequences[:P] == ids["im_start"])[0])
    starts.append(len(sequences))
    if len(starts) < 2:
        raise ValueError("no <|im_start|> segments in thinker prompt")

    parts: list[np.ndarray] = []
    part_ids: list[np.ndarray] = []
    s_last = -1
    for i in range(len(starts) - 1):
        s, e = int(starts[i]), int(starts[i + 1])
        # thinker_embed covers inputs only: the final sampled token never
        # re-enters the thinker, so segment reads clip to the embed
        # length (matches HF slice semantics)
        e = min(e, thinker_embed.shape[0])
        role = int(sequences[s + 1])
        if role == ids["system"]:
            continue
        if role == ids["user"]:
            seg_mask = mm_mask[s:e]
            seg = np.empty((e - s, int(tts_pad.shape[-1])), np.float32)
            if seg_mask.any():
                seg[seg_mask] = np.asarray(engine.project_hidden(
                    capture[s:e][seg_mask]))
            if (~seg_mask).any():
                seg[~seg_mask] = np.asarray(engine.project_text(
                    thinker_embed[s:e][~seg_mask]))
            parts.append(seg)
            part_ids.append(sequences[s:e])
        elif role == ids["assistant"] and i == len(starts) - 2:
            s_last = s
            head = np.asarray(engine.project_text(
                thinker_embed[s:min(s + 4, e)]))
            text_part = np.concatenate([
                head[:3],
                np.broadcast_to(tts_pad, (4, tts_pad.shape[-1])),
                tts_bos[None] if tts_bos.ndim == 1 else tts_bos,
                head[3:4],
            ])
            codec_ids = [
                int(talker_cfg.get("codec_nothink_id", 4203)),
                int(talker_cfg.get("codec_think_bos_id", 4204)),
                int(talker_cfg.get("codec_think_eos_id", 4205)),
                speaker_id,
                int(talker_cfg.get("codec_pad_id", 4196)),
                int(talker_cfg.get("codec_bos_id", 4197)),
            ]
            codec_part = np.concatenate([
                np.zeros((3, text_part.shape[-1]), np.float32),
                np.asarray(engine.embed_codec(codec_ids), np.float32),
            ])
            parts.append(text_part + codec_part)
            part_ids.append(np.full((text_part.shape[0],), ids["tts_pad"],
                                    np.int64))
        # history assistant segments are skipped (HF "for now")

    if s_last < 0:
        raise ValueError("thinker output has no final assistant segment")

    inputs_embeds = np.concatenate(parts)
    talker_input_ids = np.concatenate(part_ids)

    from vllm_omni_tpu.multimodal.mrope import (
        MRopeParams,
        MRopeTokenIds,
        compute_mrope_positions_qwen3,
    )

    thinker_cfg = cfg.get("thinker_config", {})
    mrope_params = MRopeParams(
        tokens=MRopeTokenIds(
            image_token_id=ids["image"],
            video_token_id=ids["video"],
            audio_token_id=ids["audio"],
            vision_start_token_id=int(
                thinker_cfg.get("vision_start_token_id", 151652)),
            audio_start_token_id=int(
                thinker_cfg.get("audio_start_token_id", 151647)),
        ),
        spatial_merge_size=int(talker_cfg.get("spatial_merge_size", 2)),
        position_id_per_seconds=int(
            thinker_cfg.get("position_id_per_seconds", 25)),
    )
    mm_meta = _mm_meta_from_prompt(original_prompt)
    positions, delta = compute_mrope_positions_qwen3(
        talker_input_ids, mrope_params, **mm_meta)

    return {
        "inputs_embeds": inputs_embeds,
        "mrope_positions": np.asarray(positions, np.float32),
        "mrope_delta": int(delta),
        "tts_pad_embed": tts_pad[0] if tts_pad.ndim > 1 else tts_pad,
    }, s_last


def _merge_chunks(v) -> np.ndarray:
    """prompt_* mm values arrive either merged ([P, D]) or as a tuple of
    prefill-chunk arrays (partial outputs)."""
    if isinstance(v, (tuple, list)):
        return np.concatenate([np.asarray(c, np.float32) for c in v])
    return np.asarray(v, np.float32)


def _pad_capture(capture: Optional[Any], like: np.ndarray) -> np.ndarray:
    cap = (_merge_chunks(capture) if capture is not None
           else np.zeros_like(like))
    if cap.shape[0] < like.shape[0]:
        # mm positions only occur in the prompt; pad the tap for shape-
        # aligned slicing over generated positions
        cap = np.concatenate([
            cap,
            np.zeros((like.shape[0] - cap.shape[0], like.shape[1]),
                     np.float32)])
    return cap


def thinker2talker(stage, upstream_outputs: dict[int, Any], original_prompt):
    """Thinker stage output -> talker stage prompt (HF generate parity)."""
    src = stage.config.engine_input_source[0]
    out = upstream_outputs[src]
    comp = out.outputs[0]
    mm = comp.multimodal_output or {}
    engine = stage.engine  # TalkerEngine
    cfg = stage.config.engine_args.hf_config or {}
    talker_cfg = cfg.get("talker_config", cfg)

    prompt_ids = list(out.prompt_token_ids)
    gen_ids = list(comp.token_ids)
    sequences = np.asarray(prompt_ids + gen_ids, np.int64)
    P = len(prompt_ids)

    # thinker_embed: layer-0 embeds of every position fed to the thinker
    # (prompt embeds incl. spliced mm features, then each generated token
    # re-entering at decode steps 1..n-1) — length P + n - 1
    prompt_embeds = _merge_chunks(mm["prompt_embed_tokens"])
    step_embeds = np.asarray(mm["last_input_embed"], np.float32)
    thinker_embed = np.concatenate([prompt_embeds, step_embeds[1:]])
    # thinker_hidden @ accept_hidden_layer (read only at mm positions,
    # which are always inside the prompt)
    capture = _pad_capture(mm.get("prompt_capture_hidden"), thinker_embed)

    # projected tts special embeds (thinker embedding space -> talker)
    tts_bos = np.asarray(engine.project_text(mm["tts_bos_embed"]))
    tts_eos = np.asarray(engine.project_text(mm["tts_eos_embed"]))
    tts_pad = np.asarray(engine.project_text(mm["tts_pad_embed"]))

    prompt, s_last = _build_talker_prefill(
        stage, cfg, sequences, P, thinker_embed, capture, tts_bos, tts_pad,
        _resolve_speaker(stage, talker_cfg, original_prompt),
        original_prompt,
    )
    a_rest = np.asarray(engine.project_text(thinker_embed[s_last + 4:]))
    prompt["trailing_text_hidden"] = np.concatenate([
        a_rest,
        tts_eos[None] if tts_eos.ndim == 1 else tts_eos,
    ])
    prompt["request_id"] = out.request_id
    return prompt


def talker2code2wav(stage, upstream_outputs: dict[int, Any], original_prompt):
    """Talker RVQ frames [NQ, T] -> flattened code2wav prompt
    (reference stage_input_processors/qwen3_omni.py:124-183)."""
    src = stage.config.engine_input_source[0]
    out = upstream_outputs[src]
    mm = out.outputs[0].multimodal_output or {}
    codes = np.asarray(mm["codes"], np.int64)
    if codes.ndim != 2:
        raise ValueError(f"expected [NQ, T] codes, got {codes.shape}")
    return {"prompt_token_ids": [int(c) for c in codes.reshape(-1)]}
