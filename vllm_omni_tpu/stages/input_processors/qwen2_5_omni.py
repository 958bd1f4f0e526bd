"""Stage input processors for the Qwen2.5-Omni speech pipeline.

Parity: reference stage_input_processors/qwen2_5_omni.py (same role as the
qwen3 variants at stage_input_processors/qwen3_omni.py:15-183) and the HF
full-model orchestration: thinker outputs (prompt hidden/embeds, per-step
reply hidden+embeds, tts special embeds) are assembled into the talker's
prefill embeddings and streamed decode embeddings; talker RVQ codes flatten
into the token2wav stage's prompt.

Everything stays on device (jnp ops on thinker-stage outputs) — the
reference round-trips these through CPU pooler_output
(gpu_ar_model_runner.py:377-430); we do not.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax.numpy as jnp

from vllm_omni_tpu.multimodal.mrope import compute_mrope_positions

# thinker placeholder token ids (zeroed in the talker's view of the prompt)
DEFAULT_MM_PLACEHOLDERS = (151646, 151655, 151656)


def thinker2talker(stage, upstream_outputs: dict[int, Any], original_prompt):
    """Build the talker stage prompt from the thinker stage output."""
    src = stage.config.engine_input_source[0]
    out = upstream_outputs[src]
    comp = out.outputs[0]
    mm = comp.multimodal_output or {}
    prompt_ids = list(out.prompt_token_ids)
    gen_ids = list(comp.token_ids)
    if len(gen_ids) < 2:
        raise ValueError("thinker generated too few tokens for speech")

    talker = stage.engine.core.runner.model
    talker_params = stage.engine.core.runner.params

    P = len(prompt_ids)
    prompt_hidden = jnp.asarray(mm["prompt_hidden"])  # [P, H]
    prompt_embeds = jnp.asarray(mm["prompt_embed_tokens"])  # [P, H]
    # zero multimodal feature rows (HF zeroes audio/image/video positions)
    placeholders = set(
        stage.config.diffusion_args.get(
            "mm_placeholder_ids", DEFAULT_MM_PLACEHOLDERS)
    )
    ph_mask = np.asarray(
        [t in placeholders for t in prompt_ids], bool)
    prompt_embeds = jnp.where(
        jnp.asarray(ph_mask)[:, None], 0.0, prompt_embeds)
    prompt_part = prompt_hidden + prompt_embeds  # [P, H]

    # per-step reply: hidden+input_embed at steps 1..n-1 correspond to
    # generated tokens 0..n-2 being fed back
    step_hidden = jnp.asarray(mm["last_hidden"])  # [n, H]
    step_embed = jnp.asarray(mm["last_input_embed"])  # [n, H]
    reply = (step_hidden + step_embed)[1:]  # [n-1, H]

    tts_bos = jnp.asarray(mm["tts_bos_embed"])  # [H]
    tts_eos = jnp.asarray(mm["tts_eos_embed"])
    tts_pad = jnp.asarray(mm["tts_pad_embed"])

    # talker prefill: prompt + [tts_bos] + [reply[0] + codec_bos... the
    # codec pad/bos embeddings are ADDED at the last two positions
    codec_pad_embed = talker.codec_embedding(
        talker_params, [talker.codec_pad_id])[0]
    codec_bos_embed = talker.codec_embedding(
        talker_params, [talker.codec_bos_id])[0]
    prefill = jnp.concatenate([
        prompt_part,
        (tts_bos + codec_pad_embed)[None],
        (reply[0] + codec_bos_embed)[None],
    ])

    # streamed decode embeds: remaining reply, then eos embed, then pad
    # embed repeated (engine clamps to the last row)
    decode_embeds = jnp.concatenate([
        reply[1:], tts_eos[None], tts_pad[None],
    ])

    # positions over the talker's text view: prompt + tts_bos + first token
    input_text_ids = prompt_ids + [talker.text_bos_id, gen_ids[0]]
    mm_meta = _mm_meta_from_prompt(original_prompt)
    positions, delta = compute_mrope_positions(
        input_text_ids, _talker_mrope_params(stage, talker), **mm_meta)

    prompt_token_ids = (
        [talker.codec_mask_id] * P
        + [talker.codec_pad_id, talker.codec_bos_id]
    )
    return {
        "prompt_token_ids": prompt_token_ids,
        "prompt_embeds": prefill,
        "additional_information": {
            "decode_embeds": decode_embeds,
            "mrope_positions": positions,
            "mrope_delta": delta,
        },
    }


def _talker_mrope_params(stage, talker):
    from vllm_omni_tpu.multimodal.mrope import MRopeParams, MRopeTokenIds

    ids = stage.config.diffusion_args.get("mm_token_ids", {})
    return MRopeParams(
        tokens=MRopeTokenIds(
            image_token_id=ids.get("image", 151655),
            video_token_id=ids.get("video", 151656),
            audio_token_id=ids.get("audio", 151646),
            vision_start_token_id=ids.get("vision_start", 151652),
            audio_start_token_id=ids.get("audio_start", 151647),
        ),
        spatial_merge_size=getattr(talker, "spatial_merge_size", 2),
    )


def _mm_meta_from_prompt(original_prompt) -> dict[str, Any]:
    """Recover mm grid metadata from the original request prompt."""
    out: dict[str, Any] = {}
    if not isinstance(original_prompt, dict):
        return out
    mm = original_prompt.get("multi_modal_data") or {}
    from vllm_omni_tpu.multimodal.audio import log_mel_spectrogram

    if mm.get("audio"):
        lens = []
        for wav in mm["audio"]:
            if isinstance(wav, tuple):
                wav = wav[0]
            lens.append(len(np.asarray(wav)) // 160)
        out["audio_seqlens"] = lens
    for key, field in (("image", "image_grid_thw"), ("video", "video_grid_thw")):
        grids = []
        for item in mm.get(key, []):
            if isinstance(item, dict) and "grid_thw" in item:
                grids.append(tuple(item["grid_thw"]))
        if grids:
            out[field] = grids
    if mm.get("use_audio_in_video"):
        out["use_audio_in_video"] = True
    if mm.get("second_per_grids"):
        out["second_per_grids"] = mm["second_per_grids"]
    return out


def talker2token2wav(stage, upstream_outputs: dict[int, Any], original_prompt):
    """Talker codec tokens -> token2wav stage prompt.

    Parity role: talker2code2wav flattening (reference
    stage_input_processors/qwen3_omni.py:124-183) adapted to the
    Qwen2.5-Omni single-codebook talker: generated codes minus the final
    EOS become the one-shot vocoder prompt."""
    src = stage.config.engine_input_source[0]
    out = upstream_outputs[src]
    codes = list(out.outputs[0].token_ids)
    hf = stage.config.engine_args.hf_config or {}
    stop_ids = set(
        stage.config.diffusion_args.get("codec_stop_ids")
        or (int(hf.get("tts_codec_end_token_id", 8294)),
            int(hf.get("tts_codec_pad_token_id", 8292)))
    )
    comp = out.outputs[0]
    if codes and (codes[-1] in stop_ids
                  or comp.finish_reason == "length"):
        # trailing pad/eos, or HF parity: generate() slices codes[:-1]
        # unconditionally, so a length-capped talker also drops its last
        codes = codes[:-1]
    return {"prompt_token_ids": codes}
