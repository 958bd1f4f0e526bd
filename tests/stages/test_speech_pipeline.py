"""End-to-end Qwen2.5-Omni speech pipeline:
thinker (latent) -> talker (codec tokens) -> token2wav (waveform)
with tiny random models through the Omni orchestrator."""

import numpy as np
import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.config.stage import StageConfig
from vllm_omni_tpu.stages.omni import Omni

THINKER_CFG = {
    "architectures": ["Qwen2_5OmniThinkerForConditionalGeneration"],
    "text_config": {
        "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "vocab_size": 152000, "max_position_embeddings": 512,
        "intermediate_size": 128,
        "rope_scaling": {"mrope_section": [2, 3, 3]},
    },
    "audio_config": {
        "num_mel_bins": 128, "d_model": 48, "encoder_layers": 1,
        "encoder_attention_heads": 4, "encoder_ffn_dim": 64,
        "n_window": 25, "output_dim": 64, "max_source_positions": 500,
    },
    "vision_config": {
        "depth": 1, "hidden_size": 32, "intermediate_size": 32,
        "num_heads": 2, "patch_size": 4, "temporal_patch_size": 2,
        "spatial_merge_size": 2, "window_size": 16,
        "fullatt_block_indexes": [0], "out_hidden_size": 64,
    },
    "audio_token_index": 151646,
    "image_token_index": 151655,
    "video_token_index": 151656,
}

TALKER_CFG = {
    "architectures": ["Qwen2_5OmniTalkerForConditionalGeneration"],
    "hidden_size": 64, "embedding_size": 64, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 16,
    "vocab_size": 256, "max_position_embeddings": 512,
    "intermediate_size": 128,
    "rope_scaling": {"mrope_section": [2, 3, 3]},
    "tts_codec_start_token_id": 193, "tts_codec_end_token_id": 194,
    "tts_codec_pad_token_id": 192, "tts_codec_mask_token_id": 196,
    "tts_text_start_token_id": 151860, "tts_text_end_token_id": 151861,
    "tts_text_pad_token_id": 151859,
}

T2W_CFG = {
    "dit_config": {
        "mel_dim": 16, "num_embeds": 256, "emb_dim": 16, "hidden_size": 32,
        "num_hidden_layers": 1, "num_attention_heads": 1, "head_dim": 32,
        "ff_mult": 2, "block_size": 4, "repeats": 2,
        "look_ahead_layers": [0], "look_backward_layers": [0],
        "enc_dim": 8, "enc_emb_dim": 12,
        "enc_channels": [8, 8, 8, 8, 24],
        "enc_kernel_sizes": [5, 3, 3, 3, 1],
        "enc_dilations": [1, 2, 3, 4, 1],
        "enc_res2net_scale": 2, "enc_se_channels": 4,
        "enc_attention_channels": 4,
    },
    "bigvgan_config": {
        "mel_dim": 16, "upsample_initial_channel": 16,
        "upsample_rates": [2, 2], "upsample_kernel_sizes": [4, 4],
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
    },
}


def speech_stage_configs():
    return [
        StageConfig(
            stage_id=0, stage_type="llm",
            engine_args=EngineArgs(
                model="tiny-thinker", hf_config=THINKER_CFG,
                model_arch="Qwen2_5OmniThinkerForConditionalGeneration",
                engine_output_type="latent", dtype="float32",
                load_format="random", max_num_seqs=2,
                max_num_batched_tokens=128, block_size=8,
                num_kv_cache_blocks=64,
            ),
            final_output=True, final_output_type="text",
            default_sampling_params={
                "temperature": 0.0, "max_tokens": 6, "ignore_eos": True,
                "detokenize": False},
        ),
        StageConfig(
            stage_id=1, stage_type="llm",
            engine_args=EngineArgs(
                model="tiny-talker", hf_config=TALKER_CFG,
                model_arch="Qwen2_5OmniTalkerForConditionalGeneration",
                dtype="float32", load_format="random", max_num_seqs=2,
                max_num_batched_tokens=128, block_size=8,
                num_kv_cache_blocks=64,
            ),
            engine_input_source=[0],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors.qwen2_5_omni."
                "thinker2talker"),
            default_sampling_params={
                "temperature": 0.0, "max_tokens": 8, "ignore_eos": True,
                "detokenize": False},
        ),
        StageConfig(
            stage_id=2, stage_type="token2wav",
            engine_args=EngineArgs(
                model="tiny-t2w", hf_config=T2W_CFG, dtype="float32",
                load_format="random",
            ),
            engine_input_source=[1],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors.qwen2_5_omni."
                "talker2token2wav"),
            final_output=True, final_output_type="audio",
            diffusion_args={"num_steps": 2},
        ),
    ]


def test_speech_pipeline_end_to_end():
    with Omni(stage_configs=speech_stage_configs()) as omni:
        outs = omni.generate({
            "prompt_token_ids": [11, 12, 13, 14],
            "additional_information": {
                "tts_bos_id": 151860, "tts_eos_id": 151861,
                "tts_pad_id": 151859,
            },
        })
        by_stage = {o.stage_id: o for o in outs}
        assert set(by_stage) == {0, 2}, [o.error for o in outs]
        # text out from thinker
        assert len(by_stage[0].request_output.outputs[0].token_ids) == 6
        # audio out from token2wav: 8 talker tokens, the last dropped
        # (HF generate slices codes[:-1]) -> 7 codes -> 14 mel -> 4x
        wav = by_stage[2].request_output.outputs[0].multimodal_output[
            "waveform"]
        wav = np.asarray(wav)
        assert wav.ndim == 1 and wav.size == 7 * 2 * 4
        assert np.isfinite(wav).all()
        assert (np.abs(wav) <= 1.0).all()


def test_speech_pipeline_streaming():
    """stream=True: per-token text partials flow from the thinker while
    the talker/token2wav stages still deliver the full audio output."""
    import asyncio

    from vllm_omni_tpu.stages.async_omni import AsyncOmni

    async def run():
        omni = AsyncOmni(stage_configs=speech_stage_configs())
        try:
            partials, finals = [], []
            async for out in omni.generate({
                "prompt_token_ids": [11, 12, 13, 14],
                "additional_information": {
                    "tts_bos_id": 151860, "tts_eos_id": 151861,
                    "tts_pad_id": 151859,
                },
            }, stream=True):
                (partials if out.partial else finals).append(out)
            by_stage = {o.stage_id: o for o in finals}
            assert set(by_stage) == {0, 2}, [o.error for o in finals]
            # thinker text streamed token by token before finishing
            text_partials = [p for p in partials if p.stage_id == 0]
            assert len(text_partials) >= 4
            lens = [len(p.request_output.outputs[0].token_ids)
                    for p in text_partials]
            assert lens == sorted(lens)
            # full audio still arrives from the (non-streaming) last stage
            wav = np.asarray(by_stage[2].request_output.outputs[0]
                             .multimodal_output["waveform"])
            assert wav.size == 7 * 2 * 4 and np.isfinite(wav).all()
        finally:
            omni.shutdown()

    asyncio.run(run())
