"""Qwen3-Omni 3-stage pipeline (thinker -> talker -> code2wav) e2e.

Exercises: thinker latent emission (prompt hidden/embeds + mid-layer
accept_hidden_layer capture + per-step embeds + tts embeds), the
thinker2talker chatml segmentation, the talker MTP decode loop, the
talker2code2wav flattening, and the code2wav vocoder."""

import numpy as np

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.config.stage import StageConfig
from vllm_omni_tpu.stages.omni import Omni

TH = 48  # thinker hidden
H = 64   # talker hidden
NQ = 4
IM_START, SYSTEM, USER, ASSISTANT = 90, 91, 92, 93
TTS_BOS, TTS_EOS, TTS_PAD = 94, 95, 96

OMNI_CFG = {
    "im_start_token_id": IM_START,
    "system_token_id": SYSTEM,
    "user_token_id": USER,
    "assistant_token_id": ASSISTANT,
    "tts_bos_token_id": TTS_BOS,
    "tts_eos_token_id": TTS_EOS,
    "tts_pad_token_id": TTS_PAD,
    "thinker_config": {
        "text_config": {
            "hidden_size": TH, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 16, "intermediate_size": 96,
            "moe_intermediate_size": 32, "num_experts": 4,
            "num_experts_per_tok": 2, "vocab_size": 128,
            "rope_scaling": {"mrope_section": [2, 3, 3]},
            "max_position_embeddings": 512,
        },
        "audio_config": {"d_model": 16, "encoder_layers": 1,
                         "encoder_attention_heads": 2,
                         "encoder_ffn_dim": 32, "output_dim": TH,
                         "num_mel_bins": 128, "n_window": 8,
                         "downsample_hidden_size": 8,
                         "conv_chunksize": 100},
        "vision_config": {"hidden_size": 16, "depth": 1, "num_heads": 2,
                          "intermediate_size": 32, "patch_size": 4,
                          "spatial_merge_size": 2, "temporal_patch_size": 2,
                          "out_hidden_size": TH,
                          "deepstack_visual_indexes": [0]},
    },
    "talker_config": {
        "num_code_groups": NQ,
        "thinker_hidden_size": TH,
        "accept_hidden_layer": 1,
        "codec_eos_token_id": 9999,  # unreachable: fixed-length test run
        "codec_pad_id": 51, "codec_bos_id": 52, "codec_nothink_id": 53,
        "codec_think_bos_id": 54, "codec_think_eos_id": 55,
        "spatial_merge_size": 2,
        "text_config": {
            "hidden_size": H, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 16, "intermediate_size": 96,
            "moe_intermediate_size": 32,
            "shared_expert_intermediate_size": 48,
            "num_experts": 4, "num_experts_per_tok": 2,
            "norm_topk_prob": False, "vocab_size": 64,
            "rope_scaling": {"mrope_section": [2, 3, 3]},
            "max_position_embeddings": 512,
        },
        "code_predictor_config": {
            "hidden_size": H, "num_hidden_layers": 1,
            "num_attention_heads": 2, "num_key_value_heads": 1,
            "head_dim": 16, "intermediate_size": 64,
            "num_code_groups": NQ, "vocab_size": 32,
        },
    },
    "code2wav_config": {
        "codebook_size": 64, "num_quantizers": NQ, "hidden_size": 32,
        "num_hidden_layers": 1, "num_attention_heads": 2,
        "num_key_value_heads": 2, "intermediate_size": 64,
        "sliding_window": 8, "max_position_embeddings": 512,
        "decoder_dim": 32, "upsample_rates": [3, 2],
        "upsampling_ratios": [2], "layer_scale_initial_scale": 0.01,
    },
}


def _stage_cfgs():
    return [
        StageConfig(
            stage_id=0, stage_type="llm",
            engine_args=EngineArgs(
                model="tiny-thinker", hf_config=OMNI_CFG,
                model_arch="Qwen3OmniMoeForConditionalGeneration",
                model_stage="thinker", hf_config_name="thinker_config",
                engine_output_type="latent", load_format="random",
                dtype="float32", max_num_seqs=2,
                max_num_batched_tokens=128, block_size=8,
                num_kv_cache_blocks=64),
            final_output=True, final_output_type="text",
            default_sampling_params={"temperature": 0.0, "max_tokens": 4},
        ),
        StageConfig(
            stage_id=1, stage_type="talker",
            engine_args=EngineArgs(
                model="tiny-talker", hf_config=OMNI_CFG,
                engine_output_type="latent", load_format="random",
                dtype="float32"),
            engine_input_source=[0],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors."
                "qwen3_omni.thinker2talker"),
            diffusion_args={"max_len": 128, "predictor_greedy": True,
                            "suppress_special": False},
            default_sampling_params={"temperature": 0.0, "max_tokens": 3,
                                     "repetition_penalty": 1.05},
        ),
        StageConfig(
            stage_id=2, stage_type="code2wav",
            engine_args=EngineArgs(
                model="tiny-c2w", hf_config=OMNI_CFG,
                hf_config_name="code2wav_config",
                engine_output_type="audio", load_format="random",
                dtype="float32"),
            engine_input_source=[1],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors."
                "qwen3_omni.talker2code2wav"),
            final_output=True, final_output_type="audio",
        ),
    ]


def test_qwen3_omni_three_stage_pipeline():
    # chatml: system segment, user segment, assistant segment
    prompt_ids = (
        [IM_START, SYSTEM, 5, 6]
        + [IM_START, USER, 10, 11, 12]
        + [IM_START, ASSISTANT, 20]
    )
    with Omni(stage_configs=_stage_cfgs()) as omni:
        outs = omni.generate({"prompt_token_ids": prompt_ids})
    assert outs, "no outputs"
    by_stage = {o.stage_id: o for o in outs}
    assert not any(o.error for o in outs), [o.error for o in outs]
    # thinker text output
    text_out = by_stage[0].request_output
    assert len(text_out.outputs[0].token_ids) == 4
    # final audio
    audio_out = by_stage[2].request_output
    wav = np.asarray(
        audio_out.outputs[0].multimodal_output["waveform"]).reshape(-1)
    # 3 frames -> 4 codes/frame; c2w time upsampling (see code2wav
    # cropping semantics): strictly positive finite audio
    assert wav.size > 0
    assert np.isfinite(wav).all()


def test_qwen3_omni_pipeline_streaming_audio_chunks():
    """stream=True end to end: the code2wav stage streams waveform
    chunks (Code2WavEngine.generate_stream) whose concatenation equals
    the non-streamed waveform; the thinker streams per-token partials."""
    import asyncio

    from vllm_omni_tpu.stages.async_omni import AsyncOmni

    prompt_ids = (
        [IM_START, SYSTEM, 5, 6]
        + [IM_START, USER, 10, 11, 12]
        + [IM_START, ASSISTANT, 20]
    )

    async def run():
        omni = AsyncOmni(stage_configs=_stage_cfgs())
        try:
            # force tiny codec chunks so streaming produces >1 chunk
            omni.stages[2].engine.chunk_size = 2
            omni.stages[2].engine.left_context = 1
            partials, finals = [], []
            async for out in omni.generate({"prompt_token_ids": prompt_ids},
                                           stream=True):
                (partials if out.partial else finals).append(out)
            by_stage = {o.stage_id: o for o in finals}
            assert not any(o.error for o in finals), [o.error for o in finals]
            assert set(by_stage) == {0, 2}
            audio_partials = [p for p in partials if p.stage_id == 2]
            assert len(audio_partials) >= 1
            chunks = [np.asarray(p.request_output.outputs[0]
                                 .multimodal_output["waveform_chunk"])
                      for p in audio_partials]
            final_mm = by_stage[2].request_output.outputs[0].multimodal_output
            chunks.append(np.asarray(final_mm["waveform_chunk"]))
            full = np.asarray(final_mm["waveform"]).reshape(-1)
            np.testing.assert_allclose(
                np.concatenate([c.reshape(-1) for c in chunks]), full,
                atol=1e-5)
        finally:
            omni.shutdown()

    asyncio.run(run())


def test_qwen3_omni_pipeline_thinker_multi_step_matches_single():
    """Fused thinker decode windows (emit_full_hidden stage): the
    downstream talker consumes per-token hidden states sliced out of
    the stacked window aux — the final waveform must match the
    single-step pipeline (greedy)."""
    import dataclasses

    prompt_ids = (
        [IM_START, SYSTEM, 5, 6]
        + [IM_START, USER, 10, 11, 12]
        + [IM_START, ASSISTANT, 20]
    )

    def run(ms):
        cfgs = _stage_cfgs()
        cfgs[0].engine_args = dataclasses.replace(
            cfgs[0].engine_args, multi_step_decode=ms)
        with Omni(stage_configs=cfgs) as omni:
            outs = omni.generate({"prompt_token_ids": prompt_ids})
        by_stage = {o.stage_id: o for o in outs}
        assert not any(o.error for o in outs), [o.error for o in outs]
        wav = np.asarray(by_stage[2].request_output.outputs[0]
                         .multimodal_output["waveform"]).reshape(-1)
        toks = list(by_stage[0].request_output.outputs[0].token_ids)
        return toks, wav

    toks1, wav1 = run(1)
    toks2, wav2 = run(2)
    assert toks2 == toks1
    assert wav2.shape == wav1.shape
    np.testing.assert_allclose(wav2, wav1, rtol=2e-4, atol=2e-5)
