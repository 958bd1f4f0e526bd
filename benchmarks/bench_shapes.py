"""Shared random-weight benchmark model shapes.

The Qwen3-Omni-shaped 3-stage speech DAG (thinker -> talker -> code2wav)
at ~3B-thinker scale, used by flagship.py (single-request TTFT) and
omni_eval.py (concurrent-throughput headline). Real checkpoints cannot
be downloaded in this environment; throughput is weight-content
independent, so the stages load random weights at the real shapes.

Reference role: the model `eval_qwen3_moe_omni.sh` serves
(reference benchmarks/qwen3-omni/README.md).
"""

from __future__ import annotations

IM_START, SYSTEM, USER, ASSISTANT = 151644, 151645, 151646, 151647
_TH, _H = 2048, 1024
_NQ = 8

OMNI_BENCH_CFG = {
    "im_start_token_id": IM_START,
    "system_token_id": SYSTEM,
    "user_token_id": USER,
    "assistant_token_id": ASSISTANT,
    "tts_bos_token_id": 151672, "tts_eos_token_id": 151673,
    "tts_pad_token_id": 151671,
    "thinker_config": {
        # Qwen2.5-Omni-3B-thinker-shaped dense text tower
        "text_config": {
            "hidden_size": _TH, "num_hidden_layers": 28,
            "num_attention_heads": 16, "num_key_value_heads": 8,
            "head_dim": 128, "intermediate_size": 8192,
            "moe_intermediate_size": 768, "num_experts": 8,
            "num_experts_per_tok": 2, "vocab_size": 32768,
            "rope_scaling": {"mrope_section": [16, 24, 24]},
            "max_position_embeddings": 8192,
        },
        "audio_config": {"d_model": 512, "encoder_layers": 4,
                         "encoder_attention_heads": 8,
                         "encoder_ffn_dim": 2048, "output_dim": _TH,
                         "num_mel_bins": 128, "n_window": 50,
                         "downsample_hidden_size": 256,
                         "conv_chunksize": 500},
        "vision_config": {"hidden_size": 256, "depth": 4,
                          "num_heads": 4, "intermediate_size": 1024,
                          "patch_size": 14, "spatial_merge_size": 2,
                          "temporal_patch_size": 2,
                          "out_hidden_size": _TH,
                          "deepstack_visual_indexes": [0, 1]},
    },
    "talker_config": {
        "num_code_groups": _NQ, "thinker_hidden_size": _TH,
        "accept_hidden_layer": 18, "codec_eos_token_id": 2150,
        "codec_pad_id": 2148, "codec_bos_id": 2149,
        "codec_nothink_id": 2146, "codec_think_bos_id": 2147,
        "codec_think_eos_id": 2151, "spatial_merge_size": 2,
        "text_config": {
            "hidden_size": _H, "num_hidden_layers": 12,
            "num_attention_heads": 8, "num_key_value_heads": 4,
            "head_dim": 128, "intermediate_size": 4096,
            "moe_intermediate_size": 384,
            "shared_expert_intermediate_size": 1024,
            "num_experts": 8, "num_experts_per_tok": 2,
            "norm_topk_prob": False, "vocab_size": 4096,
            "rope_scaling": {"mrope_section": [8, 12, 12]},
            "max_position_embeddings": 8192,
        },
        "code_predictor_config": {
            "hidden_size": _H, "num_hidden_layers": 4,
            "num_attention_heads": 8, "num_key_value_heads": 4,
            "head_dim": 64, "intermediate_size": 2048,
            "num_code_groups": _NQ, "vocab_size": 2048,
        },
    },
    "code2wav_config": {
        "codebook_size": 2048, "num_quantizers": _NQ,
        "hidden_size": 512, "num_hidden_layers": 8,
        "num_attention_heads": 8, "num_key_value_heads": 8,
        "intermediate_size": 2048, "sliding_window": 72,
        "max_position_embeddings": 8192, "decoder_dim": 512,
        "upsample_rates": [5, 3], "upsampling_ratios": [2, 2],
        "layer_scale_initial_scale": 0.01,
    },
}


def qwen3_omni_stage_configs(
    max_text: int = 64,
    max_num_seqs: int = 4,
    num_kv_cache_blocks: int = 512,
    max_batch_size: int = 8,
):
    """The 3-stage bench DAG. `max_num_seqs` bounds the thinker's
    continuous batch; `max_batch_size` bounds per-stage batch assembly
    (talker/code2wav batches)."""
    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.config.stage import StageConfig, StageRuntimeConfig

    def rt():
        return StageRuntimeConfig(max_batch_size=max_batch_size)

    return [
        StageConfig(
            stage_id=0, stage_type="llm",
            engine_args=EngineArgs(
                model="bench-thinker", hf_config=OMNI_BENCH_CFG,
                model_arch="Qwen3OmniMoeForConditionalGeneration",
                model_stage="thinker", hf_config_name="thinker_config",
                engine_output_type="latent", load_format="random",
                dtype="bfloat16", max_num_seqs=max_num_seqs,
                max_num_batched_tokens=2048, block_size=16,
                num_kv_cache_blocks=num_kv_cache_blocks,
                # latent stages fuse decode windows too (round 4):
                # per-substep aux is stacked and sliced apart at drain
                multi_step_decode=8),
            runtime=rt(),
            final_output=True, final_output_type="text",
            default_sampling_params={"temperature": 0.0,
                                     "max_tokens": max_text}),
        StageConfig(
            stage_id=1, stage_type="talker",
            engine_args=EngineArgs(
                model="bench-talker", hf_config=OMNI_BENCH_CFG,
                engine_output_type="latent", load_format="random",
                dtype="bfloat16"),
            runtime=rt(),
            engine_input_source=[0],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors."
                "qwen3_omni.thinker2talker"),
            diffusion_args={"max_len": 1024, "predictor_greedy": True,
                            "suppress_special": False},
            default_sampling_params={"temperature": 0.0,
                                     "max_tokens": max_text,
                                     "repetition_penalty": 1.05}),
        StageConfig(
            stage_id=2, stage_type="code2wav",
            engine_args=EngineArgs(
                model="bench-c2w", hf_config=OMNI_BENCH_CFG,
                hf_config_name="code2wav_config",
                engine_output_type="audio", load_format="random",
                dtype="bfloat16"),
            runtime=rt(),
            engine_input_source=[1],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors."
                "qwen3_omni.talker2code2wav"),
            final_output=True, final_output_type="audio"),
    ]


def speech_prompt(i: int = 0, user_tokens: int = 48) -> list[int]:
    """Synthetic chat-shaped token prompt (SeedTTS stand-in; per-index
    variation so concurrent requests are not byte-identical)."""
    return ([IM_START, SYSTEM] + [(11 * j) % 32000 for j in range(16)]
            + [IM_START, USER]
            + [(13 * j + 7 * i) % 32000 for j in range(user_tokens)]
            + [IM_START, ASSISTANT, 77])


# ---- TTFT-breakdown instrumentation (flagship.py pipeline) -----------
# Stream-processor subclasses that timestamp the first event on each
# cross-stage edge; flagship's bench_pipeline subtracts the request t0
# to name where speech TTFT milliseconds sit (VERDICT r4 Next #2).
BREAKDOWN_EVENTS: dict = {}


def _mark(name: str) -> None:
    import time as _t

    BREAKDOWN_EVENTS.setdefault(name, _t.perf_counter())


def _make_instrumented():
    from vllm_omni_tpu.stages.input_processors.qwen3_omni_streaming import (
        Talker2Code2WavStreaming,
        Thinker2TalkerStreaming,
    )

    class T2TInstrumented(Thinker2TalkerStreaming):
        def on_partial(self, src_stage_id, output):
            _mark("thinker_first_emit")
            r = super().on_partial(src_stage_id, output)
            if r is not None:
                _mark("talker_submitted")
            return r

    class T2CInstrumented(Talker2Code2WavStreaming):
        def on_partial(self, src_stage_id, output):
            _mark("talker_first_frame")
            r = super().on_partial(src_stage_id, output)
            if r is not None:
                _mark("code2wav_submitted")
            return r

    return T2TInstrumented, T2CInstrumented


try:  # import-time resolution targets for stream_input_processor paths
    T2TInstrumented, T2CInstrumented = _make_instrumented()
except Exception:  # pragma: no cover - vllm_omni_tpu not importable
    pass
