"""Lockstep-batched talker decode == the sequential per-request path.

The concurrency headline (reference benchmarks/qwen3-omni) runs ~100
speech requests through the DAG; the talker previously decoded them
one frame per dispatch PER REQUEST (serialized at batch-1 rate). The
batched path vmaps the jitted prefill/decode over requests — greedy
codes must match the sequential engine exactly."""

import numpy as np

import jax.numpy as jnp

from vllm_omni_tpu.models.qwen3_omni.talker_engine import TalkerEngine
from vllm_omni_tpu.sampling_params import SamplingParams

H, TH, NQ, V, EOS = 64, 48, 4, 64, 50


def _cfg():
    return {
        "talker_config": {
            "num_code_groups": NQ,
            "thinker_hidden_size": TH,
            "accept_hidden_layer": 1,
            "codec_eos_token_id": EOS,
            "codec_pad_id": 51, "codec_bos_id": 52, "codec_nothink_id": 53,
            "codec_think_bos_id": 54, "codec_think_eos_id": 55,
            "spatial_merge_size": 2,
            "text_config": {
                "hidden_size": H, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "head_dim": 16, "intermediate_size": 96,
                "moe_intermediate_size": 32,
                "shared_expert_intermediate_size": 48,
                "num_experts": 8, "num_experts_per_tok": 2,
                "norm_topk_prob": False, "vocab_size": V,
                "rope_theta": 10000.0, "max_position_embeddings": 512,
                "rope_scaling": {"rope_type": "default",
                                 "mrope_section": [2, 3, 3]},
            },
            "code_predictor_config": {
                "hidden_size": H, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "head_dim": 16, "intermediate_size": 96,
                "num_code_groups": NQ, "vocab_size": 32,
                "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
                "max_position_embeddings": 64,
            },
        },
    }


def _prompts(n, rng):
    ps = []
    for i in range(n):
        T = 5 + 2 * i  # ragged prompt lengths
        ps.append({
            "request_id": f"t{i}",
            "inputs_embeds": rng.normal(size=(T, H)).astype(np.float32) * 0.3,
            "mrope_positions": np.broadcast_to(
                np.arange(T, dtype=np.float32), (3, T)).copy(),
            "mrope_delta": 0,
            "trailing_text_hidden": rng.normal(
                size=(2 + i, H)).astype(np.float32) * 0.3,
            "tts_pad_embed": rng.normal(size=(H,)).astype(np.float32) * 0.3,
        })
    return ps


def test_batched_matches_sequential_greedy():
    eng = TalkerEngine(_cfg(), load_weights=False, dtype=jnp.float32,
                       max_len=128, predictor_greedy=True,
                       suppress_special=False)
    rng = np.random.default_rng(0)
    prompts = _prompts(3, rng)
    sps = [SamplingParams(temperature=0.0, repetition_penalty=1.05,
                          max_tokens=4 + i) for i in range(3)]

    seq = [eng._generate_one(p, sp) for p, sp in zip(prompts, sps)]
    bat = eng._generate_batched(list(prompts), list(sps))

    for s, b in zip(seq, bat):
        cs = s.outputs[0].multimodal_output["codes"]
        cb = b.outputs[0].multimodal_output["codes"]
        np.testing.assert_array_equal(cb, cs)
        assert b.outputs[0].finish_reason == s.outputs[0].finish_reason


def test_batched_matches_sequential_multi_window(monkeypatch):
    # force several K=4 decode windows (incl. a budget ending mid-window)
    monkeypatch.setenv("OMNI_TPU_TALKER_WINDOW", "4")
    eng = TalkerEngine(_cfg(), load_weights=False, dtype=jnp.float32,
                       max_len=128, predictor_greedy=True,
                       suppress_special=False)
    rng = np.random.default_rng(1)
    prompts = _prompts(3, rng)
    sps = [SamplingParams(temperature=0.0, repetition_penalty=1.05,
                          max_tokens=m) for m in (3, 11, 18)]

    seq = [eng._generate_one(p, sp) for p, sp in zip(prompts, sps)]
    bat = eng._generate_batched(list(prompts), list(sps))

    for s, b in zip(seq, bat):
        cs = s.outputs[0].multimodal_output["codes"]
        cb = b.outputs[0].multimodal_output["codes"]
        np.testing.assert_array_equal(cb, cs)
        assert b.outputs[0].finish_reason == s.outputs[0].finish_reason
