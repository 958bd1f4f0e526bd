"""Tensor-parallel correctness: tp>1 on the CPU mesh must reproduce the
single-device greedy tokens exactly (same weights)."""

import numpy as np
import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.engine.llm import LLM
from vllm_omni_tpu.sampling_params import SamplingParams

TINY_CFG = {
    "architectures": ["Qwen2ForCausalLM"],
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "vocab_size": 128,
    "max_position_embeddings": 128,
    "intermediate_size": 128,
    "eos_token_id": 127,
}


def make_llm(tp=1):
    args = EngineArgs(
        model="tiny",
        hf_config=dict(TINY_CFG),
        dtype="float32",
        max_num_seqs=4,
        max_num_batched_tokens=64,
        block_size=8,
        num_kv_cache_blocks=64,
        tensor_parallel_size=tp,
        seed=0,
    )
    return LLM(engine_args=args, load_weights=False)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_matches_single_device(tp):
    base = make_llm(tp=1)
    sharded = make_llm(tp=tp)
    prompts = [[3, 17, 42, 9, 81], [7, 7, 7], [100, 2, 30, 4, 5, 60, 70]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    outs_a = base.generate([{"prompt_token_ids": p} for p in prompts], sp)
    outs_b = sharded.generate([{"prompt_token_ids": p} for p in prompts], sp)
    for a, b in zip(outs_a, outs_b):
        assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_tp_sampled_seeded(tp=2):
    base = make_llm(tp=1)
    sharded = make_llm(tp=tp)
    sp = SamplingParams(temperature=0.9, top_k=10, seed=5, max_tokens=8,
                        ignore_eos=True, detokenize=False)
    a = base.generate({"prompt_token_ids": [5, 6, 7]}, sp)[0]
    b = sharded.generate({"prompt_token_ids": [5, 6, 7]}, sp)[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_tp_rejects_indivisible_kv_heads():
    cfg = dict(TINY_CFG, num_key_value_heads=2)
    args = EngineArgs(
        model="tiny", hf_config=cfg, dtype="float32",
        tensor_parallel_size=4, num_kv_cache_blocks=16,
    )
    with pytest.raises(ValueError):
        LLM(engine_args=args, load_weights=False)
