"""n-gram speculative decoding: identical greedy streams vs baseline,
with real acceptance on repetitive contexts."""

import numpy as np

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.core.request import Request
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.sampling_params import SamplingParams

CFG = {
    "architectures": ["Qwen2ForCausalLM"], "hidden_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "vocab_size": 64,
    "max_position_embeddings": 256, "intermediate_size": 128,
    "eos_token_id": 63,
}


def _run(spec_k, prompts, max_tokens=24):
    args = EngineArgs(
        model="t", hf_config=CFG, dtype="float32", max_num_seqs=4,
        max_num_batched_tokens=64, block_size=8, num_kv_cache_blocks=64,
        num_speculative_tokens=spec_k)
    core = EngineCore(args.create_engine_config(), load_weights=False,
                      pipeline_depth=0)
    for i, p in enumerate(prompts):
        core.add_request(Request(
            request_id=f"r{i}", prompt_token_ids=list(p),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=max_tokens, ignore_eos=True,
                detokenize=False)))
    steps = 0
    emitted = {f"r{i}": [] for i in range(len(prompts))}
    for _ in range(300):
        for out in core.step():
            emitted[out.request_id].extend(out.new_token_ids)
        steps += 1
        if not core.has_unfinished():
            break
    outs = [list(core.scheduler.requests[f"r{i}"].output_token_ids)
            for i in range(len(prompts))]
    return outs, steps, emitted


def test_spec_greedy_equivalence():
    # a tiny greedy model falls into repetitive loops quickly: ngram
    # lookup should accept often, and streams must be IDENTICAL
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [5, 6, 5, 6, 5]]
    base, base_steps, _ = _run(0, prompts)
    spec, spec_steps, emitted = _run(4, prompts)
    assert spec == base
    # engine-visible incremental tokens match the final streams
    for i, toks in enumerate(base):
        assert emitted[f"r{i}"] == toks
    # repetitive greedy decoding must accept speculative tokens
    assert spec_steps < base_steps


def test_spec_respects_max_tokens_and_eos():
    prompts = [[1, 2, 3, 1, 2, 3]]
    base, _, _ = _run(0, prompts, max_tokens=7)
    spec, _, _ = _run(6, prompts, max_tokens=7)
    assert spec == base
    assert len(spec[0]) == 7


def test_spec_off_for_sampled_requests():
    """Sampled/penalized requests never speculate (still correct)."""
    args = EngineArgs(
        model="t", hf_config=CFG, dtype="float32", max_num_seqs=2,
        max_num_batched_tokens=64, block_size=8, num_kv_cache_blocks=32,
        num_speculative_tokens=4)
    core = EngineCore(args.create_engine_config(), load_weights=False,
                      pipeline_depth=0)
    core.add_request(Request(
        request_id="r", prompt_token_ids=[1, 2, 1, 2, 1],
        sampling_params=SamplingParams(
            temperature=0.7, seed=3, top_k=8, max_tokens=10,
            ignore_eos=True, detokenize=False)))
    for _ in range(60):
        core.step()
        if not core.has_unfinished():
            break
    assert len(core.scheduler.requests["r"].output_token_ids) == 10
