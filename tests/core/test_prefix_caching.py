"""Automatic prefix caching: block sharing, skipped prompt compute,
output equivalence, refcounts and LRU eviction."""

import numpy as np

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.core.request import Request
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.kv_cache.manager import KVCacheManager
from vllm_omni_tpu.sampling_params import SamplingParams

CFG = {
    "architectures": ["Qwen2ForCausalLM"],
    "hidden_size": 64, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2,
    "vocab_size": 128, "max_position_embeddings": 256,
    "intermediate_size": 128, "eos_token_id": 127,
}


def test_manager_match_and_share():
    kv = KVCacheManager(16, 4, enable_prefix_caching=True)
    prompt = list(range(10))  # 2 full blocks + 2 tokens
    assert kv.match_prefix("a", prompt) == 0
    kv.allocate("a", 10)
    kv.register_prompt("a", prompt)
    a_blocks = list(kv.get_blocks("a"))

    # identical prompt shares the 2 full blocks
    n = kv.match_prefix("b", prompt)
    assert n == 8
    assert kv.get_blocks("b") == a_blocks[:2]
    # divergent tail gets fresh blocks
    kv.allocate("b", 10)
    assert kv.get_blocks("b")[2] not in a_blocks

    # freeing the owner keeps shared blocks alive for b
    kv.free("a")
    assert kv.get_blocks("b")[:2] == a_blocks[:2]
    # still matchable by a third request
    assert kv.match_prefix("c", prompt) == 8
    kv.free("b")
    kv.free("c")
    # blocks become evictable, still matchable
    assert kv.match_prefix("d", prompt) == 8
    kv.free("d")


def test_manager_eviction_under_pressure():
    kv = KVCacheManager(6, 4, enable_prefix_caching=True)  # 5 usable
    p1 = list(range(8))
    kv.match_prefix("a", p1)
    kv.allocate("a", 8)
    kv.register_prompt("a", p1)
    kv.free("a")  # 2 blocks evictable
    # a new request needing 5 blocks must evict them
    assert kv.allocate("big", 20) is not None
    assert kv.match_prefix("e", p1) == 0  # evicted
    kv.free("big")
    kv.free("e")


def test_partial_prefix_match():
    kv = KVCacheManager(16, 4, enable_prefix_caching=True)
    p1 = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    kv.match_prefix("a", p1)
    kv.allocate("a", 9)
    kv.register_prompt("a", p1)
    # same first block, different second
    p2 = [1, 2, 3, 4, 99, 98, 97, 96, 95]
    assert kv.match_prefix("b", p2) == 4
    kv.free("a")
    kv.free("b")


def _generate(enable, prompts, max_tokens=12):
    args = EngineArgs(
        model="t", hf_config=CFG, dtype="float32", max_num_seqs=4,
        max_num_batched_tokens=64, block_size=8, num_kv_cache_blocks=64,
        enable_prefix_caching=enable)
    core = EngineCore(args.create_engine_config(), load_weights=False,
                      pipeline_depth=0)
    for i, p in enumerate(prompts):
        core.add_request(Request(
            request_id=f"r{i}", prompt_token_ids=list(p),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=max_tokens, ignore_eos=True,
                detokenize=False)))
    for _ in range(200):
        core.step()
        if not core.has_unfinished():
            break
    return [list(core.scheduler.requests[f"r{i}"].output_token_ids)
            for i in range(len(prompts))], core


def test_engine_equivalence_and_hit():
    rng = np.random.default_rng(0)
    base = [int(x) for x in rng.integers(0, 100, 19)]
    prompts = [base, base, base[:12] + [101, 102, 103, 104]]
    ref, _ = _generate(False, prompts)
    got, core = _generate(True, prompts)
    assert got == ref
    assert core.scheduler.kv.cache_hits >= 1
