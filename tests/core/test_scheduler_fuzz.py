"""Randomized continuous-batching stress: mixed prompt lengths, tiny KV
pool (forces recompute preemption), staggered arrivals and aborts — the
final text of every surviving request must equal its solo run.

The round-1 advisor findings clustered exactly here (preemption replay,
row reuse, penalty re-counting); this fuzz locks those interactions.
"""

import numpy as np
import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.core.request import Request
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.sampling_params import SamplingParams

TINY = {
    "architectures": ["Qwen2ForCausalLM"],
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "vocab_size": 128,
    "max_position_embeddings": 512,
    "intermediate_size": 128,
    "eos_token_id": 127,
}


def _core(num_blocks):
    args = EngineArgs(
        model="tiny", hf_config=TINY, dtype="float32", max_num_seqs=4,
        max_num_batched_tokens=64, block_size=8,
        num_kv_cache_blocks=num_blocks, max_model_len=256)
    return EngineCore(args.create_engine_config(), load_weights=False,
                      pipeline_depth=0)


def _sp(rng):
    kind = rng.integers(0, 3)
    if kind == 0:
        return SamplingParams(temperature=0.0, max_tokens=int(
            rng.integers(4, 20)), ignore_eos=True, detokenize=False)
    if kind == 1:
        return SamplingParams(temperature=0.8, top_k=20, seed=int(
            rng.integers(1, 1000)), max_tokens=int(rng.integers(4, 20)),
            ignore_eos=True, detokenize=False)
    return SamplingParams(temperature=0.0, repetition_penalty=1.3,
                          max_tokens=int(rng.integers(4, 16)),
                          ignore_eos=True, detokenize=False)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_matches_solo_runs(seed):
    rng = np.random.default_rng(seed)
    n_req = 8
    prompts = [rng.integers(0, 126, rng.integers(2, 90)).tolist()
               for _ in range(n_req)]
    sps = [_sp(rng) for _ in range(n_req)]
    abort_at = {2: 5}  # request 2 aborted after 5 engine steps

    # --- solo oracle runs (ample KV, one request at a time)
    expected = {}
    for i, (p, sp) in enumerate(zip(prompts, sps)):
        core = _core(num_blocks=256)
        core.add_request(Request(request_id=f"r{i}", prompt_token_ids=p,
                                 sampling_params=sp.clone()))
        toks = []
        while core.has_unfinished():
            for o in core.step():
                toks.extend(o.new_token_ids)
        expected[f"r{i}"] = toks

    # --- stressed run: tiny KV pool (preemption), staggered arrivals
    core = _core(num_blocks=28)
    got: dict[str, list[int]] = {}
    pending = list(range(n_req))
    steps = 0
    # seed the first two
    for i in pending[:2]:
        core.add_request(Request(request_id=f"r{i}",
                                 prompt_token_ids=prompts[i],
                                 sampling_params=sps[i].clone()))
    added = 2
    while core.has_unfinished() or added < n_req:
        if added < n_req and steps % 3 == 0:
            i = pending[added]
            core.add_request(Request(request_id=f"r{i}",
                                     prompt_token_ids=prompts[i],
                                     sampling_params=sps[i].clone()))
            added += 1
        for rid, at in abort_at.items():
            if steps == at:
                core.abort_request(f"r{rid}")
        for o in core.step():
            got.setdefault(o.request_id, []).extend(o.new_token_ids)
        steps += 1
        assert steps < 2000, "fuzz run livelocked"

    preempted = core.scheduler.num_preemptions
    for i in range(n_req):
        rid = f"r{i}"
        if i in abort_at:
            continue  # aborted mid-flight: only prefix equality required
        assert got.get(rid) == expected[rid], (
            f"{rid} diverged (preemptions={preempted})")
    # the aborted request must not have produced MORE than its solo run
    assert got.get("r2", [])[:len(expected["r2"])] == \
        expected["r2"][:len(got.get("r2", []))]
