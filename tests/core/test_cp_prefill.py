"""Context-parallel (ring attention) long-prompt prefill.

Exceeds the reference, which only surfaces prefill_context_parallel_size
as device accounting (reference entrypoints/omni_stage.py:458) and never
builds its declared ring strategy (diffusion/attention/parallel/
factory.py:31-45). Exactness bar: a seq=4 CP engine must generate the
SAME tokens as a single-device engine for prompts long enough to take
the CP path.
"""

import numpy as np
import pytest

import jax

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.core.request import Request
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.sampling_params import SamplingParams

TINY = {
    "architectures": ["Qwen2ForCausalLM"],
    "hidden_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 256,
    "max_position_embeddings": 512,
    "intermediate_size": 256,
    "eos_token_id": 255,
}


def _make_core(seq_parallel: int, threshold: int = 32) -> EngineCore:
    import os

    os.environ["OMNI_TPU_CP_PREFILL_THRESHOLD"] = str(threshold)
    args = EngineArgs(
        model="tiny", hf_config=TINY, dtype="float32",
        max_num_seqs=4, max_num_batched_tokens=256, block_size=16,
        num_kv_cache_blocks=128,
        sequence_parallel_size=seq_parallel,
    )
    return EngineCore(args.create_engine_config(), load_weights=False,
                      pipeline_depth=0)


def _generate(core: EngineCore, prompts: list[list[int]],
              max_tokens: int = 8) -> dict[str, list[int]]:
    for i, p in enumerate(prompts):
        core.add_request(Request(
            request_id=f"r{i}", prompt_token_ids=p,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=max_tokens, ignore_eos=True,
                detokenize=False),
        ))
    out: dict[str, list[int]] = {}
    while core.has_unfinished():
        for o in core.step():
            out.setdefault(o.request_id, []).extend(o.new_token_ids)
    return out


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_cp_prefill_matches_single_device():
    rng = np.random.default_rng(0)
    # 97 tokens: 96 go through CP (align 32 for seq=4), 1 through the
    # standard path; plus a short prompt that must NOT take the CP path
    long_prompt = rng.integers(0, 255, 97).tolist()
    short_prompt = rng.integers(0, 255, 9).tolist()

    ref_core = _make_core(seq_parallel=1)
    ref = _generate(ref_core, [long_prompt, short_prompt])

    cp_core = _make_core(seq_parallel=4, threshold=32)
    assert cp_core.runner.supports_cp_prefill
    got = _generate(cp_core, [long_prompt, short_prompt])

    assert got["r0"] == ref["r0"]
    assert got["r1"] == ref["r1"]


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_cp_prefill_engaged_and_budget_bypassed():
    """The CP path must actually fire: with the budget at 256 tokens a
    400-token prompt needs two chunked steps, but CP covers 384 of them
    up front so the whole prompt completes in ONE schedule."""
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 255, 400).tolist()
    core = _make_core(seq_parallel=4, threshold=32)
    core.add_request(Request(
        request_id="long", prompt_token_ids=prompt,
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=1, ignore_eos=True,
            detokenize=False),
    ))
    sched_out = core.scheduler.schedule()
    req = core.scheduler.requests["long"]
    # cp_n buckets to align * 2^k (bounded jit variants): 32 * 8 = 256
    assert sched_out.num_scheduled_tokens["long"] == 400 - 256
    assert req.num_computed_tokens == 400

    # penalties keep the exact standard path (penalty state must observe
    # every prompt token)
    core2 = _make_core(seq_parallel=4, threshold=32)
    core2.add_request(Request(
        request_id="pen", prompt_token_ids=prompt,
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=1, ignore_eos=True,
            detokenize=False, repetition_penalty=1.2),
    ))
    core2.scheduler.schedule()
    req2 = core2.scheduler.requests["pen"]
    assert req2.num_computed_tokens <= 256  # chunked, no CP bypass
