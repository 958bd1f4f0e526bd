"""Grammar-constrained decoding: every emitted stream must match the
grammar exactly, the constrained argmax must equal a host-side masked
argmax oracle, and pipelining must not leak stale FSM states."""

import numpy as np
import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.core.request import Request
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.sampling_params import SamplingParams
from vllm_omni_tpu.structured import (
    RegexDFA,
    build_regex_from_schema,
    choice_to_regex,
)
from vllm_omni_tpu.structured.fsm import TokenFSM, compile_fsm

CFG = {
    "architectures": ["Qwen2ForCausalLM"], "hidden_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "vocab_size": 64,
    "max_position_embeddings": 256, "intermediate_size": 128,
    "eos_token_id": 63,
}
EOS = 63

# toy vocab: ids 0..63; give a few ids byte strings a JSON grammar uses
VOCAB = [None] * 64
_tokens = {
    1: b"{", 2: b"}", 3: b'"', 4: b":", 5: b",", 6: b" ",
    7: b"a", 8: b"b", 9: b"c", 10: b"name", 11: b"age",
    12: b"0", 13: b"1", 14: b"2", 15: b"34", 16: b"-",
    17: b'"name"', 18: b'"age"', 19: b"true", 20: b"false",
    21: b"yes", 22: b"no", 23: b"maybe", 24: b"ye", 25: b"s",
}
for k, v in _tokens.items():
    VOCAB[k] = v


def _bits_allowed(fsm, state):
    m = fsm.allowed_mask(state)
    return {
        t for t in range(fsm.vocab_size)
        if (m[t >> 5] >> np.uint32(t & 31)) & np.uint32(1)
    }


def _make_core(**kw):
    args = EngineArgs(
        model="t", hf_config=CFG, dtype="float32", max_num_seqs=4,
        max_num_batched_tokens=64, block_size=8, num_kv_cache_blocks=64,
        **kw)
    return EngineCore(args.create_engine_config(), load_weights=False,
                      pipeline_depth=4)


def _run(core, reqs):
    for r in reqs:
        core.add_request(r)
    for _ in range(400):
        core.step()
        if not core.has_unfinished():
            break
    return {r.request_id: list(core.scheduler.requests[r.request_id]
                               .output_token_ids) for r in reqs}


def _decode(toks):
    return b"".join(VOCAB[t] for t in toks if t != EOS and VOCAB[t])


def test_choice_constraint_e2e():
    fsm = compile_fsm({"choice": ["yes", "no", "maybe"]}, VOCAB, EOS)
    core = _make_core()
    reqs = []
    for i in range(3):
        r = Request(
            request_id=f"r{i}", prompt_token_ids=[7 + i, 8, 9],
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=8, detokenize=False))
        r.grammar_fsm = fsm
        reqs.append(r)
    outs = _run(core, reqs)
    d = RegexDFA(choice_to_regex(["yes", "no", "maybe"]))
    for rid, toks in outs.items():
        text = _decode(toks)
        assert d.matches(text), (rid, toks, text)
        assert toks[-1] == EOS  # grammar forces clean termination


def test_json_schema_constraint_e2e():
    schema = {
        "type": "object",
        "properties": {"age": {"enum": [0, 1, 2, 34]}},
        "required": ["age"],
    }
    fsm = compile_fsm({"json": schema}, VOCAB, EOS)
    core = _make_core()
    r = Request(request_id="j0", prompt_token_ids=[7, 8],
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=24, detokenize=False))
    r.grammar_fsm = fsm
    outs = _run(core, [r])
    text = _decode(outs["j0"])
    d = RegexDFA(build_regex_from_schema(schema))
    assert d.matches(text), text
    import json
    obj = json.loads(text)
    assert isinstance(obj["age"], int)


def test_constrained_argmax_matches_host_oracle():
    """The device-masked argmax must equal host-side masked argmax over
    full unconstrained logits at every step."""
    fsm = compile_fsm({"regex": "(?:yes|no|maybe)"}, VOCAB, EOS)

    # unconstrained run records full greedy logits path via logprobs?
    # simpler: replay — run constrained, then verify each choice was
    # the argmax among allowed tokens by re-running the model free and
    # comparing against mask sets state by state.
    core = _make_core()
    r = Request(request_id="c0", prompt_token_ids=[7, 8, 9],
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=8, detokenize=False))
    r.grammar_fsm = fsm
    outs = _run(core, [r])
    toks = outs["c0"]

    # teacher-force the same core weights on the token prefix and check
    # each emitted token is argmax within the allowed set
    core2 = _make_core()
    core2.runner.params = core.runner.params
    state = 0
    prefix = [7, 8, 9]
    for tok in toks:
        allowed = _bits_allowed(fsm, state)
        assert tok in allowed, (tok, state, allowed)
        r2 = Request(request_id=f"tf{len(prefix)}",
                     prompt_token_ids=list(prefix),
                     sampling_params=SamplingParams(
                         temperature=0.0, max_tokens=1, logprobs=8,
                         ignore_eos=True, detokenize=False))
        core2.add_request(r2)
        while core2.has_unfinished():
            core2.step()
        req2 = core2.scheduler.requests[f"tf{len(prefix)}"]
        # free-run logprobs give the top-8 unconstrained candidates; the
        # constrained choice must dominate every allowed candidate there
        lp = req2.logprobs[0]
        best = max((v for t, v in lp.items() if t in allowed),
                   default=None)
        if tok in lp and best is not None:
            assert lp[tok] == pytest.approx(best)
        if tok == EOS:
            break
        state = fsm.next_state(state, tok)
        prefix.append(tok)


def test_grammar_excluded_from_multistep_and_spec():
    fsm = compile_fsm({"choice": ["yes", "no"]}, VOCAB, EOS)
    core = _make_core(multi_step_decode=8, num_speculative_tokens=4)
    rg = Request(request_id="g", prompt_token_ids=[1, 2, 3, 1, 2, 3],
                 sampling_params=SamplingParams(
                     temperature=0.0, max_tokens=6, detokenize=False))
    rg.grammar_fsm = fsm
    outs = _run(core, [rg])
    text = _decode(outs["g"])
    assert RegexDFA("(?:yes|no)").matches(text), outs


def test_mixed_batch_constrained_and_free():
    fsm = compile_fsm({"choice": ["maybe"]}, VOCAB, EOS)
    core = _make_core()
    rg = Request(request_id="g", prompt_token_ids=[7, 8],
                 sampling_params=SamplingParams(
                     temperature=0.0, max_tokens=8, detokenize=False))
    rg.grammar_fsm = fsm
    rf = Request(request_id="f", prompt_token_ids=[7, 8],
                 sampling_params=SamplingParams(
                     temperature=0.0, max_tokens=8, ignore_eos=True,
                     detokenize=False))
    outs = _run(core, [rg, rf])
    assert _decode(outs["g"]) == b"maybe"
    # the free row must be untouched by the neighbor's mask: rerun alone
    core2 = _make_core()
    core2.runner.params = core.runner.params
    rf2 = Request(request_id="f2", prompt_token_ids=[7, 8],
                  sampling_params=SamplingParams(
                      temperature=0.0, max_tokens=8, ignore_eos=True,
                      detokenize=False))
    outs2 = _run(core2, [rf2])
    assert outs2["f2"] == outs["f"]
