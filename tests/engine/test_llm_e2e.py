"""End-to-end AR engine tests on a tiny random Qwen2 against a dense oracle.

The oracle recomputes full dense causal attention from scratch for every
step (no KV cache, no paging, no batching) using the same params — so any
divergence pins a bug in the paged-attention / scheduler / runner path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.engine.llm import LLM
from vllm_omni_tpu.models.layers import rms_norm
from vllm_omni_tpu.ops.rope import apply_rope, rope_table
from vllm_omni_tpu.sampling_params import SamplingParams

TINY_CFG = {
    "architectures": ["Qwen2ForCausalLM"],
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 128,
    "max_position_embeddings": 128,
    "intermediate_size": 128,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "eos_token_id": 127,
}


def make_llm(**kw):
    defaults = dict(
        model="tiny",
        hf_config=dict(TINY_CFG),
        dtype="float32",
        max_num_seqs=4,
        max_num_batched_tokens=64,
        block_size=8,
        num_kv_cache_blocks=64,
    )
    defaults.update(kw)
    args = EngineArgs(**defaults)
    return LLM(engine_args=args, load_weights=False)


def _unfused(lp, model):
    """Split engine-fused qkv/gateup weights back for the oracle (also
    proves the fused layout is the same math)."""
    if "qkv_proj" not in lp:
        return lp
    lp = dict(lp)
    qkv = lp.pop("qkv_proj")
    s1 = model.Hq * model.D
    s2 = s1 + model.Hkv * model.D
    lp["q_proj"], lp["k_proj"], lp["v_proj"] = (
        qkv[..., :s1], qkv[..., s1:s2], qkv[..., s2:])
    b = lp.pop("qkv_bias", None)
    if b is not None:
        lp["q_bias"], lp["k_bias"], lp["v_bias"] = (
            b[..., :s1], b[..., s1:s2], b[..., s2:])
    lp["gate_proj"], lp["up_proj"] = jnp.split(
        lp.pop("gateup_proj"), 2, axis=-1)
    return lp


def dense_greedy_continue(model, params, prompt_ids, num_new):
    """Dense full-recompute greedy decoding oracle."""
    ids = list(prompt_ids)
    cos, sin = rope_table(model.D, 128, model.theta)
    for _ in range(num_new):
        n = len(ids)
        h = params["embed_tokens"][jnp.asarray(ids)]
        pos = jnp.arange(n)
        lp = _unfused(params["layers"], model)
        for li in range(model.L):
            p = {k: v[li] for k, v in lp.items()}
            res = h
            hn = rms_norm(h, p["input_layernorm"], model.eps)
            q = hn @ p["q_proj"] + p["q_bias"]
            k = hn @ p["k_proj"] + p["k_bias"]
            v = hn @ p["v_proj"] + p["v_bias"]
            q = q.reshape(n, model.Hq, model.D)
            k = k.reshape(n, model.Hkv, model.D)
            v = v.reshape(n, model.Hkv, model.D)
            q, k = apply_rope(q, k, pos, cos, sin)
            G = model.Hq // model.Hkv
            qg = q.reshape(n, model.Hkv, G, model.D)
            scores = jnp.einsum("thgd,lhd->thgl", qg, k) * model.scale
            mask = pos[None, :] <= pos[:, None]
            scores = jnp.where(mask[:, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("thgl,lhd->thgd", probs, v).reshape(
                n, model.Hq * model.D)
            h = res + attn @ p["o_proj"]
            res = h
            hn = rms_norm(h, p["post_attention_layernorm"], model.eps)
            gate = jax.nn.silu(hn @ p["gate_proj"])
            h = res + (gate * (hn @ p["up_proj"])) @ p["down_proj"]
        h = rms_norm(h, params["norm"], model.eps)
        logits = h[-1] @ params["lm_head"]
        ids.append(int(jnp.argmax(logits)))
    return ids[len(prompt_ids):]


@pytest.fixture(scope="module")
def llm():
    return make_llm()


def test_greedy_matches_dense_oracle(llm):
    prompt = [3, 17, 42, 9, 81, 60, 2]
    out = llm.generate(
        {"prompt_token_ids": prompt},
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                       detokenize=False),
    )[0]
    got = out.outputs[0].token_ids
    expected = dense_greedy_continue(
        llm.core.runner.model, llm.core.runner.params, prompt, 8)
    assert got == expected
    assert out.finished
    assert out.outputs[0].finish_reason == "length"


def test_batch_matches_sequential(llm):
    prompts = [[5, 9, 23], [77, 3, 8, 1, 50, 11], [100]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        detokenize=False)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    for p, o in zip(prompts, outs):
        expected = dense_greedy_continue(
            llm.core.runner.model, llm.core.runner.params, p, 6)
        assert o.outputs[0].token_ids == expected


def test_chunked_prefill_matches(llm):
    # prompt longer than the 64-token step budget forces chunking when
    # run on an engine with a small budget
    small = make_llm(max_num_batched_tokens=16)
    small.core.runner.params = llm.core.runner.params  # share weights
    prompt = list(np.random.default_rng(0).integers(0, 127, size=40))
    prompt = [int(x) for x in prompt]
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                        detokenize=False)
    out = small.generate({"prompt_token_ids": prompt}, sp)[0]
    expected = dense_greedy_continue(
        llm.core.runner.model, llm.core.runner.params, prompt, 4)
    assert out.outputs[0].token_ids == expected


def test_stop_token_id(llm):
    prompt = [3, 17, 42, 9]
    expected = dense_greedy_continue(
        llm.core.runner.model, llm.core.runner.params, prompt, 8)
    stop_at = expected[3]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        detokenize=False, stop_token_ids=[stop_at])
    out = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    assert out.outputs[0].token_ids == expected[:4]
    assert out.outputs[0].finish_reason == "stop"
    assert out.outputs[0].stop_reason == stop_at


def test_sampling_is_seeded_and_varied(llm):
    prompt = [8, 8, 8]
    sp = SamplingParams(temperature=1.0, top_p=0.9, seed=7, max_tokens=12,
                        ignore_eos=True, detokenize=False)
    a = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    b = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids
    sp2 = SamplingParams(temperature=1.0, top_p=0.9, seed=8, max_tokens=12,
                         ignore_eos=True, detokenize=False)
    c = llm.generate({"prompt_token_ids": prompt}, sp2)[0]
    assert a.outputs[0].token_ids != c.outputs[0].token_ids


def test_latent_output_collects_hidden(llm):
    llm_latent = make_llm(engine_output_type="latent")
    llm_latent.core.runner.params = llm.core.runner.params
    prompt = [4, 5, 6]
    sp = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True,
                        detokenize=False)
    out = llm_latent.generate({"prompt_token_ids": prompt}, sp)[0]
    mm = out.outputs[0].multimodal_output
    assert mm is not None and "last_hidden" in mm
    assert mm["last_hidden"].shape == (3, 64)  # [steps, H]


def test_prompt_embeds_change_output(llm):
    prompt = [3, 17, 42, 9]
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                        detokenize=False)
    base = llm.generate({"prompt_token_ids": prompt}, sp)[0]
    rng = np.random.default_rng(1)
    embeds = rng.normal(size=(4, 64)).astype(np.float32)
    out = llm.generate(
        {"prompt_token_ids": prompt, "prompt_embeds": embeds}, sp)[0]
    assert out.outputs[0].token_ids != base.outputs[0].token_ids


def test_suppress_token_ids():
    """Suppressed ids never get sampled (greedy picks runner-up)."""
    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.engine.llm import LLM
    from vllm_omni_tpu.sampling_params import SamplingParams

    cfg = {
        "architectures": ["Qwen2ForCausalLM"], "hidden_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "vocab_size": 128,
        "max_position_embeddings": 128, "intermediate_size": 128,
        "eos_token_id": 127,
    }
    llm = LLM(engine_args=EngineArgs(
        model="t", hf_config=cfg, dtype="float32", max_num_seqs=2,
        max_num_batched_tokens=64, block_size=8, num_kv_cache_blocks=32),
        load_weights=False)
    base = llm.generate(
        {"prompt_token_ids": [1, 2, 3]},
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                       detokenize=False))[0].outputs[0].token_ids
    sup = llm.generate(
        {"prompt_token_ids": [1, 2, 3]},
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                       detokenize=False,
                       suppress_token_ids=list(base[:2])))[0] \
        .outputs[0].token_ids
    assert base[0] not in sup and base[1] not in sup


def test_logprobs():
    import numpy as np

    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.engine.llm import LLM
    from vllm_omni_tpu.sampling_params import SamplingParams

    cfg = {
        "architectures": ["Qwen2ForCausalLM"], "hidden_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "vocab_size": 128,
        "max_position_embeddings": 128, "intermediate_size": 128,
        "eos_token_id": 127,
    }
    llm = LLM(engine_args=EngineArgs(
        model="t", hf_config=cfg, dtype="float32", max_num_seqs=2,
        max_num_batched_tokens=64, block_size=8, num_kv_cache_blocks=32),
        load_weights=False)
    out = llm.generate(
        {"prompt_token_ids": [1, 2, 3]},
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                       detokenize=False, logprobs=3))[0].outputs[0]
    assert out.logprobs is not None and len(out.logprobs) == 5
    for tok, entry in zip(out.token_ids, out.logprobs):
        assert tok in entry  # sampled token always present
        assert 3 <= len(entry) <= 4
        assert all(v <= 0.0 for v in entry.values())
        # greedy: sampled token has the max logprob
        assert entry[tok] == max(entry.values())
    probs = np.exp(np.asarray(
        [sorted(e.values(), reverse=True) for e in out.logprobs]))
    assert (probs <= 1.0 + 1e-6).all()


def test_preemption_preserves_output_and_penalty_state():
    """Recompute-preemption must neither re-emit tokens nor reset the
    max_tokens budget, and the device penalty state must be rebuilt from
    the replayed outputs: a run forced through preemption matches a run
    with ample KV blocks exactly (ADVICE r1 #2)."""
    sp = SamplingParams(
        temperature=0.0, max_tokens=20, ignore_eos=True, detokenize=False,
        repetition_penalty=1.3, presence_penalty=0.4, frequency_penalty=0.2,
    )
    prompts = [
        {"prompt_token_ids": [3, 17, 42, 9, 81, 60, 2]},
        {"prompt_token_ids": [5, 9, 23, 77, 3]},
    ]
    big = make_llm(num_kv_cache_blocks=64)
    ref = [o.outputs[0].token_ids for o in big.generate(prompts, sp)]
    # 5 usable blocks of 8 tokens: both requests fit at prefill, but
    # decode growth needs 6 -> one gets preempted and must recompute
    small = make_llm(num_kv_cache_blocks=6)
    # share weights so outputs are comparable
    small.core.runner.params = jax.tree.map(
        lambda x: x, big.core.runner.params)
    got = [o.outputs[0].token_ids for o in small.generate(prompts, sp)]
    assert small.core.scheduler.num_preemptions > 0
    assert got == ref


def test_generate_stream_preserves_concurrent_request_output():
    """A generate_stream loop must not swallow the finished output of a
    separately-added request (review fix: orphaned outputs are parked
    for their run_to_completion caller)."""
    llm = make_llm()
    sp_short = SamplingParams(temperature=0.0, max_tokens=2,
                              ignore_eos=True, detokenize=False)
    sp_long = SamplingParams(temperature=0.0, max_tokens=10,
                             ignore_eos=True, detokenize=False)
    rid_bg = llm.add_request({"prompt_token_ids": [5, 6, 7]}, sp_short)
    # stream a longer request: the short one finishes mid-stream
    stream_toks = []
    for out in llm.generate_stream({"prompt_token_ids": [1, 2, 3]},
                                   sp_long):
        stream_toks.append(out)
    assert stream_toks[-1].finished
    assert len(stream_toks[-1].outputs[0].token_ids) == 10
    results = llm.run_to_completion({rid_bg})
    assert len(results[rid_bg].outputs[0].token_ids) == 2
