"""MoE ops + Qwen3-MoE model tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.engine.llm import LLM
from vllm_omni_tpu.ops.moe import _experts_dense, _experts_ragged, moe_mlp, route_top_k
from vllm_omni_tpu.sampling_params import SamplingParams

MOE_CFG = {
    "architectures": ["Qwen3MoeForCausalLM"],
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 128,
    "max_position_embeddings": 128,
    "intermediate_size": 96,
    "moe_intermediate_size": 32,
    "num_experts": 8,
    "num_experts_per_tok": 2,
    "norm_topk_prob": True,
    "eos_token_id": 127,
    "head_dim": 16,
}


def test_route_top_k_normalized():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(5, 8)), jnp.float32)
    w, idx = route_top_k(logits, 3)
    assert w.shape == (5, 3) and idx.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    # top-1 index == argmax
    np.testing.assert_array_equal(
        np.asarray(idx[:, 0]), np.argmax(np.asarray(logits), -1))


def test_ragged_matches_dense():
    rng = np.random.default_rng(1)
    T, H, E, I, K = 9, 16, 4, 8, 2
    x = jnp.asarray(rng.normal(size=(T, H)).astype(np.float32))
    wg = jnp.asarray(rng.normal(size=(E, H, I)).astype(np.float32) * 0.1)
    wu = jnp.asarray(rng.normal(size=(E, H, I)).astype(np.float32) * 0.1)
    wd = jnp.asarray(rng.normal(size=(E, I, H)).astype(np.float32) * 0.1)
    logits = jnp.asarray(rng.normal(size=(T, E)).astype(np.float32))
    w, idx = route_top_k(logits, K)
    a = _experts_dense(x, wg, wu, wd, w, idx)
    b = _experts_ragged(x, wg, wu, wd, w, idx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_ragged_vmap_matches_dense():
    """The custom_vmap rule (batch axis folds into tokens) must match the
    dense oracle — this is the lockstep-batched talker's MoE trace."""
    rng = np.random.default_rng(2)
    B, T, H, E, I, K = 3, 5, 16, 4, 8, 2
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    wg = jnp.asarray(rng.normal(size=(E, H, I)).astype(np.float32) * 0.1)
    wu = jnp.asarray(rng.normal(size=(E, H, I)).astype(np.float32) * 0.1)
    wd = jnp.asarray(rng.normal(size=(E, I, H)).astype(np.float32) * 0.1)
    logits = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32))
    w, idx = jax.vmap(lambda l: route_top_k(l, K))(logits)
    a = jax.jit(jax.vmap(lambda x, w, i: _experts_dense(x, wg, wu, wd, w, i)))(
        x, w, idx)
    b = jax.jit(jax.vmap(lambda x, w, i: _experts_ragged(x, wg, wu, wd, w, i)))(
        x, w, idx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                               atol=2e-5)
    # unbatched weights/idx broadcast correctly too
    c = jax.jit(jax.vmap(lambda x: _experts_ragged(
        x, wg, wu, wd, w[0], idx[0])))(x)
    d = jax.jit(jax.vmap(lambda x: _experts_dense(
        x, wg, wu, wd, w[0], idx[0])))(x)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), rtol=2e-4,
                               atol=2e-5)


def make_llm(tp=1, ep=1, impl="auto"):
    args = EngineArgs(
        model="tiny-moe",
        hf_config=dict(MOE_CFG),
        dtype="float32",
        max_num_seqs=4,
        max_num_batched_tokens=64,
        block_size=8,
        num_kv_cache_blocks=64,
        tensor_parallel_size=tp,
        expert_parallel_size=ep,
        seed=0,
    )
    llm = LLM(engine_args=args, load_weights=False)
    llm.core.runner.model.moe_impl = impl
    return llm


PROMPTS = [[3, 17, 42, 9], [7, 7, 7, 7, 7, 7]]
SP = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                    detokenize=False)


@pytest.fixture(scope="module")
def base_out():
    llm = make_llm()
    outs = llm.generate([{"prompt_token_ids": p} for p in PROMPTS], SP)
    return llm, [o.outputs[0].token_ids for o in outs]


def test_moe_generates(base_out):
    _, tokens = base_out
    assert all(len(t) == 5 for t in tokens)


def test_moe_dense_vs_ragged_impl(base_out):
    llm, tokens = base_out
    llm2 = make_llm(impl="dense")
    llm2.core.runner.params = llm.core.runner.params
    outs = llm2.generate([{"prompt_token_ids": p} for p in PROMPTS], SP)
    assert [o.outputs[0].token_ids for o in outs] == tokens


@pytest.mark.parametrize("tp,ep", [(1, 2), (2, 1), (2, 2), (1, 4)])
def test_moe_parallel_matches_single(base_out, tp, ep):
    llm, tokens = base_out
    sharded = make_llm(tp=tp, ep=ep)
    outs = sharded.generate([{"prompt_token_ids": p} for p in PROMPTS], SP)
    assert [o.outputs[0].token_ids for o in outs] == tokens


def test_moe_weight_roundtrip(tmp_path):
    """Synthesize an HF-format MoE checkpoint and load it back."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    L, H, E, I, D = 2, 64, 8, 32, 16
    Hq, Hkv = 4, 2
    out = {}
    for li in range(L):
        pre = f"model.layers.{li}."
        out[pre + "input_layernorm.weight"] = np.ones(H, np.float32)
        out[pre + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        out[pre + "self_attn.q_proj.weight"] = rng.normal(
            size=(Hq * D, H)).astype(np.float32)
        out[pre + "self_attn.k_proj.weight"] = rng.normal(
            size=(Hkv * D, H)).astype(np.float32)
        out[pre + "self_attn.v_proj.weight"] = rng.normal(
            size=(Hkv * D, H)).astype(np.float32)
        out[pre + "self_attn.o_proj.weight"] = rng.normal(
            size=(H, Hq * D)).astype(np.float32)
        out[pre + "self_attn.q_norm.weight"] = np.ones(D, np.float32)
        out[pre + "self_attn.k_norm.weight"] = np.ones(D, np.float32)
        out[pre + "mlp.gate.weight"] = rng.normal(size=(E, H)).astype(np.float32)
        for ei in range(E):
            epre = pre + f"mlp.experts.{ei}."
            out[epre + "gate_proj.weight"] = rng.normal(size=(I, H)).astype(np.float32)
            out[epre + "up_proj.weight"] = rng.normal(size=(I, H)).astype(np.float32)
            out[epre + "down_proj.weight"] = rng.normal(size=(H, I)).astype(np.float32)
    out["model.embed_tokens.weight"] = rng.normal(size=(128, H)).astype(np.float32)
    out["model.norm.weight"] = np.ones(H, np.float32)
    out["lm_head.weight"] = rng.normal(size=(128, H)).astype(np.float32)
    save_file(out, str(tmp_path / "model.safetensors"))

    from vllm_omni_tpu.models.weight_loader import load_qwen_moe_weights

    params = load_qwen_moe_weights(
        str(tmp_path), num_layers=L, num_experts=E, dtype=jnp.float32)
    assert params["layers"]["router"].shape == (L, H, E)
    assert params["layers"]["experts_gate"].shape == (L, E, H, I)
    assert params["layers"]["experts_down"].shape == (L, E, I, H)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["experts_up"][1, 3]),
        out["model.layers.1.mlp.experts.3.up_proj.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(params["layers"]["router"][0]),
        out["model.layers.0.mlp.gate.weight"].T,
    )
