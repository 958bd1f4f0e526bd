"""Weight-only int8 quantization (W8A16) for AR decode.

Parity role: the reference inherits weight quantization from vLLM
engine_args; here it is a TPU-native transform (ops/quant.py) with the
dequant fused into the jitted step's matmuls.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.core.request import Request
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.ops.quant import (
    dequantize_weight,
    quantize_params,
    quantize_weight,
)
from vllm_omni_tpu.sampling_params import SamplingParams

TINY = {
    "architectures": ["Qwen2ForCausalLM"],
    "hidden_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 256,
    "max_position_embeddings": 256,
    "intermediate_size": 256,
    "eos_token_id": 255,
}


def _args(**kw):
    return EngineArgs(
        model="tiny", hf_config=TINY, dtype="float32", max_num_seqs=2,
        max_num_batched_tokens=128, block_size=16, num_kv_cache_blocks=64,
        **kw)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 64, 96)).astype(np.float32))
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8 and qw["q"].shape == w.shape
    assert qw["s"].shape == (3, 96)
    back = dequantize_weight(qw, jnp.float32)
    # symmetric int8: error bounded by half a quantization step per entry
    step = np.asarray(qw["s"])[:, None, :]
    assert np.all(np.abs(np.asarray(back - w)) <= step * 0.5 + 1e-7)


def test_quantized_engine_close_to_fp32():
    core_fp = EngineCore(_args().create_engine_config(),
                         load_weights=False, pipeline_depth=0)
    core_q = EngineCore(_args(quantization="int8").create_engine_config(),
                        load_weights=False, pipeline_depth=0)
    # same init seed -> quantized params derive from the same weights
    lp = core_q.runner.params["layers"]
    qname = "qkv_proj" if "qkv_proj" in lp else "q_proj"
    assert lp[qname]["q"].dtype == jnp.int8
    assert "q" not in core_q.runner.params["embed_tokens"]

    def gen(core):
        core.add_request(Request(
            request_id="r", prompt_token_ids=list(range(1, 30)),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=8, ignore_eos=True,
                detokenize=False)))
        toks = []
        while core.has_unfinished():
            for o in core.step():
                toks.extend(o.new_token_ids)
        return toks

    t_fp, t_q = gen(core_fp), gen(core_q)
    assert len(t_q) == 8
    # per-channel int8 weights: greedy paths agree on most steps for a
    # tiny random model (logit gaps are small there, so exact-match on
    # every step is not guaranteed)
    agree = sum(a == b for a, b in zip(t_fp, t_q))
    assert agree >= 5, (t_fp, t_q)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_quantized_tp_matches_single_device():
    single = EngineCore(_args(quantization="int8").create_engine_config(),
                        load_weights=False, pipeline_depth=0)
    tp = EngineCore(
        _args(quantization="int8",
              tensor_parallel_size=2).create_engine_config(),
        load_weights=False, pipeline_depth=0)

    def gen(core):
        core.add_request(Request(
            request_id="r", prompt_token_ids=[5, 6, 7, 8],
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=6, ignore_eos=True,
                detokenize=False)))
        toks = []
        while core.has_unfinished():
            for o in core.step():
                toks.extend(o.new_token_ids)
        return toks

    assert gen(single) == gen(tp)


def test_fp8_kv_cache_close_to_full_precision():
    """kv_cache_dtype=fp8: cache halves, decode stays close to exact."""
    core_ref = EngineCore(_args().create_engine_config(),
                          load_weights=False, pipeline_depth=0)
    core_fp8 = EngineCore(
        _args(kv_cache_dtype="fp8").create_engine_config(),
        load_weights=False, pipeline_depth=0)
    assert core_fp8.runner.kv_cache["k"].dtype == jnp.float8_e4m3fn

    def gen(core):
        core.add_request(Request(
            request_id="r", prompt_token_ids=list(range(2, 40)),
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=8, ignore_eos=True,
                detokenize=False)))
        toks = []
        while core.has_unfinished():
            for o in core.step():
                toks.extend(o.new_token_ids)
        return toks

    t_ref, t_fp8 = gen(core_ref), gen(core_fp8)
    assert len(t_fp8) == 8
    agree = sum(a == b for a, b in zip(t_ref, t_fp8))
    assert agree >= 5, (t_ref, t_fp8)
