"""Ablation harness over bench.py's honest measurement. Not part of CI."""
import json
import os
import sys
import time


def run(batch=16, prompt_len=256, decode_steps=512, nblocks=None,
        multi_step=16, depth=4, gather_max_t=None, reps=2):
    os.environ["OMNI_TPU_PIPELINE_DEPTH"] = str(depth)
    os.environ["OMNI_TPU_MULTI_STEP"] = str(multi_step)
    if gather_max_t is not None:
        os.environ["OMNI_TPU_GATHER_ATTN_MAX_T"] = str(gather_max_t)
    else:
        os.environ.pop("OMNI_TPU_GATHER_ATTN_MAX_T", None)
    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.core.request import Request
    from vllm_omni_tpu.engine.core import EngineCore
    from vllm_omni_tpu.sampling_params import SamplingParams
    from bench import _run_once

    cfg = {
        "architectures": ["Qwen2ForCausalLM"], "hidden_size": 2048,
        "num_hidden_layers": 16, "num_attention_heads": 16,
        "num_key_value_heads": 8, "vocab_size": 32768,
        "max_position_embeddings": 4096, "intermediate_size": 5632,
        "eos_token_id": 2,
    }
    if nblocks is None:
        nblocks = batch * (prompt_len + decode_steps + 64) // 16 + 16
    args = EngineArgs(
        model="bench", hf_config=cfg, dtype="bfloat16",
        max_num_seqs=batch, max_num_batched_tokens=4096, block_size=16,
        num_kv_cache_blocks=nblocks,
    )
    core = EngineCore(args.create_engine_config(), load_weights=False)
    _run_once(core, Request, SamplingParams, batch, prompt_len,
              decode_steps, "warm")
    vals = [
        _run_once(core, Request, SamplingParams, batch, prompt_len,
                  decode_steps, f"r{r}")
        for r in range(reps)
    ]
    return max(vals)


if __name__ == "__main__":
    kw = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    v = run(**kw)
    print(json.dumps({"config": kw, "tok_per_s": round(v, 1)}))
