"""Benchmark: AR decode throughput on the current chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures continuous-batching decode tokens/sec on a ~0.9B-param bf16
Qwen2-style decoder (random weights; throughput is weight-content
independent). The reference publishes no absolute numbers
(BASELINE.md), so vs_baseline compares against the last locally
recorded result in bench_baseline.json when present, else 1.0.
"""

import json
import os
import sys
import time


def main():
    # throughput mode: fused multi-step windows amortize per-dispatch
    # overhead; a shallow async pipeline keeps windows in flight
    os.environ.setdefault("OMNI_TPU_PIPELINE_DEPTH", "4")
    os.environ.setdefault("OMNI_TPU_MULTI_STEP", "16")
    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.core.request import Request
    from vllm_omni_tpu.engine.core import EngineCore
    from vllm_omni_tpu.sampling_params import SamplingParams

    # ~0.9B params: hidden 2048, 16 layers, 16 heads (head_dim 128 so the
    # pallas kernel engages), GQA 8 kv heads, 32k vocab.
    cfg = {
        "architectures": ["Qwen2ForCausalLM"],
        "hidden_size": 2048,
        "num_hidden_layers": 16,
        "num_attention_heads": 16,
        "num_key_value_heads": 8,
        "vocab_size": 32768,
        "max_position_embeddings": 2048,
        "intermediate_size": 5632,
        "eos_token_id": 2,
    }
    batch = int(os.environ.get("BENCH_BATCH", 16))
    # prompt 256 keeps the whole run inside one block-table width
    # bucket (no mid-measurement recompile)
    prompt_len = int(os.environ.get("BENCH_PROMPT", 256))
    decode_steps = int(os.environ.get("BENCH_DECODE", 128))

    args = EngineArgs(
        model="bench",
        hf_config=cfg,
        dtype="bfloat16",
        max_num_seqs=batch,
        max_num_batched_tokens=4096,
        block_size=16,
        num_kv_cache_blocks=batch * (prompt_len + decode_steps + 64) // 16 + 16,
    )
    core = EngineCore(args.create_engine_config(), load_weights=False)

    sp = SamplingParams(
        temperature=0.0, max_tokens=decode_steps + 8, ignore_eos=True,
        detokenize=False,
    )
    for i in range(batch):
        core.add_request(
            Request(
                request_id=f"b{i}",
                prompt_token_ids=[(7 * j + i) % 32000 for j in range(prompt_len)],
                sampling_params=sp.clone(),
            )
        )

    # prefill (+ first decodes) and warmup compiles
    for _ in range(8):
        core.step()
    # timed decode (outputs lag schedule by the pipeline depth; count
    # tokens actually produced)
    t0 = time.perf_counter()
    tokens = 0
    iters = 0
    while core.has_unfinished() and iters < decode_steps * 4:
        for out in core.step():
            tokens += len(out.new_token_ids)
        iters += 1
    dt = time.perf_counter() - t0
    tps = tokens / dt

    baseline = None
    if os.path.isfile("bench_baseline.json"):
        with open("bench_baseline.json") as f:
            baseline = json.load(f).get("decode_tokens_per_sec")
    vs = (tps / baseline) if baseline else 1.0
    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
