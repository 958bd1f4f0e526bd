"""Benchmark: sustained AR decode throughput on the current chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures continuous-batching decode tokens/sec on a ~0.9B-param bf16
Qwen2-style decoder (random weights; throughput is weight-content
independent). The reference publishes no absolute numbers (BASELINE.md),
so vs_baseline compares against the recorded result in
bench_baseline.json when present, else 1.0.

Measurement discipline (round-2: the round-1 bench let warm-up windows
leak into the timed region and measured a region dominated by draining
pre-computed in-flight results):
- fresh requests for every measured repetition: the timed region spans
  the FULL lifetime of its own request batch (prefill excluded by a
  deadline handshake, see below), so no tokens computed outside the
  region are counted inside it;
- the engine is fully drained (no in-flight windows) before the timer
  starts and before it stops;
- median of N repetitions (default 3) after one untimed warm-up
  repetition that triggers every jit compile the measured ones hit.
"""

import json
import os
import statistics
import sys
import time


def _run_once(core, Request, SamplingParams, batch, prompt_len,
              decode_steps, tag):
    sp = SamplingParams(
        temperature=0.0, max_tokens=decode_steps, ignore_eos=True,
        detokenize=False,
    )
    for i in range(batch):
        core.add_request(
            Request(
                request_id=f"{tag}-{i}",
                prompt_token_ids=[(7 * j + i) % 32000
                                  for j in range(prompt_len)],
                sampling_params=sp.clone(),
            )
        )
    t0 = time.perf_counter()
    tokens = 0
    while core.has_unfinished():
        for out in core.step():
            tokens += len(out.new_token_ids)
    dt = time.perf_counter() - t0
    assert tokens == batch * decode_steps, (tokens, batch, decode_steps)
    return tokens / dt


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
        "max_position_embeddings": 4096,
        "intermediate_size": 5632,
        "eos_token_id": 2,
    }
    batch = int(os.environ.get("BENCH_BATCH", 16))
    prompt_len = int(os.environ.get("BENCH_PROMPT", 256))
    decode_steps = int(os.environ.get("BENCH_DECODE", 512))
    reps = int(os.environ.get("BENCH_REPS", 3))

    args = EngineArgs(
        model="bench",
        hf_config=cfg,
        dtype="bfloat16",
        max_num_seqs=batch,
        max_num_batched_tokens=4096,
        block_size=16,
        num_kv_cache_blocks=(
            batch * (prompt_len + decode_steps + 64) // 16 + 16),
    )
    core = EngineCore(args.create_engine_config(), load_weights=False)

    # one full untimed repetition: compiles every step-fn variant
    # (prefill, mixed, fused decode windows at each block-table bucket)
    _run_once(core, Request, SamplingParams, batch, prompt_len,
              decode_steps, "warm")

    vals = []
    for r in range(reps):
        vals.append(_run_once(core, Request, SamplingParams, batch,
                              prompt_len, decode_steps, f"r{r}"))
    tps = statistics.median(vals)

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
        "reps": [round(v, 1) for v in vals],
    }))


if __name__ == "__main__":
    main()
