"""Offline multi-stage pipeline benchmark runner.

Parity: the reference's benchmark harness (reference
benchmarks/qwen3-omni/vllm_omni/eval_qwen3_moe_omni.sh +
benchmarks/README.md "Metrics to watch"): feed N text prompts through
the stage DAG CONCURRENTLY, write `<prefix>.orchestrator.stats.jsonl`
(per-request per-stage metrics) and `<prefix>.overall.stats.jsonl`
(e2e latency), print overall_tps + per-stage `*_tps_avg` + p50/p99 e2e.

Usage:
  python benchmarks/omni_eval.py --model /path/to/Qwen3-Omni-MoE \
      --prompts prompts.txt --num-prompts 100 --output-prefix run1
  # random-weight Qwen3-Omni-shaped 3-stage DAG (no checkpoint needed):
  python benchmarks/omni_eval.py --model bench:qwen3-omni \
      --num-prompts 100 --concurrency 32 --output-modality audio
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="checkpoint path, or bench:qwen3-omni for the "
                        "random-weight 3-stage speech DAG")
    p.add_argument("--stage-configs", default=None,
                   help="stage YAML (default: auto-resolved from the model)")
    p.add_argument("--prompts", default=None,
                   help="text file, one prompt per line (SeedTTS-style)")
    p.add_argument("--num-prompts", type=int, default=20)
    p.add_argument("--max-tokens", type=int, default=256)
    p.add_argument("--concurrency", type=int, default=32,
                   help="max in-flight requests (thinker continuous "
                        "batch + per-stage batch assembly bound)")
    p.add_argument("--warmup", type=int, default=2,
                   help="untimed warm-up requests (compile)")
    p.add_argument("--output-modality", default=None,
                   choices=[None, "text", "audio"])
    p.add_argument("--output-prefix", default="omni_eval")
    args = p.parse_args()

    from vllm_omni_tpu.stages.omni import Omni

    if args.prompts:
        with open(args.prompts) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
        prompts = prompts[: args.num_prompts]
        inputs = [{"prompt": t} for t in prompts]
    elif args.model.startswith("bench:"):
        from bench_shapes import speech_prompt

        inputs = [{"prompt_token_ids": speech_prompt(i)}
                  for i in range(args.num_prompts)]
    else:
        inputs = [{"prompt_token_ids": [2 + (7 * j + i) % 1000
                                        for j in range(32)]}
                  for i in range(args.num_prompts)]

    omni_kw: dict = dict(log_stats=True, stats_path_prefix=args.output_prefix)
    if args.model.startswith("bench:"):
        from bench_shapes import qwen3_omni_stage_configs

        omni_kw["stage_configs"] = qwen3_omni_stage_configs(
            max_text=args.max_tokens,
            max_num_seqs=args.concurrency,
            num_kv_cache_blocks=max(512, args.concurrency * 16),
            max_batch_size=args.concurrency)
    else:
        omni_kw.update(model=args.model,
                       stage_configs_path=args.stage_configs)

    with Omni(**omni_kw) as omni:
        if args.warmup:
            omni.generate(inputs[: args.warmup],
                          output_modality=args.output_modality)
            for s in omni.metrics.stage_stats.values():
                s.num_requests = 0
                s.total_gen_time_s = 0.0
                s.total_output_tokens = 0
                s.total_rx_bytes = 0
                s.latencies_s.clear()
            omni.metrics.request_start.clear()
            omni.metrics.request_end.clear()
            omni.metrics.request_tokens.clear()
        t0 = time.perf_counter()
        outs = omni.generate(inputs, output_modality=args.output_modality)
        wall = time.perf_counter() - t0

        errors = [o.error for o in outs if o.error]
        summary = omni.metrics.summary()
        per_stage = {
            f"stage{sid}_tps_avg": round(ss.tps_avg, 2)
            for sid, ss in omni.metrics.stage_stats.items()
        }
        starts = omni.metrics.request_start
        ends = omni.metrics.request_end
        e2e = sorted(ends[r] - starts[r] for r in ends if r in starts)

    # the reference's headline overall_tps counts every stage's
    # generated tokens over the wall (qwen3_omni_moe_transformers.py:182
    # total_tokens / total_time); audio finals carry no token ids, so
    # the per-request token counter alone under-counts
    stage_tokens = sum(ss.total_output_tokens
                       for ss in omni.metrics.stage_stats.values())
    rec = {
        "num_prompts": len(inputs),
        "concurrency": args.concurrency,
        "errors": len(errors),
        "wall_s": round(wall, 3),
        "overall_tps": round(stage_tokens / wall, 2) if wall > 0 else 0.0,
        "total_stage_tokens": stage_tokens,
        **per_stage,
        "p50_e2e_s": round(e2e[len(e2e) // 2], 3) if e2e else None,
        "p99_e2e_s": (round(e2e[min(len(e2e) - 1, int(len(e2e) * 0.99))], 3)
                      if e2e else None),
        **{k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in summary.items()
           if k not in ("stages", "overall_tps")},
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
