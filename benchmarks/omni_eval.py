"""Offline multi-stage pipeline benchmark runner.

Parity: the reference's benchmark harness (reference
benchmarks/qwen3-omni/vllm_omni/eval_qwen3_moe_omni.sh +
benchmarks/README.md "Metrics to watch"): feed N text prompts through
the stage DAG, write `<prefix>.orchestrator.stats.jsonl` (per-request
per-stage metrics) and `<prefix>.overall.stats.jsonl` (e2e latency),
print the per-stage `*_tps_avg` summary.

Usage:
  python benchmarks/omni_eval.py --model /path/to/Qwen3-Omni-MoE \
      --prompts prompts.txt --num-prompts 100 --output-prefix run1
  # synthetic prompts when --prompts is omitted
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--stage-configs", default=None,
                   help="stage YAML (default: auto-resolved from the model)")
    p.add_argument("--prompts", default=None,
                   help="text file, one prompt per line (SeedTTS-style)")
    p.add_argument("--num-prompts", type=int, default=20)
    p.add_argument("--max-tokens", type=int, default=256)
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
    else:
        inputs = [{"prompt_token_ids": [2 + (7 * j + i) % 1000
                                        for j in range(32)]}
                  for i in range(args.num_prompts)]

    with Omni(model=args.model, stage_configs_path=args.stage_configs,
              log_stats=True,
              stats_path_prefix=args.output_prefix) as omni:
        t0 = time.perf_counter()
        outs = omni.generate(inputs, output_modality=args.output_modality)
        wall = time.perf_counter() - t0

    errors = [o.error for o in outs if o.error]
    summary = omni.metrics.summary()
    per_stage = {
        f"stage{sid}_tps_avg": round(ss.tps_avg, 2)
        for sid, ss in omni.metrics.stage_stats.items()
    }
    lat = sorted(
        x for ss in omni.metrics.stage_stats.values() for x in ss.latencies_s)
    rec = {
        "num_prompts": len(inputs),
        "errors": len(errors),
        "wall_s": round(wall, 3),
        **per_stage,
        "p50_stage_latency_s": round(lat[len(lat) // 2], 3) if lat else None,
        "p99_stage_latency_s": (round(lat[int(len(lat) * 0.99)], 3)
                                if lat else None),
        **{k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in summary.items()},
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
