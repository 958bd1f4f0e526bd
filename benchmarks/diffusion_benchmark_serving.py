"""Online diffusion serving benchmark (t2i over HTTP).

Parity: the reference's diffusion serving benchmark (reference
benchmarks/diffusion_benchmark_serving.py:1-60 — request throughput +
e2e latency percentiles against /v1/images/generations; their vbench
prompt set is replaced by a built-in prompt list since this environment
has no egress).

Usage:
  # against a running server
  python benchmarks/diffusion_benchmark_serving.py \
      --base-url http://127.0.0.1:8000 --num-prompts 16 \
      --height 512 --width 512 --num-inference-steps 20 --concurrency 4

  # self-contained: spin up an in-process server on a random-weight tiny
  # pipeline first (CI / smoke mode)
  python benchmarks/diffusion_benchmark_serving.py --self-serve
"""

from __future__ import annotations

import argparse
import asyncio
import os
import json
import time

PROMPTS = [
    "a watercolor painting of a lighthouse at dawn",
    "macro photo of a dew-covered spider web",
    "isometric illustration of a tiny bustling harbor town",
    "a fox sleeping under cherry blossoms, ukiyo-e style",
    "brutalist architecture against a pastel sunset",
    "a steaming bowl of ramen on a rainy window sill",
    "astronaut planting a garden on a small asteroid",
    "stained glass pattern of deep sea creatures",
]


async def _one(session, url, prompt, args, results):
    t0 = time.perf_counter()
    payload = {
        "prompt": prompt,
        "size": f"{args.width}x{args.height}",
        "n": 1,
    }
    if args.num_inference_steps:
        payload["num_inference_steps"] = args.num_inference_steps
    async with session.post(url, json=payload) as resp:
        body = await resp.json()
        ok = resp.status == 200 and body.get("data")
    results.append({"latency_s": time.perf_counter() - t0, "ok": bool(ok)})


async def run_bench(args) -> dict:
    import aiohttp

    url = args.base_url.rstrip("/") + "/v1/images/generations"
    prompts = [PROMPTS[i % len(PROMPTS)] for i in range(args.num_prompts)]
    results: list[dict] = []
    sem = asyncio.Semaphore(args.concurrency)

    async def guarded(session, p):
        async with sem:
            await _one(session, url, p, args, results)

    t0 = time.perf_counter()
    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=3600)
    ) as session:
        # one warm-up request (jit compile) outside the measured window
        await _one(session, url, prompts[0], args, [])
        t0 = time.perf_counter()
        await asyncio.gather(*[guarded(session, p) for p in prompts])
    wall = time.perf_counter() - t0
    lats = sorted(r["latency_s"] for r in results)
    n = len(lats)
    summary = {
        "num_requests": n,
        "failures": sum(not r["ok"] for r in results),
        "requests_per_sec": round(n / wall, 4),
        "p50_latency_s": round(lats[n // 2], 3),
        "p99_latency_s": round(lats[min(n - 1, int(n * 0.99))], 3),
        "wall_s": round(wall, 2),
        "height": args.height, "width": args.width,
        "num_inference_steps": args.num_inference_steps,
        "concurrency": args.concurrency,
    }
    return summary


def _self_serve(args, flagship: bool = False):
    """In-process server on a random-weight pipeline: tiny smoke shape
    by default; --flagship serves the QwenImage-scale DiT (16L/3072d)
    for the on-chip concurrent-serving datapoint (reference
    diffusion_benchmark_serving.py online-throughput role)."""
    from aiohttp import web

    from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
    from vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
        QwenImagePipeline,
    )
    from vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
        QwenImageTransformerConfig,
    )
    from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
        QwenImageVAEConfig,
    )
    from vllm_omni_tpu.diffusion.omni_diffusion import OmniDiffusion
    from vllm_omni_tpu.entrypoints.openai.api_server import build_app

    import numpy as np

    if flagship:
        quant = os.environ.get("BENCH_DIT_QUANT") or None
        od = OmniDiffusionConfig(
            model="bench-flagship", dtype="bfloat16",
            vae_dtype=os.environ.get("BENCH_VAE_DTYPE", "bfloat16"),
            quantization=quant)
        tf = QwenImageTransformerConfig(
            # 40L (real QwenImage depth) fits one v5e chip at int8 only
            num_layers=int(os.environ.get(
                "BENCH_DIT_LAYERS", 40 if quant == "int8" else 16)),
            attention_head_dim=128, num_attention_heads=24,
            joint_attention_dim=3072, in_channels=64, out_channels=16,
            axes_dims_rope=(16, 56, 56))
        vae = QwenImageVAEConfig(
            base_dim=96, z_dim=16, dim_mult=(1, 2, 4, 4),
            num_res_blocks=2, temperal_downsample=(False, True, True))
        txt_dim = 3072
    else:
        od = OmniDiffusionConfig(model="bench-tiny", dtype="float32")
        tf = QwenImageTransformerConfig(
            num_layers=2, attention_head_dim=32, num_attention_heads=2,
            joint_attention_dim=48, in_channels=16, out_channels=4,
            axes_dims_rope=(8, 12, 12))
        vae = QwenImageVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2),
                                 num_res_blocks=1)
        txt_dim = 48
    rng = np.random.default_rng(0)

    def fake_text_encoder(prompts, drop_prefix=0):
        e = rng.normal(size=(len(prompts), 6, txt_dim)).astype(np.float32)
        return e, np.ones((len(prompts), 6), bool)

    pipe = QwenImagePipeline(od, transformer_config=tf, vae_config=vae,
                             load_weights=False,
                             text_encoder=fake_text_encoder)
    engine = OmniDiffusion(od_config=od, pipeline=pipe)
    app = build_app(diffusion_engine=engine, model_name="bench-tiny")

    async def main():
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", args.port)
        await site.start()
        args.base_url = f"http://127.0.0.1:{args.port}"
        if not flagship:
            args.height = min(args.height, 64)
            args.width = min(args.width, 64)
            args.num_inference_steps = min(args.num_inference_steps or 2, 2)
        summary = await run_bench(args)
        await runner.cleanup()
        return summary

    return asyncio.run(main())


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base-url", default="http://127.0.0.1:8000")
    p.add_argument("--num-prompts", type=int, default=8)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num-inference-steps", type=int, default=20)
    p.add_argument("--concurrency", type=int, default=2)
    p.add_argument("--self-serve", action="store_true")
    p.add_argument("--flagship", action="store_true",
                   help="self-serve the QwenImage-scale DiT (on-chip)")
    p.add_argument("--port", type=int, default=18321)
    args = p.parse_args()
    if args.self_serve or args.flagship:
        summary = _self_serve(args, flagship=args.flagship)
    else:
        summary = asyncio.run(run_bench(args))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
