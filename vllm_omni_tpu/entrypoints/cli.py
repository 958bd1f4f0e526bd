"""CLI: `python -m vllm_omni_tpu serve <model> [--omni] ...`.

Parity: the reference's `vllm serve --omni` flag surface (reference
entrypoints/cli/serve.py:73-188): --stage-configs-path, --port/--host,
diffusion knobs (--cache-backend, --vae-use-slicing/tiling,
--boundary-ratio, --flow-shift, --ulysses-degree), scheduling knobs.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vllm-omni-tpu")
    sub = p.add_subparsers(dest="command", required=True)
    s = sub.add_parser("serve", help="start the OpenAI-compatible server")
    s.add_argument("model", help="model path or name")
    s.add_argument("--omni", action="store_true",
                   help="multi-stage omni pipeline mode")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--stage-configs-path", default=None)
    s.add_argument("--served-model-name", default=None)
    s.add_argument("--dtype", default="bfloat16")
    s.add_argument("--max-num-seqs", type=int, default=64)
    s.add_argument("--max-num-batched-tokens", type=int, default=4096)
    s.add_argument("--tensor-parallel-size", type=int, default=1)
    s.add_argument("--log-stats", action="store_true")
    s.add_argument("--init-sleep-seconds", type=float, default=0.0)
    # worker/placement knobs (reference --worker-backend
    # {multi_process,ray}; here: in-process stage threads, or remote
    # stage-host processes declared via runtime.remote in stage configs)
    s.add_argument("--worker-backend", choices=("thread", "remote"),
                   default="thread")
    s.add_argument("--shm-threshold-bytes", type=int, default=None,
                   help="inline-vs-block threshold for shm connectors")
    # parallel sizes (AR stages; diffusion parallelism comes from the
    # diffusion knobs below / stage configs)
    s.add_argument("--data-parallel-size", type=int, default=1)
    s.add_argument("--expert-parallel-size", type=int, default=1)
    s.add_argument("--sequence-parallel-size", type=int, default=1)
    # diffusion knobs (reference cli/serve.py:73-188)
    s.add_argument("--cache-backend", default="")
    s.add_argument("--vae-use-slicing", action="store_true")
    s.add_argument("--vae-use-tiling", action="store_true")
    s.add_argument("--boundary-ratio", type=float, default=None)
    s.add_argument("--flow-shift", type=float, default=None)
    s.add_argument("--ulysses-degree", type=int, default=1)
    s.add_argument("--ring-degree", type=int, default=1)
    s.add_argument("--vae-parallel-size", type=int, default=0)
    s.add_argument("--pipeline-parallel-size", type=int, default=1,
                   help="DiT layer groups over a 'pipe' mesh axis "
                        "(GPipe microbatch schedule)")
    s.add_argument("--vae-dtype", default="float32",
                   help="VAE compute dtype; bfloat16 ~halves decode "
                        "time at ~1e-2 image error")
    s.add_argument("--num-inference-steps", type=int, default=50)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command != "serve":
        return 1
    if args.shm_threshold_bytes is not None:
        import os

        os.environ["OMNI_TPU_SHM_THRESHOLD"] = str(args.shm_threshold_bytes)

    from vllm_omni_tpu.entrypoints.openai.api_server import run_server
    from vllm_omni_tpu.models.registry import is_diffusion_model_dir

    model_name = args.served_model_name or args.model

    if is_diffusion_model_dir(args.model):
        # pure-diffusion serving (reference api_server.py:253-295)
        from vllm_omni_tpu.config.diffusion import (
            DiffusionCacheConfig,
            DiffusionParallelConfig,
            OmniDiffusionConfig,
        )
        from vllm_omni_tpu.diffusion.omni_diffusion import OmniDiffusion

        od = OmniDiffusionConfig(
            model=args.model,
            dtype=args.dtype,
            cache_config=DiffusionCacheConfig(cache_backend=args.cache_backend),
            parallel_config=DiffusionParallelConfig(
                ulysses_degree=args.ulysses_degree,
                ring_degree=args.ring_degree,
                pipeline_parallel_size=args.pipeline_parallel_size,
                vae_parallel_size=args.vae_parallel_size),
            vae_use_slicing=args.vae_use_slicing,
            vae_use_tiling=args.vae_use_tiling,
            vae_dtype=args.vae_dtype,
            boundary_ratio=args.boundary_ratio,
            flow_shift=args.flow_shift,
            default_num_inference_steps=args.num_inference_steps,
        )
        engine = OmniDiffusion(od_config=od)
        run_server(
            host=args.host, port=args.port,
            diffusion_engine=engine, model_name=model_name,
        )
        return 0

    from vllm_omni_tpu.engine.detokenizer import maybe_load_tokenizer
    from vllm_omni_tpu.stages.async_omni import AsyncOmni

    if args.worker_backend == "remote" and not args.stage_configs_path:
        raise SystemExit(
            "--worker-backend remote requires --stage-configs-path with "
            "runtime.remote entries (see docs/disaggregation.md)")
    overrides = {
        "dtype": args.dtype,
        "max_num_seqs": args.max_num_seqs,
        "max_num_batched_tokens": args.max_num_batched_tokens,
        "tensor_parallel_size": args.tensor_parallel_size,
        "data_parallel_size": args.data_parallel_size,
        "expert_parallel_size": args.expert_parallel_size,
        "sequence_parallel_size": args.sequence_parallel_size,
    }
    omni = AsyncOmni(
        model=args.model,
        stage_configs_path=args.stage_configs_path,
        log_stats=args.log_stats,
        engine_overrides=overrides,
    )
    tokenizer = maybe_load_tokenizer(args.model)
    run_server(
        host=args.host, port=args.port,
        engine_client=omni, model_name=model_name, tokenizer=tokenizer,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
