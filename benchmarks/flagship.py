"""Flagship-shape on-chip benchmarks (VERDICT r2 Next #3).

The default bench.py measures a 0.9B dense toy; these measure the
flagship SHAPES the framework actually serves, with random weights
(throughput is weight-content independent):

  moe       Qwen3-MoE-shaped AR decode (experts resident on 1 chip,
            routed top-k) — the Qwen3-Omni thinker is MoE, and MoE
            decode tok/s had never been benched on-chip.
  dit       QwenImage-scale MMDiT (3072d / 24 heads at the deepest
            depth that fits one chip) denoise step + img/s at 4 steps.
  pipeline  Qwen3-Omni speech DAG at a 3B-thinker-ish scale: per-stage
            tps + streaming speech TTFT.

Usage: python benchmarks/flagship.py {moe|dit|pipeline}
Each prints one JSON line; record results in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_moe() -> dict:
    os.environ.setdefault("OMNI_TPU_PIPELINE_DEPTH", "8")
    os.environ.setdefault("OMNI_TPU_MULTI_STEP", "16")
    from vllm_omni_tpu.config.engine import EngineArgs
    from vllm_omni_tpu.core.request import Request
    from vllm_omni_tpu.engine.core import EngineCore
    from vllm_omni_tpu.sampling_params import SamplingParams

    # Qwen3-MoE shape scaled to chip HBM: 16 layers x 32 experts
    # (top-4) x 768 moe-dim over 2048 hidden = ~5.1B resident params
    # (~10 GB bf16), ~0.9B active per token — the A3B routing regime.
    cfg = {
        "architectures": ["Qwen3MoeForCausalLM"],
        "hidden_size": 2048,
        "num_hidden_layers": 16,
        "num_attention_heads": 16,
        "num_key_value_heads": 8,
        "head_dim": 128,
        "vocab_size": 32768,
        "max_position_embeddings": 4096,
        "intermediate_size": 5632,
        "moe_intermediate_size": 768,
        "num_experts": 32,
        "num_experts_per_tok": 4,
        "eos_token_id": 2,
    }
    batch = int(os.environ.get("BENCH_BATCH", 16))
    prompt_len = int(os.environ.get("BENCH_PROMPT", 256))
    decode = int(os.environ.get("BENCH_DECODE", 512))
    core = EngineCore(EngineArgs(
        model="bench-moe", hf_config=cfg, dtype="bfloat16",
        max_num_seqs=batch, max_num_batched_tokens=4096, block_size=16,
        num_kv_cache_blocks=batch * (prompt_len + decode + 64) // 16 + 16,
    ).create_engine_config(), load_weights=False)

    def run(tag):
        sp = SamplingParams(temperature=0.0, max_tokens=decode,
                            ignore_eos=True, detokenize=False)
        for i in range(batch):
            core.add_request(Request(
                request_id=f"{tag}-{i}",
                prompt_token_ids=[(7 * j + i) % 32000
                                  for j in range(prompt_len)],
                sampling_params=sp.clone()))
        tokens, events = 0, []
        while core.has_unfinished():
            for out in core.step():
                tokens += len(out.new_token_ids)
            events.append((time.perf_counter(), tokens))

        def at(frac):
            for t, c in events:
                if c >= frac * tokens:
                    return t, c
            return events[-1]

        (t1, c1), (t2, c2) = at(0.25), at(0.95)
        return (c2 - c1) / (t2 - t1)

    run("warm")
    vals = [run(f"r{r}") for r in range(3)]
    return {"metric": "moe_decode_tokens_per_sec_per_chip",
            "value": round(statistics.median(vals), 1),
            "shape": "16L x 32E top-4, 2048h, ~5.1B resident",
            "reps": [round(v, 1) for v in vals]}


def bench_dit() -> dict:
    import numpy as np

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
    from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

    px = int(os.environ.get("BENCH_DIT_PX", 512))
    # QwenImage-class hidden size (3072 = 24 x 128 heads). 40L/3072d
    # (the REAL QwenImage depth, ~8.5B) is ~27 GB bf16 — beyond the
    # 16 GB HBM of v5e-1 — but ~13.5 GB at W8A16 int8
    # (BENCH_DIT_QUANT=int8), which is how the real depth is benched on
    # one chip (VERDICT r3 Weak #4). bf16 runs use the deepest depth
    # that fits (16L, ~5.5B).
    quant = os.environ.get("BENCH_DIT_QUANT") or None
    layers = int(os.environ.get("BENCH_DIT_LAYERS",
                                40 if quant == "int8" else 16))
    tf = QwenImageTransformerConfig(
        num_layers=layers, attention_head_dim=128, num_attention_heads=24,
        joint_attention_dim=3072, in_channels=64, out_channels=16,
        axes_dims_rope=(16, 56, 56))
    vae = QwenImageVAEConfig(base_dim=96, z_dim=16, dim_mult=(1, 2, 4, 4),
                             num_res_blocks=2,
                             temperal_downsample=(False, True, True))
    vae_dtype = os.environ.get("BENCH_VAE_DTYPE", "float32")
    t_init = time.perf_counter()
    pipe = QwenImagePipeline(
        OmniDiffusionConfig(model="bench", dtype="bfloat16",
                            vae_dtype=vae_dtype, quantization=quant),
        transformer_config=tf, vae_config=vae, load_weights=False)
    print(f"[dit] pipeline init {time.perf_counter() - t_init:.1f}s "
          f"({layers}L quant={quant})", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)

    def run(steps):
        req = OmniDiffusionRequest(
            request_id="b", prompt="bench",
            prompt_embeds=rng.normal(size=(1, 64, 3072)).astype(np.float32),
            negative_prompt_embeds=rng.normal(
                size=(1, 64, 3072)).astype(np.float32),
            height=px, width=px, num_inference_steps=steps, seed=0,
            true_cfg_scale=4.0, output_type="latent")
        t0 = time.perf_counter()
        lat, _ = pipe.forward(req)
        np.asarray(lat)
        return time.perf_counter() - t0, lat

    t_c = time.perf_counter()
    run(2)
    print(f"[dit] first run(2) (compile) {time.perf_counter() - t_c:.1f}s",
          file=sys.stderr, flush=True)
    run(2)
    t2 = min(run(2)[0] for _ in range(2))
    print(f"[dit] warm run(2) {t2:.2f}s", file=sys.stderr, flush=True)
    t6, lat = 1e9, None
    for _ in range(2):
        t, lt = run(6)
        if t < t6:
            t6, lat = t, lt
    step_ms = (t6 - t2) / 4 * 1000

    from vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
        unpack_latents,
    )
    import jax.numpy as jnp

    z = unpack_latents(jnp.asarray(lat), px // 16, px // 16).astype(
        pipe.vae.dtype)

    def run_vae():
        t0 = time.perf_counter()
        np.asarray(pipe._decode(pipe.params["vae"], z))
        return time.perf_counter() - t0

    run_vae()
    vae_ms = min(run_vae() for _ in range(2)) * 1000
    return {"metric": f"dit_step_ms_{px}", "value": round(step_ms, 1),
            "shape": f"{layers}L/3072d/24h MMDiT, fused batched CFG",
            "vae_decode_ms": round(vae_ms, 1),
            "img_per_sec_4step": round(
                1000.0 / (step_ms * 4 + vae_ms), 3),
            "img_per_sec_20step": round(
                1000.0 / (step_ms * 20 + vae_ms), 3)}


def bench_pipeline() -> dict:
    """Speech DAG at ~3B-thinker scale: per-stage tps + speech TTFT."""
    from bench_shapes import qwen3_omni_stage_configs, speech_prompt

    max_text = int(os.environ.get("BENCH_PIPE_TOKENS", 64))
    cfgs = qwen3_omni_stage_configs(max_text=max_text)
    prompt = speech_prompt(0)

    import asyncio

    from vllm_omni_tpu.stages.async_omni import AsyncOmni

    omni = AsyncOmni(stage_configs=cfgs, log_stats=True)
    # low-latency streaming config: emit audio every 16 codec frames
    # (default 300 covers a 64-frame utterance in one chunk, so no
    # partial — and no TTFT datapoint — would ever be produced)
    omni.stages[2].engine.chunk_size = 16
    omni.stages[2].engine.left_context = 8

    async def one(stream):
        t0 = time.perf_counter()
        ttft = None
        n_final = 0
        async for out in omni.generate({"prompt_token_ids": prompt},
                                       stream=stream):
            if (stream and ttft is None and out.partial
                    and out.stage_id == 2):
                ttft = time.perf_counter() - t0
            if not out.partial:
                n_final += 1
        return ttft, time.perf_counter() - t0, n_final

    # incremental cross-stage hand-off (stages/streaming.py): toggled by
    # setting the stream processors on the live stage configs — procs are
    # resolved per request in _make_stream_procs
    STREAM_PROCS = {
        1: ("vllm_omni_tpu.stages.input_processors.qwen3_omni_streaming."
            "Thinker2TalkerStreaming"),
        2: ("vllm_omni_tpu.stages.input_processors.qwen3_omni_streaming."
            "Talker2Code2WavStreaming"),
    }

    def set_incremental(on: bool):
        for sid, path in STREAM_PROCS.items():
            omni.stage_configs[sid].stream_input_processor = (
                path if on else None)

    try:
        asyncio.run(one(False))  # compile everything
        asyncio.run(one(True))   # compile the streaming variants too
        set_incremental(True)
        asyncio.run(one(True))
        # reset per-stage stats: the warm-up runs are compile-dominated
        # and would swamp tps_avg
        for s in omni.metrics.stage_stats.values():
            s.num_requests = 0
            s.total_gen_time_s = 0.0
            s.total_output_tokens = 0
            s.total_rx_bytes = 0
            s.latencies_s.clear()
        set_incremental(False)
        ttfts_completion = []
        for _ in range(3):
            ttft, _, nf = asyncio.run(one(True))
            assert nf >= 2, nf
            if ttft is not None:
                ttfts_completion.append(ttft)
        set_incremental(True)
        ttfts, e2es = [], []
        for _ in range(3):
            ttft, e2e, nf = asyncio.run(one(True))
            assert nf >= 2, nf
            if ttft is not None:
                ttfts.append(ttft)
            e2es.append(e2e)
        # named TTFT breakdown (VERDICT r4 Next #2): instrumented stream
        # processors timestamp each edge's first event on a fresh run
        breakdown = None
        if os.environ.get("BENCH_PIPE_BREAKDOWN", "1") == "1":
            import bench_shapes as bs

            for sid, path in {1: "bench_shapes.T2TInstrumented",
                              2: "bench_shapes.T2CInstrumented"}.items():
                omni.stage_configs[sid].stream_input_processor = path
            bs.BREAKDOWN_EVENTS.clear()
            t0 = time.perf_counter()
            ttft_b, _, _ = asyncio.run(one(True))
            breakdown = {k: round(v - t0, 3)
                         for k, v in bs.BREAKDOWN_EVENTS.items()}
            if ttft_b is not None:
                breakdown["first_audio_partial"] = round(ttft_b, 3)
        stats = omni.metrics.summary()
        per_stage = {f"stage{sid}_tps_avg": round(ss.tps_avg, 1)
                     for sid, ss in omni.metrics.stage_stats.items()}
    finally:
        omni.shutdown()
    return {"metric": "speech_pipeline_3B_shaped",
            "ttft_breakdown_s": breakdown,
            "speech_ttft_s": round(min(ttfts), 3) if ttfts else None,
            "speech_ttft_completion_handoff_s": (
                round(min(ttfts_completion), 3) if ttfts_completion
                else None),
            "e2e_s": round(statistics.median(e2es), 3),
            "text_tokens": max_text, **per_stage}


def bench_talker() -> dict:
    """Lockstep-batched talker decode at the flagship MoE shape
    (VERDICT r4 Next #5): 20L / 1024h / 32 experts top-4 / 16 RVQ
    codebooks — the prior 2290 frames/s figure came from the 12L
    8-expert toy in bench_shapes.py and traced DENSE MoE under vmap.
    This measures the ragged (custom_vmap grouped-dispatch) path at
    serving scale. frames/s = batch * frames / wall; every frame also
    runs the NQ-1-step MTP code-predictor rollout."""
    import numpy as np
    import jax.numpy as jnp

    from vllm_omni_tpu.models.qwen3_omni.talker_engine import TalkerEngine
    from vllm_omni_tpu.sampling_params import SamplingParams

    H, NQ = 1024, 16
    cfg = {
        "talker_config": {
            "num_code_groups": NQ, "thinker_hidden_size": 2048,
            "accept_hidden_layer": 18, "codec_eos_token_id": 2150,
            "codec_pad_id": 2148, "codec_bos_id": 2149,
            "codec_nothink_id": 2146, "codec_think_bos_id": 2147,
            "codec_think_eos_id": 2151, "spatial_merge_size": 2,
            "text_config": {
                "hidden_size": H, "num_hidden_layers": 20,
                "num_attention_heads": 16, "num_key_value_heads": 8,
                "head_dim": 128, "intermediate_size": 4096,
                "moe_intermediate_size": 768,
                "shared_expert_intermediate_size": 2048,
                "num_experts": 32, "num_experts_per_tok": 4,
                "norm_topk_prob": False, "vocab_size": 4096,
                "rope_scaling": {"mrope_section": [8, 12, 12]},
                "max_position_embeddings": 8192,
            },
            "code_predictor_config": {
                "hidden_size": H, "num_hidden_layers": 4,
                "num_attention_heads": 16, "num_key_value_heads": 8,
                "head_dim": 64, "intermediate_size": 2048,
                "num_code_groups": NQ, "vocab_size": 2048,
            },
        },
    }
    batch = int(os.environ.get("BENCH_TALKER_BATCH", 32))
    prompt_len = int(os.environ.get("BENCH_TALKER_PROMPT", 64))
    frames = int(os.environ.get("BENCH_TALKER_FRAMES", 128))
    impl = os.environ.get("BENCH_TALKER_MOE", "auto")  # auto|dense
    # max_len sizes the dense talker KV cache [L, B, Tmax, Hkv, D]; the
    # layer scan stacks an updated copy, so peak HBM ~= 2x cache. At
    # 20L/B32/8kvh/128d, Tmax=2048 is 2x2.51G per K/V side — OOM on
    # v5e-1 alongside the 32-expert weights. 512 covers prompt(~71) +
    # trails + 128 frames with 2x headroom.
    max_len = int(os.environ.get("BENCH_TALKER_MAXLEN", 512))
    eng = TalkerEngine(cfg, load_weights=False, dtype=jnp.bfloat16,
                       max_len=max_len, predictor_greedy=True)
    eng.model.moe_impl = impl
    rng = np.random.default_rng(0)

    def prompts():
        ps = []
        for i in range(batch):
            T = prompt_len + (i % 7)  # ragged
            ps.append({
                "request_id": f"t{i}",
                "inputs_embeds": rng.normal(size=(T, H)).astype(
                    np.float32) * 0.3,
                "mrope_positions": np.broadcast_to(
                    np.arange(T, dtype=np.float32), (3, T)).copy(),
                "mrope_delta": 0,
                "trailing_text_hidden": rng.normal(
                    size=(8, H)).astype(np.float32) * 0.3,
                "tts_pad_embed": rng.normal(size=(H,)).astype(
                    np.float32) * 0.3,
            })
        return ps

    sps = [SamplingParams(temperature=0.0, repetition_penalty=1.05,
                          max_tokens=frames, ignore_eos=True)
           for _ in range(batch)]
    eng.generate(prompts(), list(sps))  # compile
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = eng.generate(prompts(), list(sps))
        walls.append(time.perf_counter() - t0)
    nf = sum(len(o.outputs[0].token_ids) for o in outs)
    wall = statistics.median(walls)
    return {"metric": "talker_flagship_batched",
            "frames_per_s": round(nf / wall, 1),
            "batch": batch, "frames_total": nf,
            "wall_s": round(wall, 2), "moe_impl": impl,
            "shape": "20L/1024h/E32K4/NQ16"}


def bench_video() -> dict:
    """Wan2.2-TI2V-5B-shaped T2V denoise step at 720p + temporal VAE
    decode (VERDICT r2 Next #9: the flash kernel microbenches existed,
    but no video-resolution denoise step had ever been timed)."""
    import numpy as np

    from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
    from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
        QwenImageVAEConfig,
    )
    from vllm_omni_tpu.diffusion.models.wan2_2.pipeline import WanPipeline
    from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
        WanTransformerConfig,
    )
    from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

    h = int(os.environ.get("BENCH_VIDEO_H", 704))
    w = int(os.environ.get("BENCH_VIDEO_W", 1280))
    frames = int(os.environ.get("BENCH_VIDEO_FRAMES", 21))
    # TI2V-5B shape: 3072 dim (24 x 128), 30 layers, ffn 14336 (~5B)
    tf = WanTransformerConfig(
        num_attention_heads=24, attention_head_dim=128, num_layers=30,
        ffn_dim=14336, text_dim=4096)
    vae = QwenImageVAEConfig(base_dim=96, z_dim=16, dim_mult=(1, 2, 4, 4),
                             num_res_blocks=2,
                             temperal_downsample=(False, True, True))
    # phase offload (reference enable_model_cpu_offload semantics): the
    # 10 GB DiT and the 720p streamed-VAE carry state cannot coexist in
    # 16 GB HBM — DiT is device-resident for the denoise loop only
    pipe = WanPipeline(
        OmniDiffusionConfig(model="bench", dtype="bfloat16",
                            dit_phase_offload=os.environ.get(
                                "BENCH_PHASE_OFFLOAD", "1") == "1",
                            vae_dtype=os.environ.get(
                                "BENCH_VAE_DTYPE", "float32")),
        transformer_config=tf, vae_config=vae, load_weights=False)
    rng = np.random.default_rng(0)

    # time each denoise step DIRECTLY by wrapping the jitted step with a
    # blocking fetch. Round-3 measured (t3 - t1) / 2 between 1-step and
    # 3-step runs instead — but with dit_phase_offload each run includes
    # a multi-GB host->device param put whose variance (minutes over the
    # remote dev tunnel) swamped the subtraction: it recorded
    # 27.1 s/step when the warm step is ~5.4 s (~65% MXU). Per-step
    # blocking costs one tunnel RTT per step — noise at these step sizes.
    import jax as _jax

    step_times = []
    real_step = pipe._denoise_step

    def timed_step(*a, **k):
        t0 = time.perf_counter()
        out = real_step(*a, **k)
        _jax.block_until_ready(out)
        np.asarray(_jax.device_get(
            _jax.tree_util.tree_leaves(out)[0][0, 0, 0, 0]))
        step_times.append(time.perf_counter() - t0)
        return out

    pipe._denoise_step = timed_step

    def run(steps):
        req = OmniDiffusionRequest(
            request_id="v", prompt="bench",
            prompt_embeds=rng.normal(size=(1, 64, 4096)).astype(np.float32),
            negative_prompt_embeds=rng.normal(
                size=(1, 64, 4096)).astype(np.float32),
            height=h, width=w, num_frames=frames,
            num_inference_steps=steps, seed=0, guidance_scale=5.0,
            output_type="latent")
        lat, _ = pipe.forward(req)
        np.asarray(lat)
        return lat

    steps_n = int(os.environ.get("BENCH_VIDEO_STEPS", 4))
    lat = run(steps_n)
    # first step carries compile + the phase-offload put drain; the
    # median of the remaining warm steps is the honest step time
    warm = sorted(step_times[1:])
    step_ms = warm[len(warm) // 2] * 1000
    lat = np.asarray(lat)

    import jax.numpy as jnp

    z = jnp.asarray(lat, pipe.vae.dtype)

    def run_vae():
        t0 = time.perf_counter()
        np.asarray(pipe._decode(pipe.params["vae"], z))
        return time.perf_counter() - t0

    run_vae()
    vae_ms = min(run_vae() for _ in range(2)) * 1000
    lat_tokens = (lat.shape[2] * (lat.shape[3] // 2)
                  * (lat.shape[4] // 2))
    # model FLOPs per step (CFG batch 2): 12 S*dim^2 attn linears +
    # 4 S*dim*ffn MLP + 4 S^2*D*H self-attention, per layer
    S, dim, ffn_d, heads, hd, L, Bc = (
        int(lat_tokens), tf.inner_dim, tf.ffn_dim,
        tf.num_attention_heads, tf.attention_head_dim, tf.num_layers, 2)
    flops = Bc * L * (12 * S * dim * dim + 4 * S * dim * ffn_d
                      + 4 * S * S * hd * heads)
    mxu_pct = 100 * flops / (step_ms / 1000) / 197e12
    return {"metric": f"wan_t2v_step_ms_{h}x{w}x{frames}f",
            "value": round(step_ms, 1),
            "shape": "30L/3072d/24h Wan DiT (~5B), CFG batched",
            "seq_tokens": int(lat_tokens),
            "mxu_pct": round(mxu_pct, 1),
            "warm_steps_s": [round(t, 2) for t in step_times[1:]],
            "temporal_vae_decode_ms": round(vae_ms, 1)}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "moe"
    out = {"moe": bench_moe, "dit": bench_dit,
           "pipeline": bench_pipeline, "video": bench_video,
           "talker": bench_talker}[which]()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
