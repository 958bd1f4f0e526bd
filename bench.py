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
    # BENCH_PROMPT_TILE=t: tile a t-token random block to fill the
    # prompt — the prompt-lookup (ngram spec decode) regime, mirroring
    # summarization/copy workloads where the method pays off
    tile = int(os.environ.get("BENCH_PROMPT_TILE", 0))
    for i in range(batch):
        if tile > 0:
            base = [(7 * j + i) % 32000 for j in range(tile)]
            ids = (base * (prompt_len // tile + 1))[:prompt_len]
        else:
            ids = [(7 * j + i) % 32000 for j in range(prompt_len)]
        core.add_request(
            Request(
                request_id=f"{tag}-{i}",
                prompt_token_ids=ids,
                sampling_params=sp.clone(),
            )
        )
    tokens = 0
    events = []  # (t, cumulative tokens)
    while core.has_unfinished():
        for out in core.step():
            tokens += len(out.new_token_ids)
        events.append((time.perf_counter(), tokens))
    assert tokens == batch * decode_steps, (tokens, batch, decode_steps)

    # decode rate = cumulative-token slope between 25% and 95% of the
    # run: excludes the prefill phase (near-zero token emission) at ANY
    # prompt length, so long-prompt configs measure decode, not prefill
    def at(frac):
        target = frac * tokens
        for t, c in events:
            if c >= target:
                return t, c
        return events[-1]

    (t1, c1), (t2, c2) = at(0.25), at(0.95)
    assert c2 > c1, "degenerate token timeline"
    return (c2 - c1) / (t2 - t1)


def main():
    # throughput mode: fused multi-step windows amortize per-dispatch
    # overhead; a shallow async pipeline keeps windows in flight.
    # EXCEPT under spec decode: ngram proposals need the host to know
    # the full sequence each step (scheduler._ngram_propose bails when
    # pipelined tokens are in flight), so spec runs step-at-a-time
    if int(os.environ.get("BENCH_SPEC", 0)) > 0:
        os.environ.setdefault("OMNI_TPU_PIPELINE_DEPTH", "0")
        os.environ.setdefault("OMNI_TPU_MULTI_STEP", "1")
    os.environ.setdefault("OMNI_TPU_PIPELINE_DEPTH", "8")
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
        quantization=os.environ.get("BENCH_QUANT") or None,
        kv_cache_dtype=os.environ.get("BENCH_KV_DTYPE", "auto"),
        # ngram speculative decoding (BENCH_SPEC=k): the batch-1 lever
        num_speculative_tokens=int(os.environ.get("BENCH_SPEC", 0)),
        max_num_seqs=batch,
        max_num_batched_tokens=4096,
        block_size=int(os.environ.get("BENCH_BLOCK", 16)),
        num_kv_cache_blocks=(
            batch * (prompt_len + decode_steps + 64)
            // int(os.environ.get("BENCH_BLOCK", 16)) + 16),
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

    extra = {}
    if int(os.environ.get("BENCH_SPEC", 0)) > 0:
        sched = core.scheduler
        if sched.spec_proposed:
            extra["spec_accept_rate"] = round(
                sched.spec_accepted / sched.spec_proposed, 3)
            extra["spec_proposed"] = sched.spec_proposed
    # ---- tunnel RTT floor: host-side latency metrics (TTFT, VAE ms)
    # include one dispatch+fetch round trip over the device tunnel;
    # record it so day-to-day tunnel weather is attributable (measured
    # 5-30 ms across sessions on the same code)
    import jax as _jax
    import numpy as _np
    _tiny = _jax.jit(lambda x: x + 1)
    _x = _jax.numpy.ones((8,), _jax.numpy.float32)
    _np.asarray(_tiny(_x))
    _rtts = []
    for _ in range(10):
        _t0 = time.perf_counter()
        _np.asarray(_tiny(_x))
        _rtts.append((time.perf_counter() - _t0) * 1000)
    extra["tunnel_rtt_ms"] = round(statistics.median(_rtts), 2)

    # ---- prefill TTFT: fresh single request, time to first token
    if os.environ.get("BENCH_TTFT", "1") == "1":
        sp1 = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True,
                             detokenize=False)
        ttfts = []
        for r in range(reps + 1):  # first is the compile warm-up
            core.add_request(Request(
                request_id=f"ttft-{r}",
                prompt_token_ids=[(3 * j + r) % 32000 for j in range(512)],
                sampling_params=sp1.clone()))
            t0 = time.perf_counter()
            while core.has_unfinished():
                for out in core.step():
                    pass
            ttfts.append((time.perf_counter() - t0) * 1000)
        extra["prefill_ttft_ms_512"] = round(statistics.median(ttfts[1:]), 2)

    # ---- DiT denoise step + VAE decode (BASELINE.md metric configs)
    if os.environ.get("BENCH_DIFFUSION", "1") == "1":
        import jax
        import jax.numpy as jnp
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

        # 8L / 1536d (12 heads x 128) MMDiT at 512x512, fused batched CFG
        tf = QwenImageTransformerConfig(
            num_layers=8, attention_head_dim=128, num_attention_heads=12,
            joint_attention_dim=1536, in_channels=64, out_channels=16,
            axes_dims_rope=(16, 56, 56))
        vae = QwenImageVAEConfig(base_dim=96, z_dim=16,
                                 dim_mult=(1, 2, 4, 4), num_res_blocks=2,
                                 temperal_downsample=(False, True, True))
        od = OmniDiffusionConfig(model="bench", dtype="bfloat16")
        pipe = QwenImagePipeline(od, transformer_config=tf, vae_config=vae,
                                 load_weights=False)
        rng = np.random.default_rng(0)

        def run_dit(steps):
            req = OmniDiffusionRequest(
                request_id="b", prompt="bench",
                prompt_embeds=rng.normal(
                    size=(1, 64, 1536)).astype(np.float32),
                negative_prompt_embeds=rng.normal(
                    size=(1, 64, 1536)).astype(np.float32),
                height=512, width=512, num_inference_steps=steps, seed=0,
                true_cfg_scale=4.0, output_type="latent")
            t0 = time.perf_counter()
            lat, _ = pipe.forward(req)
            np.asarray(lat)  # force a real host sync (remote tunnels may
            # not block on block_until_ready)
            return time.perf_counter() - t0, lat

        run_dit(2)
        run_dit(2)  # compile + warm
        t2 = min(run_dit(2)[0] for _ in range(reps))
        t14, lat = 1e9, None
        for _ in range(reps):
            t, lt = run_dit(14)
            if t < t14:
                t14, lat = t, lt
        # differencing cancels fixed dispatch/fetch overhead
        extra["dit_step_ms_512"] = round((t14 - t2) / 12 * 1000, 2)
        m_steps = (t14 - t2) / 12
        # VAE decode timed separately on the final latents
        from vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
            unpack_latents,
        )

        z = unpack_latents(jnp.asarray(lat), 32, 32).astype(jnp.float32)

        def run_vae():
            t0 = time.perf_counter()
            np.asarray(pipe._decode(pipe.params["vae"], z))
            return time.perf_counter() - t0

        run_vae()  # compile
        vae_ms = min(run_vae() for _ in range(reps)) * 1000
        extra["vae_decode_ms_512"] = round(vae_ms, 2)
        # 20-step image: denoise + decode (fixed per-image overhead
        # excluded, consistent with the per-step differencing above)
        extra["image_per_sec_512_20step"] = round(
            1000.0 / (m_steps * 1000 * 20 + vae_ms), 3)

    # round-recorded on-chip results (headline concurrency run, speech
    # TTFT, flagship shapes — measured by their own harnesses, see
    # BASELINE.md): surfaced under "recorded" so the driver's BENCH
    # snapshot carries the full scoreboard, clearly labeled as recorded
    # rather than re-measured in this invocation
    rec_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "RESULTS_r5.json")
    if os.path.isfile(rec_path):
        with open(rec_path) as f:
            rec = json.load(f)
        rec.pop("_comment", None)
        extra["recorded"] = rec

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
        **extra,
    }))


if __name__ == "__main__":
    main()
