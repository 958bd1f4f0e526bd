"""Stage-level AR DP (engine replication) + diffusion DP/VAE-parallel.

Parity: AR DP = the reference's vLLM data parallelism (reference
worker/gpu_ar_worker.py:31-57 local-rank device math) mapped to engine
replicas on device slices with shared-queue work stealing; diffusion DP =
the `_DP` batch split (reference diffusion/distributed/
parallel_state.py:661-668) mapped to GSPMD batch sharding; VAE-parallel =
the `_VAE` tail group (parallel_state.py:499-508) mapped to a tail
device slice for decode.
"""

import queue

import numpy as np
import pytest

import jax

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.config.stage import StageConfig, StageRuntimeConfig
from vllm_omni_tpu.sampling_params import SamplingParams
from vllm_omni_tpu.stages.omni_stage import OmniStage, StageTask

TINY = {
    "architectures": ["Qwen2ForCausalLM"],
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "num_key_value_heads": 2,
    "vocab_size": 128,
    "max_position_embeddings": 128,
    "intermediate_size": 128,
    "eos_token_id": 127,
}


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_ar_stage_dp_replicas():
    out_q: "queue.Queue" = queue.Queue()
    cfg = StageConfig(
        stage_id=0,
        stage_type="llm",
        runtime=StageRuntimeConfig(max_batch_size=1, batch_timeout=0.0),
        engine_args=EngineArgs(
            model="tiny", hf_config=TINY, dtype="float32",
            max_num_seqs=2, max_num_batched_tokens=64, block_size=8,
            num_kv_cache_blocks=32, data_parallel_size=2,
            load_format="random",
        ),
    )
    stage = OmniStage(cfg, out_q)
    stage.init_stage_worker()
    stage.wait_ready(timeout=300)
    assert stage.n_replicas == 2
    assert len(stage.engines) == 2
    # replicas pin distinct device slices
    d0 = stage.engines[0].core.runner.params["norm"].devices()
    d1 = stage.engines[1].core.runner.params["norm"].devices()
    assert d0 != d1

    n = 6
    for i in range(n):
        stage.submit(StageTask(
            request_id=f"r{i}",
            prompt={"prompt_token_ids": [1 + i, 2, 3]},
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=4, ignore_eos=True,
                detokenize=False),
        ))
    got = {}
    for _ in range(n):
        out = out_q.get(timeout=120)
        assert out.error is None, out.error
        got[out.request_id] = out.output.outputs[0].token_ids
    assert len(got) == n
    for toks in got.values():
        assert len(toks) == 4
    # determinism across replicas: identical prompts agree regardless of
    # which replica served them
    stage.submit(StageTask(
        request_id="dup0", prompt={"prompt_token_ids": [1, 2, 3]},
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True, detokenize=False)))
    stage.submit(StageTask(
        request_id="dup1", prompt={"prompt_token_ids": [1, 2, 3]},
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True, detokenize=False)))
    a = out_q.get(timeout=120).output.outputs[0].token_ids
    b = out_q.get(timeout=120).output.outputs[0].token_ids
    assert a == b == got["r0"]
    stage.shutdown()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_diffusion_dp_and_vae_parallel_match_single():
    from vllm_omni_tpu.config.diffusion import (
        DiffusionParallelConfig,
        OmniDiffusionConfig,
    )
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine
    from vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
        QwenImagePipeline,
    )
    from vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
        QwenImageTransformerConfig,
    )
    from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
        QwenImageVAEConfig,
    )
    from vllm_omni_tpu.diffusion.parallel_placement import (
        DiffusionPlacer,
        VaeDecoder,
    )
    from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

    tf = QwenImageTransformerConfig(
        num_layers=2, attention_head_dim=32, num_attention_heads=2,
        joint_attention_dim=48, in_channels=16, out_channels=4,
        axes_dims_rope=(8, 12, 12))
    vae = QwenImageVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2),
                             num_res_blocks=1)

    def make_engine(dp, vae_par):
        od = OmniDiffusionConfig(
            model="tiny", dtype="float32",
            parallel_config=DiffusionParallelConfig(
                data_parallel_size=dp, vae_parallel_size=vae_par))
        pipe = QwenImagePipeline(od, transformer_config=tf, vae_config=vae,
                                 load_weights=False)
        return DiffusionEngine(od, pipeline=pipe, load_weights=False)

    def run(engine):
        rng = np.random.default_rng(0)
        req = OmniDiffusionRequest(
            request_id="d", prompt="x",
            prompt_embeds=rng.normal(size=(2, 5, 48)).astype(np.float32),
            negative_prompt_embeds=rng.normal(size=(2, 5, 48)
                                              ).astype(np.float32),
            height=32, width=32, num_inference_steps=2, seed=1,
            true_cfg_scale=2.0, output_type="np")
        out = engine.step([req])[0]
        assert out.error is None, out.error
        return np.stack([np.asarray(im) for im in out.images])

    ref = run(make_engine(dp=1, vae_par=0))
    par_engine = make_engine(dp=2, vae_par=1)
    assert isinstance(getattr(par_engine.pipeline._dp_place, "__self__",
                              None), DiffusionPlacer)
    assert isinstance(par_engine.pipeline._decode, VaeDecoder)
    got = run(par_engine)
    np.testing.assert_allclose(got.astype(np.float32),
                               ref.astype(np.float32), atol=1)
    # uint8 images: allow 1-count rounding wobble from resharded reductions
    assert (got != ref).mean() < 0.02

    # DP x SP composed on one mesh (review finding: independent meshes
    # crashed jit with mixed device sets); vae_parallel_size=2 exercises
    # the sharded-VAE path with replicated params on the same mesh
    def make_engine_sp(dp, sp, vae_par):
        od = OmniDiffusionConfig(
            model="tiny", dtype="float32",
            parallel_config=DiffusionParallelConfig(
                data_parallel_size=dp, ulysses_degree=sp,
                vae_parallel_size=vae_par))
        pipe = QwenImagePipeline(od, transformer_config=tf, vae_config=vae,
                                 load_weights=False)
        return DiffusionEngine(od, pipeline=pipe, load_weights=False)

    got2 = run(make_engine_sp(dp=2, sp=2, vae_par=2))
    np.testing.assert_allclose(got2.astype(np.float32),
                               ref.astype(np.float32), atol=1)
    assert (got2 != ref).mean() < 0.02


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_diffusion_step_overlaps_vae_with_next_denoise():
    """engine.step launches every request's denoise+decode before
    materializing any output — with a VAE device slice, request N's
    decode overlaps request N+1's denoise. Outputs must be identical to
    one-request-per-step serial processing."""
    from vllm_omni_tpu.config.diffusion import (
        DiffusionParallelConfig,
        OmniDiffusionConfig,
    )
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine
    from vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
        QwenImagePipeline,
    )
    from vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
        QwenImageTransformerConfig,
    )
    from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
        QwenImageVAEConfig,
    )
    from vllm_omni_tpu.diffusion.parallel_placement import VaeDecoder
    from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest

    tf = QwenImageTransformerConfig(
        num_layers=2, attention_head_dim=32, num_attention_heads=2,
        joint_attention_dim=48, in_channels=16, out_channels=4,
        axes_dims_rope=(8, 12, 12))
    vae_cfg = QwenImageVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2),
                                 num_res_blocks=1)
    od = OmniDiffusionConfig(
        model="tiny", dtype="float32",
        parallel_config=DiffusionParallelConfig(vae_parallel_size=1))
    pipe = QwenImagePipeline(od, transformer_config=tf, vae_config=vae_cfg,
                             load_weights=False)
    engine = DiffusionEngine(od, pipeline=pipe, load_weights=False)
    assert isinstance(engine.pipeline._decode, VaeDecoder)

    rng = np.random.default_rng(0)

    def make_req(i):
        return OmniDiffusionRequest(
            request_id=f"d{i}", prompt="x",
            prompt_embeds=rng.normal(size=(1, 5, 48)).astype(np.float32),
            negative_prompt_embeds=rng.normal(size=(1, 5, 48)
                                              ).astype(np.float32),
            height=32, width=32, num_inference_steps=2, seed=10 + i,
            true_cfg_scale=2.0, output_type="np")

    reqs_a = [make_req(0), make_req(1), make_req(2)]
    rng = np.random.default_rng(0)
    reqs_b = [make_req(0), make_req(1), make_req(2)]

    batched = engine.step(reqs_a)  # one step: launch all, then gather
    serial = [engine.step([r])[0] for r in reqs_b]
    assert not any(o.error for o in batched), [o.error for o in batched]
    for got, ref in zip(batched, serial):
        np.testing.assert_array_equal(
            np.asarray(got.images[0]), np.asarray(ref.images[0]))
