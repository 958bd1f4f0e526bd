"""Composed disaggregated multi-stage DAG on per-stage mesh slices.

BASELINE config 5 (the flagship): the full Qwen3-Omni 3-stage speech DAG
plus a Qwen-Image DiT stage, every stage pinned to its own device slice
of the 8-device mesh — thinker MoE tp=2 x ep=2 on devices 0-3, talker on
4, code2wav on 5, DiT with dp=2 on 6-7 — with connector hand-offs between
SHARDED stages. The waveform and image must match the identically-
configured single-placement run bitwise-ish (same compute graphs, only
placement differs), which is exactly where placement bugs live
(device-set mismatches at connector edges, resharding on hand-off).

Reference: per-stage device pinning in stage_configs/qwen3_omni_moe.yaml
(:7-100) + omni_stage.py:403-600.
"""

import numpy as np

from vllm_omni_tpu.config.engine import EngineArgs
from vllm_omni_tpu.config.stage import StageConfig, StageRuntimeConfig
from vllm_omni_tpu.stages.omni import Omni

from tests.stages.test_qwen3_omni_pipeline import (  # noqa: F401
    ASSISTANT,
    IM_START,
    OMNI_CFG,
    SYSTEM,
    USER,
)


def _text2image(stage, upstream_outputs, original_prompt):
    """0 -> 3 edge: thinker text tokens seed a deterministic DiT request
    (stands in for a text encoder; the edge mechanics are the point)."""
    out = upstream_outputs[0]
    tokens = list(out.outputs[0].token_ids)
    rng = np.random.default_rng(sum(tokens) % 65536)
    return {
        "prompt": "",
        "prompt_embeds": rng.normal(size=(1, 5, 48)).astype(np.float32),
        "negative_prompt_embeds": rng.normal(
            size=(1, 5, 48)).astype(np.float32),
        "height": 32, "width": 32, "num_inference_steps": 2, "seed": 3,
        "true_cfg_scale": 2.0, "output_type": "np",
    }


def _stage_cfgs(disagg: bool):
    from vllm_omni_tpu.config.diffusion import DiffusionParallelConfig
    from vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
        QwenImageTransformerConfig,
    )
    from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
        QwenImageVAEConfig,
    )

    def rt(devices: str) -> StageRuntimeConfig:
        return StageRuntimeConfig(
            devices=devices if disagg else "",
            max_batch_size=1, batch_timeout=0.0)

    tf = QwenImageTransformerConfig(
        num_layers=2, attention_head_dim=32, num_attention_heads=2,
        joint_attention_dim=48, in_channels=16, out_channels=4,
        axes_dims_rope=(8, 12, 12))
    vae = QwenImageVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2),
                             num_res_blocks=1)
    return [
        StageConfig(
            stage_id=0, stage_type="llm",
            runtime=rt("0,1,2,3"),
            engine_args=EngineArgs(
                model="tiny-thinker", hf_config=OMNI_CFG,
                model_arch="Qwen3OmniMoeForConditionalGeneration",
                model_stage="thinker", hf_config_name="thinker_config",
                engine_output_type="latent", load_format="random",
                dtype="float32", max_num_seqs=2,
                max_num_batched_tokens=128, block_size=8,
                num_kv_cache_blocks=64,
                tensor_parallel_size=2, expert_parallel_size=2),
            final_output=True, final_output_type="text",
            default_sampling_params={"temperature": 0.0, "max_tokens": 4},
        ),
        StageConfig(
            stage_id=1, stage_type="talker",
            runtime=rt("4"),
            engine_args=EngineArgs(
                model="tiny-talker", hf_config=OMNI_CFG,
                engine_output_type="latent", load_format="random",
                dtype="float32"),
            engine_input_source=[0],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors."
                "qwen3_omni.thinker2talker"),
            diffusion_args={"max_len": 128, "predictor_greedy": True,
                            "suppress_special": False},
            default_sampling_params={"temperature": 0.0, "max_tokens": 3,
                                     "repetition_penalty": 1.05},
        ),
        StageConfig(
            stage_id=2, stage_type="code2wav",
            runtime=rt("5"),
            engine_args=EngineArgs(
                model="tiny-c2w", hf_config=OMNI_CFG,
                hf_config_name="code2wav_config",
                engine_output_type="audio", load_format="random",
                dtype="float32"),
            engine_input_source=[1],
            custom_process_input_func=(
                "vllm_omni_tpu.stages.input_processors."
                "qwen3_omni.talker2code2wav"),
            final_output=True, final_output_type="audio",
        ),
        StageConfig(
            stage_id=3, stage_type="diffusion",
            runtime=rt("6,7"),
            engine_args=EngineArgs(
                model="tiny-dit", dtype="float32"),
            diffusion_args={
                "pipeline_class": "QwenImagePipeline",
                "parallel_config": DiffusionParallelConfig(
                    data_parallel_size=2),
                "pipeline_kwargs": {
                    "transformer_config": tf, "vae_config": vae,
                    "load_weights": False},
            },
            engine_input_source=[0],
            custom_process_input_func=_text2image,
            final_output=True, final_output_type="image",
        ),
    ]


def _run(disagg: bool):
    prompt_ids = (
        [IM_START, SYSTEM, 5, 6]
        + [IM_START, USER, 10, 11, 12]
        + [IM_START, ASSISTANT, 20]
    )
    with Omni(stage_configs=_stage_cfgs(disagg)) as omni:
        outs = omni.generate({"prompt_token_ids": prompt_ids})
    assert outs and not any(o.error for o in outs), [o.error for o in outs]
    by_stage = {o.stage_id: o for o in outs}
    assert set(by_stage) == {0, 2, 3}
    text = list(by_stage[0].request_output.outputs[0].token_ids)
    wav = np.asarray(by_stage[2].request_output.outputs[0]
                     .multimodal_output["waveform"]).reshape(-1)
    img = np.stack([np.asarray(im) for im in by_stage[3].images])
    return text, wav, img


def test_disaggregated_dag_matches_single_placement():
    import jax

    assert len(jax.devices()) >= 8
    text_ref, wav_ref, img_ref = _run(disagg=False)
    text_got, wav_got, img_got = _run(disagg=True)

    assert text_got == text_ref
    assert wav_got.size > 0 and np.isfinite(wav_got).all()
    np.testing.assert_allclose(wav_got, wav_ref, atol=1e-5)
    # uint8 image: identical placement-independent compute
    assert (img_got != img_ref).mean() < 0.02


def test_disaggregated_stage_engines_live_on_their_slices():
    """Placement introspection: each pinned stage's engine state is
    resident on (only) its assigned devices."""
    import jax

    assert len(jax.devices()) >= 8
    prompt_ids = [IM_START, SYSTEM, 5, IM_START, USER, 10,
                  IM_START, ASSISTANT, 20]
    with Omni(stage_configs=_stage_cfgs(True)) as omni:
        outs = omni.generate({"prompt_token_ids": prompt_ids})
        assert not any(o.error for o in outs), [o.error for o in outs]
        devs = jax.devices()
        # thinker params live on the tp x ep mesh over devices 0-3
        thinker = omni.stages[0].engine
        leaf = jax.tree_util.tree_leaves(thinker.core.runner.params)[0]
        assert set(leaf.sharding.device_set) <= set(devs[:4])
        # talker on device 4, code2wav on 5
        talker_leaf = jax.tree_util.tree_leaves(
            omni.stages[1].engine.params)[0]
        assert set(talker_leaf.sharding.device_set) == {devs[4]}
        c2w_leaf = jax.tree_util.tree_leaves(
            omni.stages[2].engine.params)[0]
        assert set(c2w_leaf.sharding.device_set) == {devs[5]}
        # DiT dp=2 mesh over devices 6-7
        pipe = omni.stages[3].engine.pipeline
        placer = pipe._dp_place.__self__
        assert set(placer.mesh.devices.flatten()) == set(devs[6:8])
