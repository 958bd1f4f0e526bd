import textwrap

import pytest

from vllm_omni_tpu.config import (
    CacheConfig,
    EngineArgs,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
    load_stage_configs_from_yaml,
)
from vllm_omni_tpu.config.stage import get_final_stage_id_for_e2e
from vllm_omni_tpu.sampling_params import SamplingParams

TINY_CFG = {
    "architectures": ["Qwen2ForCausalLM"],
    "hidden_size": 64,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 128,
    "max_position_embeddings": 256,
    "intermediate_size": 128,
}


def test_model_config_basic():
    mc = ModelConfig(model="tiny", hf_config=dict(TINY_CFG))
    assert mc.architecture == "Qwen2ForCausalLM"
    assert mc.hidden_size == 64
    assert mc.num_kv_heads == 2
    assert mc.head_dim == 16
    assert mc.max_model_len == 256


def test_model_config_stage_subconfig():
    cfg = {"architectures": ["X"], "thinker_config": dict(TINY_CFG)}
    mc = ModelConfig(
        model="tiny", hf_config=cfg, hf_config_name="thinker_config",
        model_arch="Qwen2ForCausalLM",
    )
    assert mc.architecture == "Qwen2ForCausalLM"
    assert mc.hidden_size == 64


def test_sampling_params_validation_and_overrides():
    sp = SamplingParams(temperature=0.0, max_tokens=4, stop="x")
    assert sp.greedy and sp.stop == ["x"]
    sp2 = sp.with_overrides({"temperature": 0.7, "custom_flag": 1})
    assert sp2.temperature == 0.7
    assert sp2.extra_args["custom_flag"] == 1
    assert sp.temperature == 0.0  # original untouched
    with pytest.raises(ValueError):
        SamplingParams(top_p=0.0)


def test_scheduler_bucket_padding():
    sc = SchedulerConfig(max_num_batched_tokens=1024)
    assert sc.pad_tokens(1) == 16
    assert sc.pad_tokens(17) == 32
    assert sc.pad_tokens(1000) == 1024
    assert sc.pad_tokens(5000) == 1024


def test_cache_config_tiling_constraint():
    with pytest.raises(ValueError):
        CacheConfig(block_size=12)
    cc = CacheConfig(block_size=16)
    assert cc.bytes_per_block(2, 64, 2) == 2 * 16 * 2 * 64 * 2 * 2


def test_parallel_config_world_size():
    pc = ParallelConfig(tensor_parallel_size=4, data_parallel_size=2)
    assert pc.world_size == 8


def test_parallel_config_mesh(cpu_devices):
    pc = ParallelConfig(tensor_parallel_size=4, data_parallel_size=2)
    mesh = pc.build_mesh()
    assert mesh.shape["model"] == 4
    assert mesh.shape["data"] == 2


def test_stage_yaml_roundtrip(tmp_path):
    yaml_text = textwrap.dedent(
        """
        stage_args:
          - stage_id: 0
            stage_type: llm
            runtime:
              devices: "0,1"
              max_batch_size: 1
            engine_args:
              model_stage: thinker
              model_arch: Qwen3OmniMoeForConditionalGeneration
              engine_output_type: latent
              max_num_batched_tokens: 512
              hf_config_name: thinker_config
              tensor_parallel_size: 2
            final_output: true
            final_output_type: text
            default_sampling_params:
              temperature: 0.4
              max_tokens: 32
          - stage_id: 1
            stage_type: llm
            engine_args:
              model_stage: talker
              engine_output_type: latent
            engine_input_source: [0]
            custom_process_input_func: vllm_omni_tpu.stages.input_processors.qwen3_omni.thinker2talker
          - stage_id: 2
            stage_type: llm
            engine_args:
              model_stage: code2wav
              engine_output_type: audio
            engine_input_source: [1]
            final_output: true
            final_output_type: audio
        """
    )
    p = tmp_path / "stages.yaml"
    p.write_text(yaml_text)
    stages = load_stage_configs_from_yaml(str(p), model="some/model")
    assert len(stages) == 3
    assert stages[0].engine_args.tensor_parallel_size == 2
    assert stages[0].runtime.device_indices() == [0, 1]
    assert stages[1].engine_input_source == [0]
    assert stages[2].final_output_type == "audio"
    assert stages[0].default_sampling_params["max_tokens"] == 32
    assert get_final_stage_id_for_e2e(stages, "text") == 0
    assert get_final_stage_id_for_e2e(stages, "audio") == 2


def test_stage_yaml_rejects_bad_dag(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text(
        "stage_args:\n"
        "  - stage_id: 0\n"
        "    engine_input_source: [0]\n"
        "    final_output: true\n"
    )
    with pytest.raises(ValueError):
        load_stage_configs_from_yaml(str(p))


def test_engine_args_create_config():
    args = EngineArgs(
        model="tiny",
        hf_config=dict(TINY_CFG),
        max_num_seqs=8,
        max_num_batched_tokens=256,
        tensor_parallel_size=1,
    )
    cfg = args.create_engine_config()
    assert cfg.scheduler_config.max_model_len == 256
    assert cfg.model_config.vocab_size == 128
