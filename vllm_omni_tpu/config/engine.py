"""Engine args/config bundle.

Parity: OmniEngineArgs / AsyncOmniEngineArgs (reference
engine/arg_utils.py:26-177): EngineArgs + stage_id / model_stage /
model_arch / engine_output_type / hf_config_name.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_omni_tpu.config.cache import CacheConfig
from vllm_omni_tpu.config.model import ModelConfig
from vllm_omni_tpu.config.parallel import ParallelConfig
from vllm_omni_tpu.config.scheduler import SchedulerConfig


@dataclass
class EngineArgs:
    model: str = ""
    hf_config: Optional[dict[str, Any]] = None
    stage_id: int = 0
    model_stage: Optional[str] = None
    model_arch: Optional[str] = None
    engine_output_type: str = "text"
    hf_config_name: str = ""
    dtype: Any = "bfloat16"
    quantization: Optional[str] = None  # weight-only: "int8"
    seed: int = 0
    max_model_len: Optional[int] = None
    # cache
    block_size: int = 16
    num_kv_cache_blocks: Optional[int] = None
    # "auto" = model dtype; "fp8" halves KV traffic/footprint (e4m3)
    kv_cache_dtype: str = "auto"
    hbm_memory_utilization: float = 0.9
    enable_prefix_caching: bool = False
    # scheduler
    max_num_seqs: int = 64
    max_num_batched_tokens: int = 4096
    one_shot_scheduler: bool = False
    # fused decode sub-steps per dispatch (None -> $OMNI_TPU_MULTI_STEP or 1)
    multi_step_decode: Optional[int] = None
    # n-gram speculative decoding (vLLM ngram/prompt-lookup method)
    num_speculative_tokens: int = 0
    ngram_prompt_lookup_max: int = 3
    ngram_prompt_lookup_min: int = 1
    # parallel
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    expert_parallel_size: int = 1
    sequence_parallel_size: int = 1
    # "auto" loads from `model`; "random" initializes randomly (tests/bench)
    load_format: str = "auto"
    # misc / omni plumbing
    worker_cls: Optional[str] = None  # accepted for YAML parity, unused
    scheduler_cls: Optional[str] = None
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "EngineArgs":
        import dataclasses

        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        extra = {k: v for k, v in d.items() if k not in known}
        args = cls(**kwargs)
        args.extra.update(extra)
        return args

    def create_engine_config(self) -> "EngineConfig":
        model_config = ModelConfig(
            model=self.model,
            hf_config=self.hf_config,
            model_arch=self.model_arch,
            model_stage=self.model_stage,
            hf_config_name=self.hf_config_name,
            dtype=self.dtype,
            quantization=self.quantization,
            seed=self.seed,
            max_model_len=self.max_model_len,
            engine_output_type=self.engine_output_type,
        )
        cache_config = CacheConfig(
            block_size=self.block_size,
            num_blocks=self.num_kv_cache_blocks,
            hbm_memory_utilization=self.hbm_memory_utilization,
            cache_dtype=(self.dtype if self.kv_cache_dtype == "auto"
                         else self.kv_cache_dtype),
            enable_prefix_caching=self.enable_prefix_caching,
        )
        import os as _os

        scheduler_config = SchedulerConfig(
            max_num_seqs=self.max_num_seqs,
            max_num_batched_tokens=self.max_num_batched_tokens,
            max_model_len=model_config.max_model_len,
            one_shot=self.one_shot_scheduler,
            multi_step_decode=self.multi_step_decode
            if self.multi_step_decode is not None
            else int(_os.environ.get("OMNI_TPU_MULTI_STEP", 1)),
            num_speculative_tokens=self.num_speculative_tokens,
            ngram_prompt_lookup_max=self.ngram_prompt_lookup_max,
            ngram_prompt_lookup_min=self.ngram_prompt_lookup_min,
        )
        parallel_config = ParallelConfig(
            data_parallel_size=self.data_parallel_size,
            sequence_parallel_size=self.sequence_parallel_size,
            tensor_parallel_size=self.tensor_parallel_size,
            expert_parallel_size=self.expert_parallel_size,
        )
        return EngineConfig(
            model_config=model_config,
            cache_config=cache_config,
            scheduler_config=scheduler_config,
            parallel_config=parallel_config,
            stage_id=self.stage_id,
        )


@dataclass
class EngineConfig:
    model_config: ModelConfig
    cache_config: CacheConfig
    scheduler_config: SchedulerConfig
    parallel_config: ParallelConfig
    stage_id: int = 0
