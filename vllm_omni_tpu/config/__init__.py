from vllm_omni_tpu.config.model import ModelConfig
from vllm_omni_tpu.config.cache import CacheConfig
from vllm_omni_tpu.config.scheduler import SchedulerConfig
from vllm_omni_tpu.config.parallel import ParallelConfig
from vllm_omni_tpu.config.engine import EngineConfig, EngineArgs
from vllm_omni_tpu.config.stage import StageConfig, load_stage_configs_from_yaml, load_stage_configs_from_model
from vllm_omni_tpu.config.diffusion import (
    OmniDiffusionConfig,
    DiffusionParallelConfig,
    DiffusionCacheConfig,
)

__all__ = [
    "ModelConfig",
    "CacheConfig",
    "SchedulerConfig",
    "ParallelConfig",
    "EngineConfig",
    "EngineArgs",
    "StageConfig",
    "load_stage_configs_from_yaml",
    "load_stage_configs_from_model",
    "OmniDiffusionConfig",
    "DiffusionParallelConfig",
    "DiffusionCacheConfig",
]
