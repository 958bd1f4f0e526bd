"""Diffusion engine configuration.

Parity: OmniDiffusionConfig / DiffusionParallelConfig / DiffusionCacheConfig
(reference vllm_omni/diffusion/data.py:26-455). TPU adaptations:
- parallel sizes become mesh axes (no master-port / process-group fields);
- CFG-parallel defaults to fused batched CFG under one jit;
- cache config keeps the TeaCache surface (rel_l1_thresh, coefficients) but
  the skip decision is made host-side between jitted steps (SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_omni_tpu.config.model import resolve_dtype


@dataclass
class DiffusionParallelConfig:
    """DP × CFG × SP(=ulysses×ring) × TP sizes.

    Parity: reference data.py:26-91 (world_size product + validation).
    """

    data_parallel_size: int = 1
    cfg_parallel_size: int = 1
    ulysses_degree: int = 1
    ring_degree: int = 1
    tensor_parallel_size: int = 1
    # intra-model pipeline parallelism (reference data.py:26-91
    # pipeline_parallel_size -> PipelineGroupCoordinator): layer groups
    # over a "pipe" mesh axis, GPipe-scheduled (parallel/pipeline.py)
    pipeline_parallel_size: int = 1
    # microbatches per step (None: one per effective batch row)
    pipeline_num_microbatches: Optional[int] = None
    vae_parallel_size: int = 0

    def __post_init__(self) -> None:
        if self.cfg_parallel_size not in (1, 2):
            raise ValueError("cfg_parallel_size must be 1 or 2")
        for name in ("data_parallel_size", "ulysses_degree", "ring_degree",
                     "tensor_parallel_size", "pipeline_parallel_size"):
            if getattr(self, name) < 1:
                raise ValueError(f"{name} must be >= 1")

    @property
    def sequence_parallel_size(self) -> int:
        return self.ulysses_degree * self.ring_degree

    @property
    def world_size(self) -> int:
        return (
            self.data_parallel_size
            * self.cfg_parallel_size
            * self.sequence_parallel_size
            * self.tensor_parallel_size
            * self.pipeline_parallel_size
        ) + self.vae_parallel_size


@dataclass
class DiffusionCacheConfig:
    """Cache-acceleration knobs (TeaCache-style step skipping).

    Parity: reference data.py:120-233.
    """

    cache_backend: str = ""  # "" | "teacache" | "dbcache"
    rel_l1_thresh: float = 0.2
    coefficients: Optional[list[float]] = None
    num_warmup_steps: int = 2
    # DBCache-style params kept for surface parity.
    Fn_compute_blocks: int = 8
    Bn_compute_blocks: int = 0
    residual_diff_threshold: float = 0.08


@dataclass
class OmniDiffusionConfig:
    model: str = ""
    hf_config: Optional[dict[str, Any]] = None
    pipeline_class: Optional[str] = None  # resolved from model_index.json if None
    dtype: Any = "bfloat16"
    seed: int = 0
    parallel_config: DiffusionParallelConfig = field(
        default_factory=DiffusionParallelConfig
    )
    cache_config: DiffusionCacheConfig = field(default_factory=DiffusionCacheConfig)
    # VAE memory knobs (reference data.py:237-455).
    vae_use_slicing: bool = False
    vae_use_tiling: bool = False
    # VAE compute dtype: f32 default (quality parity with the
    # reference's default); "bfloat16" roughly halves decode time on
    # TPU (bandwidth/pass-precision bound) at ~1e-2 image error
    vae_dtype: Any = "float32"
    # weight-only int8 (W8A16) on the DiT projections: ~2x less HBM for
    # weights (QwenImage 40L fits one v5e chip) + int8 weight streaming
    quantization: Optional[str] = None
    # LoRA (reference data.py:282-286): fused into base weights at load
    # (see diffusion/lora.py) — zero hot-path cost.
    lora_path: Optional[str] = None
    lora_nickname: str = "default"
    lora_target_modules: Optional[list[str]] = None
    lora_scale: float = 1.0
    # CPU offload (reference data.py:290-295): offloaded components keep
    # their params host-resident (numpy); XLA streams them to HBM per
    # call. Defaults False on TPU — HBM is usually the cheaper resource
    # and per-call H2D transfer rides the slow host link.
    dit_cpu_offload: bool = False
    text_encoder_cpu_offload: bool = False
    image_encoder_cpu_offload: bool = False
    vae_cpu_offload: bool = False
    # Phase offload (diffusers enable_model_cpu_offload semantics, the
    # reference's default serving mode for big models): the DiT lives
    # host-side and is device_put ONCE per request for the denoise loop,
    # then dropped before VAE decode — denoise runs full speed, and the
    # VAE gets the DiT's HBM. On v5e-1 this is what lets a 5B Wan DiT
    # and the 720p streamed VAE decode share one 16 GB chip.
    dit_phase_offload: bool = False
    # Wan2.2 MoE-DiT knobs.
    boundary_ratio: Optional[float] = None
    flow_shift: Optional[float] = None
    # Default generation params.
    default_height: int = 512
    default_width: int = 512
    default_num_inference_steps: int = 50
    default_guidance_scale: float = 4.0

    def __post_init__(self) -> None:
        self.dtype = resolve_dtype(self.dtype)
        self.vae_dtype = resolve_dtype(self.vae_dtype)
        if isinstance(self.parallel_config, dict):
            self.parallel_config = DiffusionParallelConfig(**self.parallel_config)
        if isinstance(self.cache_config, dict):
            self.cache_config = DiffusionCacheConfig(**self.cache_config)


# Context-style current config (parity: set_current_omni_diffusion_config,
# reference data.py:462-505).
_current_config: Optional[OmniDiffusionConfig] = None


def set_current_omni_diffusion_config(cfg: Optional[OmniDiffusionConfig]):
    global _current_config
    _current_config = cfg


def get_current_omni_diffusion_config() -> Optional[OmniDiffusionConfig]:
    return _current_config
