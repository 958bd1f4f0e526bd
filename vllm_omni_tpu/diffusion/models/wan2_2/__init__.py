from vllm_omni_tpu.diffusion.models.wan2_2.pipeline import (
    WanImageToVideoPipeline,
    WanPipeline,
)
from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
    WanTransformer3DModel,
    WanTransformerConfig,
)

__all__ = [
    "WanPipeline",
    "WanImageToVideoPipeline",
    "WanTransformer3DModel",
    "WanTransformerConfig",
]
