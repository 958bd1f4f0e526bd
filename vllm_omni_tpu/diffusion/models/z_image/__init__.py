from vllm_omni_tpu.diffusion.models.z_image.pipeline import ZImagePipeline
from vllm_omni_tpu.diffusion.models.z_image.transformer import (
    ZImageTransformer2DModel,
    ZImageTransformerConfig,
)

__all__ = [
    "ZImagePipeline",
    "ZImageTransformer2DModel",
    "ZImageTransformerConfig",
]
