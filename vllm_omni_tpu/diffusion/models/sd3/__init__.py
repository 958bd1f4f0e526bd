from vllm_omni_tpu.diffusion.models.sd3.pipeline import (
    StableDiffusion3Pipeline,
)
from vllm_omni_tpu.diffusion.models.sd3.transformer import (
    SD3Transformer2DModel,
    SD3TransformerConfig,
)

__all__ = [
    "StableDiffusion3Pipeline",
    "SD3Transformer2DModel",
    "SD3TransformerConfig",
]
