"""LongCat-Image t2i (flux-family MMDiT; reference diffusion/models/
longcat_image/: gelu-tanh FFNs/MLPs, no context norm). The edit variant
shares the architecture with image conditioning (lands with the i2i
conditioning pass)."""

from vllm_omni_tpu.diffusion.models.common.flux_pipeline import (
    FluxLikePipeline,
)


class LongCatImagePipeline(FluxLikePipeline):
    ffn_kind = "gelu"
    context_norm = False


__all__ = ["LongCatImagePipeline"]
