"""Ovis-Image t2i (flux-family MMDiT; reference diffusion/models/
ovis_image/: SwiGLU FFNs, gated-silu single-block MLP, RMS-normed
context embedder)."""

from vllm_omni_tpu.diffusion.models.common.flux_pipeline import (
    FluxLikePipeline,
)


class OvisImagePipeline(FluxLikePipeline):
    ffn_kind = "swiglu"
    context_norm = True


__all__ = ["OvisImagePipeline"]
