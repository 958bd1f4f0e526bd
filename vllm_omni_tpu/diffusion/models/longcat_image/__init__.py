"""LongCat-Image t2i + image-edit (flux-family MMDiT; reference
diffusion/models/longcat_image/: gelu-tanh FFNs/MLPs, no context norm;
position ids carry modality indices offset by text length,
pipeline_longcat_image.py:110-142)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_omni_tpu.diffusion.models.common.flux_like import pack_latents
from vllm_omni_tpu.diffusion.models.common.flux_pipeline import (
    FluxLikePipeline,
)


class LongCatImagePipeline(FluxLikePipeline):
    ffn_kind = "gelu"
    context_norm = False
    img_modality = 1
    img_offset_by_txt = True


class LongcatImageEditPipeline(LongCatImagePipeline):
    """i2i editing: the input image is VAE-encoded and appended to the
    token stream under modality id 2 (reference
    pipeline_longcat_image_edit.py:199-664: gen latents modality 1,
    condition modality 2, both offset by the text length; the prediction
    is sliced back to the generated stream)."""

    def prepare_condition(self, req, height, width):
        if req.image is None:
            raise ValueError("LongcatImageEdit requires an input image")
        img = jnp.asarray(req.image, jnp.float32)  # [B,3,H,W] in [-1,1]
        B = img.shape[0]
        if img.shape[2] != height or img.shape[3] != width:
            img = jax.image.resize(
                img, (B, 3, height, width), method="bicubic")
        v = self.vae.cfg
        z = self.vae.encode_mode(self.params["vae"], img)
        z = (z - v.shift_factor) * v.scaling_factor
        return pack_latents(z).astype(self.dtype)


__all__ = ["LongCatImagePipeline", "LongcatImageEditPipeline"]
