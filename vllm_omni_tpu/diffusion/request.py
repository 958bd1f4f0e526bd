"""Diffusion request state.

Parity: OmniDiffusionRequest (reference diffusion/request.py:14-187) —
the functional subset of its fields; exotic sparsity knobs (STA/VSA/MoBA)
arrive with those backends.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class OmniDiffusionRequest:
    request_id: str = "0"
    prompt: Any = ""  # str | list[str]
    negative_prompt: Any = ""
    prompt_embeds: Optional[Any] = None  # [B, Ntxt, joint_dim]
    prompt_embeds_mask: Optional[Any] = None
    negative_prompt_embeds: Optional[Any] = None
    negative_prompt_embeds_mask: Optional[Any] = None
    # pooled text projections (SD3-family CLIP pooled outputs)
    pooled_prompt_embeds: Optional[Any] = None
    negative_pooled_prompt_embeds: Optional[Any] = None
    height: Optional[int] = None
    width: Optional[int] = None
    num_frames: int = 1
    fps: Optional[int] = None
    num_inference_steps: int = 50
    sigmas: Optional[list[float]] = None
    guidance_scale: float = 1.0  # embedded-guidance models
    guidance_scale_2: Optional[float] = None  # Wan2.2 low-noise expert
    true_cfg_scale: float = 4.0  # classifier-free guidance
    cfg_normalize: bool = True  # norm-rescale after CFG combine
    num_images_per_prompt: int = 1
    seed: Optional[int] = None
    latents: Optional[Any] = None  # pre-made initial latents
    image: Optional[Any] = None  # input image(s) for edit/i2v
    image_embeds: Optional[Any] = None  # CLIP embeds (Wan i2v)
    strength: float = 1.0
    # layered decomposition (QwenImageLayeredPipeline; reference
    # request fields layers/resolution/use_en_prompt)
    layers: Optional[int] = None
    resolution: Optional[int] = None
    use_en_prompt: bool = False
    output_type: str = "pil"  # "pil" | "np" | "latent"
    # trajectory capture (reference request.py trajectory fields)
    return_trajectory: bool = False
    trajectory_latents: list = field(default_factory=list)
    trajectory_timesteps: list = field(default_factory=list)
    # profiling: capture a JAX profiler trace around the denoise loop
    # (reference request.py:153-154 profile/num_profiled_timesteps)
    profile: bool = False
    num_profiled_timesteps: Optional[int] = None
    error: Optional[str] = None
