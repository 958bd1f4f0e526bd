"""Flow-matching Euler scheduler in pure JAX.

TPU-native replacement for diffusers' FlowMatchEulerDiscreteScheduler that
the reference drives from torch (SURVEY.md §2.10 last row). Stateless:
`set_timesteps` returns arrays, `step` is pure — so the whole denoise step
jits and fuses.

Semantics parity (reference pipeline_qwen_image.py:63-71, 492-508):
  sigmas = linspace(1, 1/N, N), dynamic shift
  sigma' = exp(mu) / (exp(mu) + (1/sigma - 1))
  timesteps = sigma * num_train_timesteps; Euler step
  x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * v.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


class FlowMatchSchedule(NamedTuple):
    sigmas: jax.Array  # [N + 1], last entry 0
    timesteps: jax.Array  # [N]

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def set_timesteps(
    num_inference_steps: int,
    mu: Optional[float] = None,
    shift: float = 1.0,
    num_train_timesteps: int = 1000,
    sigmas: Optional[Sequence[float]] = None,
) -> FlowMatchSchedule:
    if sigmas is None:
        sig = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
    else:
        sig = np.asarray(sigmas, np.float64)
    if mu is not None:
        # dynamic (resolution-dependent) time shift
        sig = math.exp(mu) / (math.exp(mu) + (1.0 / sig - 1.0))
    elif shift != 1.0:
        sig = shift * sig / (1.0 + (shift - 1.0) * sig)
    timesteps = sig * num_train_timesteps
    sig = np.append(sig, 0.0)
    return FlowMatchSchedule(
        sigmas=jnp.asarray(sig, jnp.float32),
        timesteps=jnp.asarray(timesteps, jnp.float32),
    )


def step(
    latents: jax.Array,
    velocity: jax.Array,
    sigma: jax.Array,
    sigma_next: jax.Array,
) -> jax.Array:
    """One Euler flow-match update (computed in f32 for stability)."""
    out = latents.astype(jnp.float32) + (sigma_next - sigma) * velocity.astype(
        jnp.float32
    )
    return out.astype(latents.dtype)


def add_noise(
    clean: jax.Array, noise: jax.Array, sigma: jax.Array
) -> jax.Array:
    """Forward process x_t = (1 - sigma) * x_0 + sigma * noise (for img2img
    / edit strength and training)."""
    c = clean.astype(jnp.float32)
    n = noise.astype(jnp.float32)
    return ((1.0 - sigma) * c + sigma * n).astype(clean.dtype)
