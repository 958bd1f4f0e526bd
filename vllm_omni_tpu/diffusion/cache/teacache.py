"""TeaCache: timestep-embedding-aware step skipping.

Parity: TeaCacheBackend (reference diffusion/cache/teacache/backend.py:22,
hook/state/extractors) — accumulate the polynomial-rescaled relative-L1
distance of the first block's timestep-modulated input between steps; when
the accumulator stays under `rel_l1_thresh`, skip the transformer forward
and replay the cached velocity ("~1.5x speedup with minimal quality loss",
reference data.py:146-147).

TPU design: the distance is computed by a small jitted probe (img_in +
block-0 modulation — a tiny fraction of a full forward); the skip decision
is a host-side branch between jitted denoise steps.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.diffusion import DiffusionCacheConfig

# Default rescaling polynomial (identity) — per-model coefficient tables
# plug in here (reference teacache/extractors.py).
DEFAULT_COEFFICIENTS = [1.0, 0.0]


@partial(jax.jit)
def _modulated_input_probe(tf_params, latents, t):
    """First-block timestep-modulated image input (cheap TeaCache signal)."""
    from vllm_omni_tpu.diffusion.layers import modulate, timestep_embed
    from vllm_omni_tpu.models.layers import linear

    temb = timestep_embed(
        tf_params["time_embed"], jnp.full((latents.shape[0],), t), 0
    )
    temb_act = jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype)
    img_h = linear(latents, tf_params["img_in"]["w"], tf_params["img_in"]["b"])
    blocks = tf_params["blocks"]
    mod_w = blocks["img_mod"]["w"][0]
    mod_b = blocks["img_mod"]["b"][0]
    mod = linear(temb_act, mod_w, mod_b)
    mod1, _ = jnp.split(mod, 2, axis=-1)
    modulated, _ = modulate(img_h, mod1)
    return modulated.astype(jnp.float32)


class TeaCacheBackend:
    def __init__(self, config: DiffusionCacheConfig, pipeline):
        self.config = config
        self.coefficients = config.coefficients or DEFAULT_COEFFICIENTS
        self.num_warmup = config.num_warmup_steps
        self.thresh = config.rel_l1_thresh
        self._reset()

    def _reset(self):
        self.accumulated = 0.0
        self.prev_probe: Optional[jax.Array] = None
        self.cached_velocity: Optional[jax.Array] = None
        self.num_steps = 0
        self.skipped = 0

    def begin_run(self, num_steps: int):
        self._reset()
        self.num_steps = num_steps

    def should_skip(self, i: int, tf_params, t, latents) -> bool:
        # never skip warmup or the last step, and never without a cached
        # velocity to replay
        if (
            i < self.num_warmup
            or i >= self.num_steps - 1
            or self.cached_velocity is None
        ):
            probe = _modulated_input_probe(tf_params, latents, t)
            self.prev_probe = probe
            return False
        probe = _modulated_input_probe(tf_params, latents, t)
        prev = self.prev_probe
        self.prev_probe = probe
        rel = float(
            jnp.mean(jnp.abs(probe - prev))
            / jnp.maximum(jnp.mean(jnp.abs(prev)), 1e-8)
        )
        rescaled = float(np.polyval(self.coefficients, rel))
        self.accumulated += abs(rescaled)
        if self.accumulated < self.thresh:
            self.skipped += 1
            return True
        self.accumulated = 0.0
        return False

    def apply_skip(self, latents, sigma, sigma_next):
        return (
            latents.astype(jnp.float32)
            + (sigma_next - sigma) * self.cached_velocity
        ).astype(latents.dtype)

    def observe(self, i: int, prev_latents, new_latents, sigma, sigma_next):
        dt = sigma_next - sigma
        self.cached_velocity = (
            new_latents.astype(jnp.float32) - prev_latents.astype(jnp.float32)
        ) / jnp.where(jnp.abs(dt) > 1e-12, dt, 1.0)
