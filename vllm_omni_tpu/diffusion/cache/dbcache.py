"""DBCache-style residual caching with TaylorSeer extrapolation.

Parity role: CacheDiTBackend (reference diffusion/cache/
cache_dit_backend.py, wrapping the cache-dit package: DBCache Fn/Bn
compute blocks + residual-diff thresholds + TaylorSeer). TPU adaptation:
the skip decision stays a host-side branch between jitted denoise steps
(same placement as TeaCache); the decision signal is the relative L1
between the last two computed velocities, the warm head/tail of the
schedule (`Fn_compute_blocks` leading / `Bn_compute_blocks` trailing
STEPS here — block-granular splitting of a scanned stack would defeat
XLA fusion, so the dual-block knobs act on the step axis), and skipped
steps replay a first-order TaylorSeer extrapolation of the velocity
instead of a frozen copy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.diffusion import DiffusionCacheConfig


class DBCacheBackend:
    def __init__(self, config: DiffusionCacheConfig, pipeline=None):
        self.config = config
        self.thresh = config.residual_diff_threshold
        self.head = max(1, config.Fn_compute_blocks // 4)  # leading steps
        self.tail = max(1, config.Bn_compute_blocks or 1)  # trailing steps
        self.max_consecutive = 3
        self._reset()

    def _reset(self):
        self.num_steps = 0
        self.skipped = 0
        self._consecutive = 0
        self._v_last: Optional[jax.Array] = None
        self._v_prev: Optional[jax.Array] = None
        self._steps_since_compute = 0

    def begin_run(self, num_steps: int):
        self._reset()
        self.num_steps = num_steps

    def should_skip(self, i: int, tf_params, t, latents) -> bool:
        if (i < self.head or i >= self.num_steps - self.tail
                or self._v_last is None or self._v_prev is None
                or self._consecutive >= self.max_consecutive):
            return False
        rel = float(
            jnp.mean(jnp.abs(self._v_last - self._v_prev))
            / jnp.maximum(jnp.mean(jnp.abs(self._v_prev)), 1e-8))
        if rel < self.thresh:
            self.skipped += 1
            self._consecutive += 1
            return True
        self._consecutive = 0
        return False

    def _extrapolated_velocity(self) -> jax.Array:
        # first-order TaylorSeer: v + dv * steps_since_last_compute
        dv = self._v_last - self._v_prev
        return self._v_last + dv * float(self._steps_since_compute + 1)

    def apply_skip(self, latents, sigma, sigma_next):
        v = self._extrapolated_velocity()
        self._steps_since_compute += 1
        return (latents.astype(jnp.float32)
                + (sigma_next - sigma) * v).astype(latents.dtype)

    def observe(self, i: int, prev_latents, new_latents, sigma, sigma_next):
        dt = sigma_next - sigma
        v = (new_latents.astype(jnp.float32)
             - prev_latents.astype(jnp.float32)) / jnp.where(
                 jnp.abs(dt) > 1e-12, dt, 1.0)
        self._v_prev = self._v_last if self._v_last is not None else v
        self._v_last = v
        self._steps_since_compute = 0
