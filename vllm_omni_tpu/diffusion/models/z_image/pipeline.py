"""Z-Image t2i pipeline (functional JAX).

Behavioral parity with the reference ZImagePipeline (reference
diffusion/models/z_image/pipeline_z_image.py:313-615):
- flow-match Euler with dynamic mu shift over (H/16)*(W/16) tokens;
- transformer timesteps REVERSED: (1000 - t) / 1000;
- model output NEGATED before the Euler step (the DiT predicts -v);
- CFG combine `pos + g * (pos - neg)` with optional norm CAP
  (cfg_normalization = max ratio of the positive norm) and cfg
  truncation (guidance disabled once normalized time exceeds it);
- VAE un-normalization z / scaling_factor + shift_factor (flux-style
  16ch KL VAE, shared AutoencoderKL).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
from vllm_omni_tpu.diffusion import scheduling
from vllm_omni_tpu.diffusion.models.common.autoencoder_kl import (
    AutoencoderKL,
    AutoencoderKLConfig,
)
from vllm_omni_tpu.diffusion.models.z_image.transformer import (
    ZImageTransformer2DModel,
    ZImageTransformerConfig,
)
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest
from vllm_omni_tpu.outputs import DiffusionMetrics


class ZImagePipeline:
    def __init__(
        self,
        od_config: OmniDiffusionConfig,
        transformer_config: Optional[ZImageTransformerConfig] = None,
        vae_config: Optional[AutoencoderKLConfig] = None,
        scheduler_config: Optional[dict[str, Any]] = None,
        load_weights: bool = True,
        text_encoder=None,
        cfg_normalization: float = 0.0,
        cfg_truncation: float = 1.0,
        rng_seed: int = 0,
    ):
        self.od_config = od_config
        self.dtype = od_config.dtype
        tf_cfg = transformer_config or ZImageTransformerConfig()
        v_cfg = vae_config or AutoencoderKLConfig(
            scaling_factor=0.3611, shift_factor=0.1159)
        self.scheduler_config = scheduler_config or {
            "base_image_seq_len": 256, "max_image_seq_len": 4096,
            "base_shift": 0.5, "max_shift": 1.15}
        if load_weights and od_config.model:
            from vllm_omni_tpu.diffusion.models.z_image.loader import (
                read_z_image_configs,
            )

            tf_cfg, v_cfg, self.scheduler_config = read_z_image_configs(
                od_config.model, tf_cfg, v_cfg, self.scheduler_config)
        self.transformer = ZImageTransformer2DModel(tf_cfg, self.dtype)
        self.vae = AutoencoderKL(v_cfg, jnp.float32)
        self.vae_scale_factor = v_cfg.spatial_scale
        self.text_encoder = text_encoder
        self.cfg_normalization = cfg_normalization
        self.cfg_truncation = cfg_truncation
        if load_weights and od_config.model:
            import os

            from vllm_omni_tpu.diffusion.models.z_image.loader import (
                _read_safetensors,
            )

            self.params = {
                "transformer": self.transformer.load_weights(
                    od_config.model),
                "vae": self.vae.load_from_state_dict(_read_safetensors(
                    os.path.join(od_config.model, "vae"))),
            }
        else:
            k1, k2 = jax.random.split(jax.random.key(rng_seed))
            self.params = {
                "transformer": self.transformer.init_params(k1),
                "vae": self.vae.init_params(k2),
            }
        from vllm_omni_tpu.diffusion.offload import apply_offload_policy

        self.params = apply_offload_policy(self.params, od_config)
        self._denoise_step = self._build_denoise_step()
        self._decode = jax.jit(self.vae.decode)
        self.cache_backend = None

    def _build_denoise_step(self):
        transformer = self.transformer

        @partial(jax.jit, static_argnames=("do_cfg", "cap_len",
                                           "cfg_normalization"))
        def denoise_step(params, latents, cap, t, sigma, sigma_next,
                         guidance_scale, do_cfg: bool, cap_len: int,
                         cfg_normalization: float):
            B = latents.shape[0]
            # reversed-normalized timestep
            tnorm = (1000.0 - t) / 1000.0
            if do_cfg:
                lat_in = jnp.concatenate([latents, latents], axis=0)
                tvec = jnp.full((2 * B,), tnorm, jnp.float32)
                pred = transformer.forward(params, lat_in, tvec, cap,
                                           cap_len)
                pos = pred[:B].astype(jnp.float32)
                neg = pred[B:].astype(jnp.float32)
                out = pos + guidance_scale * (pos - neg)
                if cfg_normalization > 0.0:
                    pos_norm = jnp.linalg.norm(pos.reshape(B, -1), axis=-1)
                    new_norm = jnp.linalg.norm(out.reshape(B, -1), axis=-1)
                    max_norm = pos_norm * cfg_normalization
                    ratio = jnp.where(new_norm > max_norm,
                                      max_norm / jnp.maximum(new_norm, 1e-8),
                                      1.0)
                    out = out * ratio[:, None, None, None]
            else:
                tvec = jnp.full((B,), tnorm, jnp.float32)
                out = transformer.forward(params, latents, tvec, cap,
                                          cap_len).astype(jnp.float32)
            velocity = -out  # the DiT predicts -v
            return scheduling.step(latents, velocity, sigma, sigma_next)

        return denoise_step

    # ------------------------------------------------------------ forward
    def forward(self, req: OmniDiffusionRequest):
        od = self.od_config
        c = self.transformer.cfg
        height = req.height or od.default_height
        width = req.width or od.default_width
        s = self.vae_scale_factor * c.patch_size
        if height % s or width % s:
            raise ValueError(f"height/width must be divisible by {s}")
        metrics = DiffusionMetrics()
        t_start = time.perf_counter()

        t0 = time.perf_counter()
        if req.prompt_embeds is None:
            if self.text_encoder is None:
                raise ValueError("no text encoder; pass prompt_embeds")
            prompts = (req.prompt if isinstance(req.prompt, list)
                       else [req.prompt])
            req.prompt_embeds = self.text_encoder(prompts)
        do_cfg = req.guidance_scale > 1.0
        if do_cfg and req.negative_prompt_embeds is None:
            if self.text_encoder is None:
                do_cfg = False
            else:
                negs = (req.negative_prompt
                        if isinstance(req.negative_prompt, list)
                        else [req.negative_prompt or ""])
                req.negative_prompt_embeds = self.text_encoder(negs)
        metrics.encode_latency = time.perf_counter() - t0

        embeds = jnp.asarray(req.prompt_embeds, self.dtype)
        B = embeds.shape[0]
        lat_h = height // self.vae_scale_factor
        lat_w = width // self.vae_scale_factor
        seed = req.seed if req.seed is not None else 0
        if req.latents is not None:
            latents = jnp.asarray(req.latents, jnp.float32)
        else:
            latents = jax.random.normal(
                jax.random.key(seed), (B, c.in_channels, lat_h, lat_w),
                jnp.float32)

        sc = self.scheduler_config
        image_seq_len = (lat_h // c.patch_size) * (lat_w // c.patch_size)
        mu = scheduling.calculate_shift(
            image_seq_len, sc.get("base_image_seq_len", 256),
            sc.get("max_image_seq_len", 4096), sc.get("base_shift", 0.5),
            sc.get("max_shift", 1.15))
        sched = scheduling.set_timesteps(
            req.num_inference_steps, mu=mu, sigmas=req.sigmas)

        if do_cfg:
            neg = jnp.asarray(req.negative_prompt_embeds, self.dtype)
            Lt = max(embeds.shape[1], neg.shape[1])

            def pad_to(x, L):
                n = L - x.shape[1]
                return jnp.pad(x, ((0, 0), (0, n), (0, 0))) if n else x

            cap = jnp.concatenate([pad_to(embeds, Lt), pad_to(neg, Lt)],
                                  axis=0)
            cap_len = Lt
        else:
            cap, cap_len = embeds, embeds.shape[1]

        t0 = time.perf_counter()
        for i in range(sched.num_steps):
            t = float(sched.timesteps[i])
            # cfg truncation: normalized time (1000-t)/1000 past the
            # threshold disables guidance entirely
            g = req.guidance_scale
            step_cfg = do_cfg
            if do_cfg and self.cfg_truncation is not None and \
                    float(self.cfg_truncation) <= 1.0:
                if (1000.0 - t) / 1000.0 > float(self.cfg_truncation):
                    step_cfg = False
            latents = self._denoise_step(
                self.params["transformer"], latents,
                cap if step_cfg else cap[:B], jnp.float32(t),
                sched.sigmas[i], sched.sigmas[i + 1], jnp.float32(g),
                do_cfg=step_cfg, cap_len=cap_len,
                cfg_normalization=float(self.cfg_normalization or 0.0))
            if req.return_trajectory:
                req.trajectory_latents.append(latents)
                req.trajectory_timesteps.append(t)
        jax.block_until_ready(latents)
        metrics.denoise_latency = time.perf_counter() - t0
        metrics.num_steps = sched.num_steps

        if req.output_type == "latent":
            metrics.e2e_latency = time.perf_counter() - t_start
            return latents, metrics

        t0 = time.perf_counter()
        v = self.vae.cfg
        z = latents.astype(jnp.float32) / v.scaling_factor + v.shift_factor
        from vllm_omni_tpu.diffusion.models.common.autoencoder_kl import (
            decode_with_memory_opts,
        )

        image = jax.block_until_ready(decode_with_memory_opts(
            self.vae, self.params["vae"], z,
            use_slicing=self.od_config.vae_use_slicing,
            use_tiling=self.od_config.vae_use_tiling,
            decode_fn=self._decode))
        metrics.vae_latency = time.perf_counter() - t0
        metrics.e2e_latency = time.perf_counter() - t_start
        return image, metrics
