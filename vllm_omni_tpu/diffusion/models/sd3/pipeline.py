"""StableDiffusion3 t2i pipeline (offline, functional JAX).

Behavioral parity with the reference StableDiffusion3Pipeline (reference
diffusion/models/sd3/pipeline_sd3.py:129-666): flow-match Euler schedule
with the scheduler's static `shift` (dynamic `mu` shift only when the
scheduler config asks for it), standard CFG
`neg + g*(pos - neg)` (no norm rescale), unpacked [B, C, H/8, W/8]
latents (the transformer patchifies), VAE un-normalization
`z / scaling_factor + shift_factor`.

TPU-first deltas: CFG is one batched forward; the denoise step jits; the
CLIP/CLIP/T5 prompt encoders stay pluggable callables (the reference
loads them via transformers; pass `text_encoder(prompts) ->
(prompt_embeds [B, L, joint_dim], pooled [B, pooled_dim])`).
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
from vllm_omni_tpu.diffusion.models.sd3.transformer import (
    SD3Transformer2DModel,
    SD3TransformerConfig,
)
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest
from vllm_omni_tpu.outputs import DiffusionMetrics


class StableDiffusion3Pipeline:
    def __init__(
        self,
        od_config: OmniDiffusionConfig,
        transformer_config: Optional[SD3TransformerConfig] = None,
        vae_config: Optional[AutoencoderKLConfig] = None,
        scheduler_config: Optional[dict[str, Any]] = None,
        load_weights: bool = True,
        text_encoder=None,
        rng_seed: int = 0,
    ):
        self.od_config = od_config
        self.dtype = od_config.dtype
        tf_cfg = transformer_config or SD3TransformerConfig()
        v_cfg = vae_config or AutoencoderKLConfig()
        self.scheduler_config = scheduler_config or {"shift": 3.0}
        if load_weights and od_config.model:
            from vllm_omni_tpu.diffusion.models.sd3.loader import (
                read_sd3_configs,
            )

            tf_cfg, v_cfg, self.scheduler_config = read_sd3_configs(
                od_config.model, tf_cfg, v_cfg, self.scheduler_config)
        self.transformer = SD3Transformer2DModel(tf_cfg, self.dtype)
        self.vae = AutoencoderKL(v_cfg, jnp.float32)
        self.vae_scale_factor = v_cfg.spatial_scale
        self.text_encoder = text_encoder
        if load_weights and od_config.model:
            from vllm_omni_tpu.diffusion.models.sd3.loader import (
                load_sd3_weights,
            )

            self.params = load_sd3_weights(od_config.model, self)
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

    # ------------------------------------------------------------- steps
    def _build_denoise_step(self):
        transformer = self.transformer

        @partial(jax.jit, static_argnames=("do_cfg",))
        def denoise_step(params, latents, txt, pooled, t, sigma, sigma_next,
                         guidance_scale, do_cfg: bool):
            B = latents.shape[0]
            if do_cfg:
                lat_in = jnp.concatenate([latents, latents], axis=0)
                tvec = jnp.full((2 * B,), t, jnp.float32)
                pred = transformer.forward(params, lat_in, txt, pooled, tvec)
                pos, neg = pred[:B], pred[B:]
                velocity = neg + guidance_scale * (pos - neg)
            else:
                tvec = jnp.full((B,), t, jnp.float32)
                velocity = transformer.forward(
                    params, latents, txt, pooled, tvec)
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
            raise ValueError(
                f"height/width must be divisible by {s}, got "
                f"{height}x{width}")
        metrics = DiffusionMetrics()
        t_start = time.perf_counter()

        t0 = time.perf_counter()
        if req.prompt_embeds is None:
            if self.text_encoder is None:
                raise ValueError(
                    "no text encoder attached; pass prompt_embeds + "
                    "pooled_prompt_embeds explicitly")
            prompts = (req.prompt if isinstance(req.prompt, list)
                       else [req.prompt])
            req.prompt_embeds, req.pooled_prompt_embeds = \
                self.text_encoder(prompts)
        do_cfg = req.guidance_scale > 1.0
        if do_cfg and req.negative_prompt_embeds is None:
            if self.text_encoder is None:
                do_cfg = False
            else:
                negs = (req.negative_prompt
                        if isinstance(req.negative_prompt, list)
                        else [req.negative_prompt or ""])
                (req.negative_prompt_embeds,
                 req.negative_pooled_prompt_embeds) = self.text_encoder(negs)
        metrics.encode_latency = time.perf_counter() - t0

        embeds = jnp.asarray(req.prompt_embeds, self.dtype)
        pooled = jnp.asarray(req.pooled_prompt_embeds, self.dtype)
        B = embeds.shape[0]

        lat_h = height // self.vae_scale_factor
        lat_w = width // self.vae_scale_factor
        seed = req.seed if req.seed is not None else 0
        if req.latents is not None:
            latents = jnp.asarray(req.latents, self.dtype)
        else:
            latents = jax.random.normal(
                jax.random.key(seed), (B, c.in_channels, lat_h, lat_w),
                jnp.float32).astype(self.dtype)

        # timesteps: static scheduler shift unless dynamic shifting is on
        sc = self.scheduler_config
        if sc.get("use_dynamic_shifting"):
            image_seq_len = (lat_h // c.patch_size) * (lat_w // c.patch_size)
            mu = scheduling.calculate_shift(
                image_seq_len,
                sc.get("base_image_seq_len", 256),
                sc.get("max_image_seq_len", 4096),
                sc.get("base_shift", 0.5),
                sc.get("max_shift", 1.16))
            sched = scheduling.set_timesteps(
                req.num_inference_steps, mu=mu, sigmas=req.sigmas)
        else:
            sched = scheduling.set_timesteps(
                req.num_inference_steps, shift=float(sc.get("shift", 3.0)),
                sigmas=req.sigmas)

        if do_cfg:
            neg = jnp.asarray(req.negative_prompt_embeds, self.dtype)
            neg_pooled = jnp.asarray(
                req.negative_pooled_prompt_embeds, self.dtype)
            Lt = max(embeds.shape[1], neg.shape[1])

            def pad_to(x, L):
                n = L - x.shape[1]
                return jnp.pad(x, ((0, 0), (0, n), (0, 0))) if n else x

            txt = jnp.concatenate([pad_to(embeds, Lt), pad_to(neg, Lt)],
                                  axis=0)
            pooled_in = jnp.concatenate([pooled, neg_pooled], axis=0)
        else:
            txt, pooled_in = embeds, pooled

        t0 = time.perf_counter()
        cache = self.cache_backend
        if cache is not None:
            cache.begin_run(int(sched.num_steps))
        for i in range(sched.num_steps):
            t = sched.timesteps[i]
            if cache is not None and cache.should_skip(
                    i, self.params["transformer"], t / 1000.0, latents):
                latents = cache.apply_skip(latents, sched.sigmas[i],
                                           sched.sigmas[i + 1])
                metrics.steps_skipped += 1
                continue
            prev = latents
            latents = self._denoise_step(
                self.params["transformer"], latents, txt, pooled_in, t,
                sched.sigmas[i], sched.sigmas[i + 1],
                jnp.float32(req.guidance_scale), do_cfg=do_cfg)
            if cache is not None:
                cache.observe(i, prev, latents, sched.sigmas[i],
                              sched.sigmas[i + 1])
            if req.return_trajectory:
                req.trajectory_latents.append(latents)
                req.trajectory_timesteps.append(float(sched.timesteps[i]))
        jax.block_until_ready(latents)
        metrics.denoise_latency = time.perf_counter() - t0
        metrics.num_steps = sched.num_steps

        if req.output_type == "latent":
            metrics.e2e_latency = time.perf_counter() - t_start
            return latents, metrics

        t0 = time.perf_counter()
        v = self.vae.cfg
        z = (latents.astype(jnp.float32) / v.scaling_factor) + v.shift_factor
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
