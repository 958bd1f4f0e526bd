"""Wan2.2 t2v / ti2v / i2v pipelines (functional JAX).

Behavioral parity with the reference WanPipeline / WanImageToVideoPipeline
(reference diffusion/models/wan2_2/pipeline_wan2_2.py:167-597,
pipeline_wan2_2_i2v.py):
- flow-match Euler schedule with static `flow_shift` (12.0 for 480p,
  5.0 for 720p recommended);
- dual-DiT MoE via `boundary_ratio`: the high-noise expert runs while
  t >= boundary*1000, the low-noise expert (transformer_2) after, each
  with its own guidance scale;
- ti2v (expand_timesteps) image conditioning: first-frame latent
  condition blended via a frame mask, per-patch-token timesteps zeroed
  on conditioned tokens;
- Wan 3D causal VAE decode with latents mean/std un-normalization
  (the same VAE family as QwenImage — shared implementation).

TPU-first deltas: CFG batched in one forward; denoise step jitted once
per (expert, cfg) variant.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.config.diffusion import OmniDiffusionConfig
from vllm_omni_tpu.diffusion import scheduling
from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
    AutoencoderKLQwenImage,
    QwenImageVAEConfig,
)
from vllm_omni_tpu.diffusion.models.wan2_2.transformer import (
    WanTransformer3DModel,
    WanTransformerConfig,
)
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest
from vllm_omni_tpu.outputs import DiffusionMetrics


class WanPipeline:
    """t2v (and ti2v when the model config enables expand_timesteps)."""

    sp_shard_axis = 3  # latent height axis of [B, C, F, H, W]

    def __init__(
        self,
        od_config: OmniDiffusionConfig,
        transformer_config: Optional[WanTransformerConfig] = None,
        vae_config: Optional[QwenImageVAEConfig] = None,
        scheduler_config: Optional[dict[str, Any]] = None,
        load_weights: bool = True,
        text_encoder=None,
        has_transformer_2: bool = False,
        expand_timesteps: bool = False,
        rng_seed: int = 0,
    ):
        self.od_config = od_config
        self.dtype = od_config.dtype
        self.text_encoder = text_encoder
        tf_cfg = transformer_config or WanTransformerConfig()
        v_cfg = vae_config or QwenImageVAEConfig(
            temperal_downsample=(False, True, True))
        self.scheduler_config = scheduler_config or {"shift": 3.0}
        self.expand_timesteps = expand_timesteps
        self.has_transformer_2 = has_transformer_2
        if load_weights and od_config.model:
            from vllm_omni_tpu.diffusion.models.wan2_2.loader import (
                read_wan_configs,
            )

            (tf_cfg, v_cfg, self.scheduler_config, self.has_transformer_2,
             self.expand_timesteps) = read_wan_configs(
                od_config.model, tf_cfg, v_cfg, self.scheduler_config)
        if od_config.flow_shift is not None:
            self.scheduler_config["shift"] = od_config.flow_shift
        self.transformer = WanTransformer3DModel(tf_cfg, self.dtype)
        self.vae = AutoencoderKLQwenImage(
            v_cfg, getattr(od_config, 'vae_dtype', jnp.float32))
        self.vae_scale_factor_spatial = 2 ** sum(
            1 for _ in v_cfg.dim_mult[1:])
        self.vae_scale_factor_temporal = 2 ** sum(
            1 for t in v_cfg.temperal_downsample if t)
        self.boundary_ratio = od_config.boundary_ratio

        if load_weights and od_config.model:
            from vllm_omni_tpu.diffusion.models.wan2_2.loader import (
                load_wan_weights,
            )

            self.params = load_wan_weights(od_config.model, self)
        else:
            k1, k2, k3 = jax.random.split(jax.random.key(rng_seed), 3)
            self.params = {
                "transformer": self.transformer.init_params(k1),
                "transformer_2": (self.transformer.init_params(k3)
                                  if self.has_transformer_2 else None),
                "vae": self.vae.init_params(k2),
            }
        from vllm_omni_tpu.diffusion.offload import apply_offload_policy

        self.params = apply_offload_policy(self.params, od_config)
        self._denoise_step = self._build_denoise_step()
        self._decode_full = jax.jit(self.vae.decode)
        self.cache_backend = None
        # DP/SP placement hooks (parallel_placement.py)
        self._dp_place = lambda x: x
        self._sp_place = lambda x: x

    # ------------------------------------------------------------- steps
    def _build_denoise_step(self):
        transformer = self.transformer

        @partial(jax.jit, static_argnames=("do_cfg", "per_token"))
        def denoise_step(params, latents, txt, t, sigma, sigma_next,
                         guidance_scale, do_cfg: bool,
                         per_token: bool = False, token_mask=None):
            B = latents.shape[0]
            if per_token:
                # ti2v: per-token timesteps (conditioned tokens get t=0)
                tvec = jnp.broadcast_to(
                    token_mask[None] * t, (B, token_mask.shape[0]))
            else:
                tvec = jnp.full((B,), t, jnp.float32)
            if do_cfg:
                lat_in = jnp.concatenate([latents, latents], axis=0)
                tin = jnp.concatenate([tvec, tvec], axis=0)
                pred = transformer.forward(params, lat_in, tin, txt)
                pos, neg = pred[:B], pred[B:]
                velocity = neg + guidance_scale * (pos - neg)
            else:
                velocity = transformer.forward(params, latents, tvec, txt)
            return scheduling.step(latents, velocity, sigma, sigma_next)

        return denoise_step

    def _decode(self, params, z):
        """VAE decode; multi-frame clips stream chunk-by-chunk through
        the carried-state causal decoder (exact; bounds peak memory by
        the chunk, not the clip — a 21f 720p f32 single-shot decode is
        a 44 GB program)."""
        if z.shape[2] > 1:
            import os

            chunk = int(os.environ.get("OMNI_TPU_VAE_STREAM_CHUNK", "1"))
            return self.vae.decode_streamed(params, z, chunk_frames=chunk)
        return self._decode_full(params, z)

    def encode_prompt(self, prompts):
        if self.text_encoder is None:
            raise ValueError(
                "no text encoder attached; pass prompt_embeds explicitly")
        return self.text_encoder(prompts)

    # ------------------------------------------------------------ forward
    def forward(self, req: OmniDiffusionRequest):
        od = self.od_config
        c = self.transformer.cfg
        height = req.height or od.default_height
        width = req.width or od.default_width
        num_frames = req.num_frames or 81
        if num_frames % self.vae_scale_factor_temporal != 1:
            num_frames = max(
                num_frames // self.vae_scale_factor_temporal
                * self.vae_scale_factor_temporal + 1, 1)
        metrics = DiffusionMetrics()
        t_start = time.perf_counter()

        t0 = time.perf_counter()
        if req.prompt_embeds is None:
            prompts = (req.prompt if isinstance(req.prompt, list)
                       else [req.prompt])
            req.prompt_embeds = self.encode_prompt(prompts)
        do_cfg = req.guidance_scale > 1.0
        if do_cfg and req.negative_prompt_embeds is None:
            if self.text_encoder is None:
                do_cfg = False
            else:
                negs = (req.negative_prompt
                        if isinstance(req.negative_prompt, list)
                        else [req.negative_prompt or ""])
                req.negative_prompt_embeds = self.encode_prompt(negs)
        metrics.encode_latency = time.perf_counter() - t0

        embeds = jnp.asarray(req.prompt_embeds, self.dtype)
        B = embeds.shape[0]
        zc = self.vae.cfg.z_dim
        lat_f = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lat_h = height // self.vae_scale_factor_spatial
        lat_w = width // self.vae_scale_factor_spatial
        seed = req.seed if req.seed is not None else 0
        if req.latents is not None:
            latents = jnp.asarray(req.latents, self.dtype)
        else:
            latents = jax.random.normal(
                jax.random.key(seed), (B, zc, lat_f, lat_h, lat_w),
                jnp.float32).astype(self.dtype)

        # ti2v image condition
        latent_condition = None
        token_mask = None
        if self.expand_timesteps and req.image is not None:
            img = jnp.asarray(req.image, jnp.float32)  # [B,3,H,W] in [-1,1]
            z = self.vae.encode(
                self.params["vae"], img[:, :, None])  # [B, zc, 1, h, w]
            vcfg = self.vae.cfg
            if vcfg.latents_mean is not None:
                mean = jnp.asarray(vcfg.latents_mean, jnp.float32).reshape(
                    1, zc, 1, 1, 1)
                std = jnp.asarray(vcfg.latents_std, jnp.float32).reshape(
                    1, zc, 1, 1, 1)
                z = (z - mean) / std
            latent_condition = jnp.concatenate(
                [z, jnp.zeros((B, zc, lat_f - 1, lat_h, lat_w), z.dtype)],
                axis=2)
            # frame mask: first latent frame conditioned
            frame_mask = jnp.ones((lat_f,), jnp.float32).at[0].set(0.0)
            pt, ph, pw = c.patch_size
            token_mask = jnp.repeat(
                frame_mask[: (lat_f // pt) * pt : pt],
                (lat_h // ph) * (lat_w // pw))
            latents = jnp.where(
                frame_mask[None, None, :, None, None] > 0, latents,
                latent_condition)

        sched = scheduling.set_timesteps(
            req.num_inference_steps,
            shift=float(self.scheduler_config.get("shift", 3.0)),
            sigmas=req.sigmas)

        boundary_t = (self.boundary_ratio * 1000.0
                      if self.boundary_ratio is not None else None)
        g_high = req.guidance_scale
        g_low = getattr(req, "guidance_scale_2", None) or req.guidance_scale

        if do_cfg:
            neg = jnp.asarray(req.negative_prompt_embeds, self.dtype)
            Lt = max(embeds.shape[1], neg.shape[1])

            def pad_to(x, L):
                n = L - x.shape[1]
                return jnp.pad(x, ((0, 0), (0, n), (0, 0))) if n else x

            txt = jnp.concatenate([pad_to(embeds, Lt), pad_to(neg, Lt)],
                                  axis=0)
        else:
            txt = embeds

        # DP/SP placement: batch over 'data', latent H axis over 'seq'
        # (GSPMD partitions patchify + attention across the seq devices)
        latents = self._dp_place(latents)
        txt = self._dp_place(txt)
        latents = self._sp_place(latents)

        t0 = time.perf_counter()
        # phase offload: device-put the host-pinned DiT ONCE for the
        # whole denoise loop (vs per-call streaming), drop before VAE
        phase_off = getattr(od, "dit_phase_offload", False)
        if phase_off:
            dit_dev = {
                k: (jax.device_put(self.params[k])
                    if self.params.get(k) is not None else None)
                for k in ("transformer", "transformer_2")}
        else:
            dit_dev = {k: self.params.get(k)
                       for k in ("transformer", "transformer_2")}
        for i in range(sched.num_steps):
            t = float(sched.timesteps[i])
            use_low = (boundary_t is not None and t < boundary_t
                       and dit_dev.get("transformer_2") is not None)
            tparams = (dit_dev["transformer_2"] if use_low
                       else dit_dev["transformer"])
            g = g_low if use_low else g_high
            if self.expand_timesteps and latent_condition is not None:
                latents = jnp.where(
                    token_frame_mask(latents, token_mask, c) > 0,
                    latents, latent_condition)
                latents = self._denoise_step(
                    tparams, latents, txt, jnp.float32(t), sched.sigmas[i],
                    sched.sigmas[i + 1], jnp.float32(g), do_cfg=do_cfg,
                    per_token=True, token_mask=token_mask)
            else:
                latents = self._denoise_step(
                    tparams, latents, txt, jnp.float32(t), sched.sigmas[i],
                    sched.sigmas[i + 1], jnp.float32(g), do_cfg=do_cfg)
            if req.return_trajectory:
                req.trajectory_latents.append(latents)
                req.trajectory_timesteps.append(t)
        jax.block_until_ready(latents)
        metrics.denoise_latency = time.perf_counter() - t0
        metrics.num_steps = sched.num_steps
        if phase_off:
            # release the DiT's HBM before the VAE phase
            tparams = None
            dit_dev.clear()

        if self.expand_timesteps and latent_condition is not None:
            mask5 = token_frame_mask(latents, token_mask, c)
            latents = jnp.where(mask5 > 0, latents, latent_condition)

        if req.output_type == "latent":
            metrics.e2e_latency = time.perf_counter() - t_start
            return latents, metrics

        t0 = time.perf_counter()
        vcfg = self.vae.cfg
        z = latents.astype(self.vae.dtype)
        if vcfg.latents_mean is not None:
            mean = jnp.asarray(vcfg.latents_mean, self.vae.dtype).reshape(
                1, zc, 1, 1, 1)
            std = jnp.asarray(vcfg.latents_std, self.vae.dtype).reshape(
                1, zc, 1, 1, 1)
            z = z * std + mean
        video = jax.block_until_ready(self._decode(self.params["vae"], z))
        metrics.vae_latency = time.perf_counter() - t0
        metrics.e2e_latency = time.perf_counter() - t_start
        return video, metrics


def token_frame_mask(latents, token_mask, cfg) -> jax.Array:
    """Expand the per-latent-frame mask to [B, 1, F, 1, 1]."""
    lat_f = latents.shape[2]
    pt = cfg.patch_size[0]
    n_hw = token_mask.shape[0] // max(lat_f // pt, 1)
    frame_mask = token_mask[::n_hw]
    frame_mask = jnp.repeat(frame_mask, pt)[:lat_f]
    return frame_mask[None, None, :, None, None]


class WanImageToVideoPipeline(WanPipeline):
    """i2v. Two conditioning modes (reference pipeline_wan2_2_i2v.py:
    563-662):
    - expand_timesteps (TI2V-5B): first-frame latent blend + per-token
      timesteps — shares WanPipeline.forward;
    - Wan2.1-style (A14B): the first frame is VAE-encoded with zero
      padding for the remaining frames, a 4-channel temporal mask is
      stacked on top, and the 20-channel condition is CONCATENATED to
      the 16 noise channels per step (36-channel transformer input).
      Optional CLIP image embeds ride the image-prefix cross-attention.
    """

    def forward(self, req: OmniDiffusionRequest):
        if req.image is None:
            raise ValueError("WanImageToVideoPipeline needs req.image")
        if self.expand_timesteps:
            return super().forward(req)
        return self._forward_concat(req)

    def _build_concat_condition(self, img, B, num_frames, lat_f, lat_h,
                                lat_w, height, width):
        zc = self.vae.cfg.z_dim
        tscale = self.vae_scale_factor_temporal
        video = jnp.concatenate([
            img[:, :, None],
            jnp.zeros((B, img.shape[1], num_frames - 1, height, width),
                      img.dtype)], axis=2)
        z = self.vae.encode(self.params["vae"], video.astype(jnp.float32))
        vcfg = self.vae.cfg
        if vcfg.latents_mean is not None:
            mean = jnp.asarray(vcfg.latents_mean, jnp.float32).reshape(
                1, zc, 1, 1, 1)
            std = jnp.asarray(vcfg.latents_std, jnp.float32).reshape(
                1, zc, 1, 1, 1)
            z = (z - mean) / std
        # 4-channel temporal mask: frame 0 repeated tscale times, then
        # zeros, grouped [B, tscale, F_lat, h, w]
        mask = np.zeros((B, 1, num_frames, lat_h, lat_w), np.float32)
        mask[:, :, 0] = 1.0
        first = np.repeat(mask[:, :, 0:1], tscale, axis=2)
        mask = np.concatenate([first, mask[:, :, 1:]], axis=2)
        mask = mask.reshape(B, -1, tscale, lat_h, lat_w).transpose(
            0, 2, 1, 3, 4)  # [B, tscale, F_lat, h, w]
        return jnp.concatenate(
            [jnp.asarray(mask), z.astype(jnp.float32)], axis=1)

    def _forward_concat(self, req: OmniDiffusionRequest):
        import time as _time

        od = self.od_config
        height = req.height or od.default_height
        width = req.width or od.default_width
        num_frames = req.num_frames or 81
        if num_frames % self.vae_scale_factor_temporal != 1:
            num_frames = max(
                num_frames // self.vae_scale_factor_temporal
                * self.vae_scale_factor_temporal + 1, 1)
        metrics = DiffusionMetrics()
        t_start = _time.perf_counter()

        if req.prompt_embeds is None:
            prompts = (req.prompt if isinstance(req.prompt, list)
                       else [req.prompt])
            req.prompt_embeds = self.encode_prompt(prompts)
        do_cfg = req.guidance_scale > 1.0 and \
            req.negative_prompt_embeds is not None
        embeds = jnp.asarray(req.prompt_embeds, self.dtype)
        B = embeds.shape[0]
        zc = self.vae.cfg.z_dim
        lat_f = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lat_h = height // self.vae_scale_factor_spatial
        lat_w = width // self.vae_scale_factor_spatial
        seed = req.seed if req.seed is not None else 0
        latents = (jnp.asarray(req.latents, self.dtype)
                   if req.latents is not None else jax.random.normal(
                       jax.random.key(seed), (B, zc, lat_f, lat_h, lat_w),
                       jnp.float32).astype(self.dtype))

        img = jnp.asarray(req.image, jnp.float32)  # [B, 3, H, W] in [-1,1]
        condition = self._build_concat_condition(
            img, B, num_frames, lat_f, lat_h, lat_w, height, width)
        image_embeds = getattr(req, "image_embeds", None)
        if image_embeds is not None:
            image_embeds = jnp.asarray(image_embeds, self.dtype)

        sched = scheduling.set_timesteps(
            req.num_inference_steps,
            shift=float(self.scheduler_config.get("shift", 3.0)),
            sigmas=req.sigmas)
        boundary_t = (self.boundary_ratio * 1000.0
                      if self.boundary_ratio is not None else None)
        g_high = req.guidance_scale
        g_low = req.guidance_scale_2 or req.guidance_scale

        if do_cfg:
            neg = jnp.asarray(req.negative_prompt_embeds, self.dtype)
            Lt = max(embeds.shape[1], neg.shape[1])

            def pad_to(x, L):
                n = L - x.shape[1]
                return jnp.pad(x, ((0, 0), (0, n), (0, 0))) if n else x

            txt = jnp.concatenate([pad_to(embeds, Lt), pad_to(neg, Lt)],
                                  axis=0)
        else:
            txt = embeds

        transformer = self.transformer

        @partial(jax.jit, static_argnames=("do_cfg",))
        def step(params, latents, condition, txt, img_emb, t, sigma,
                 sigma_next, g, do_cfg: bool):
            lat_in = jnp.concatenate(
                [latents.astype(self.dtype),
                 condition.astype(self.dtype)], axis=1)
            if do_cfg:
                lat2 = jnp.concatenate([lat_in, lat_in], axis=0)
                tvec = jnp.full((2 * latents.shape[0],), t, jnp.float32)
                ie = (jnp.concatenate([img_emb, img_emb], axis=0)
                      if img_emb is not None else None)
                pred = transformer.forward(params, lat2, tvec, txt, ie)
                pos, negp = pred[:latents.shape[0]], pred[latents.shape[0]:]
                velocity = negp + g * (pos - negp)
            else:
                tvec = jnp.full((latents.shape[0],), t, jnp.float32)
                velocity = transformer.forward(params, lat_in, tvec, txt,
                                               img_emb)
            return scheduling.step(latents, velocity, sigma, sigma_next)

        t0 = _time.perf_counter()
        for i in range(sched.num_steps):
            t = float(sched.timesteps[i])
            use_low = (boundary_t is not None and t < boundary_t
                       and self.params.get("transformer_2") is not None)
            tparams = (self.params["transformer_2"] if use_low
                       else self.params["transformer"])
            latents = step(tparams, latents, condition, txt, image_embeds,
                           jnp.float32(t), sched.sigmas[i],
                           sched.sigmas[i + 1],
                           jnp.float32(g_low if use_low else g_high),
                           do_cfg=do_cfg)
        jax.block_until_ready(latents)
        metrics.denoise_latency = _time.perf_counter() - t0
        metrics.num_steps = sched.num_steps

        if req.output_type == "latent":
            metrics.e2e_latency = _time.perf_counter() - t_start
            return latents, metrics

        vcfg = self.vae.cfg
        z = latents.astype(self.vae.dtype)
        if vcfg.latents_mean is not None:
            mean = jnp.asarray(vcfg.latents_mean, self.vae.dtype).reshape(
                1, zc, 1, 1, 1)
            std = jnp.asarray(vcfg.latents_std, self.vae.dtype).reshape(
                1, zc, 1, 1, 1)
            z = z * std + mean
        video = jax.block_until_ready(self._decode(self.params["vae"], z))
        metrics.e2e_latency = _time.perf_counter() - t_start
        return video, metrics
