"""Shared Flux-family t2i pipeline (Ovis-Image, LongCat-Image).

Behavioral parity with the reference OvisImagePipeline /
LongCatImagePipeline (reference diffusion/models/ovis_image/
pipeline_ovis_image.py:330-480, longcat_image/pipeline_longcat_image.py):
2x2-packed latents, flux (0, y, x) image position ids, dynamic mu shift,
standard CFG `neg + g*(pos - neg)` (batched here), flux KL VAE decode
with z / scaling_factor + shift_factor.
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
from vllm_omni_tpu.diffusion.models.common.flux_like import (
    FluxLikeConfig,
    FluxLikeTransformer2DModel,
    flux_image_ids,
    pack_latents,
    unpack_latents,
)
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest
from vllm_omni_tpu.outputs import DiffusionMetrics


class FluxLikePipeline:
    sp_shard_axis = 1  # packed latent token axis (sequence parallel)
    ffn_kind = "swiglu"
    context_norm = True
    transformer_subdir = "transformer"
    # position-id scheme (reference per-arch prepare_pos_ids):
    # Ovis: text [0, i, i], image [0, h, w];
    # LongCat: text [0, i, i], image [1, h+Ltxt, w+Ltxt] (modality ids +
    # text-length offset, pipeline_longcat_image.py:110-142,362,412)
    img_modality = 0
    img_offset_by_txt = False

    @classmethod
    def text_ids(cls, n: int) -> "np.ndarray":
        import numpy as np

        ids = np.zeros((n, 3), np.int32)
        ids[:, 1] = np.arange(n)
        ids[:, 2] = np.arange(n)
        return ids

    @classmethod
    def image_ids(cls, gh: int, gw: int, txt_len: int) -> "np.ndarray":
        ids = flux_image_ids(gh, gw).copy()
        ids[:, 0] = cls.img_modality
        if cls.img_offset_by_txt:
            ids[:, 1] += txt_len
            ids[:, 2] += txt_len
        return ids

    def __init__(
        self,
        od_config: OmniDiffusionConfig,
        transformer_config: Optional[FluxLikeConfig] = None,
        vae_config: Optional[AutoencoderKLConfig] = None,
        scheduler_config: Optional[dict[str, Any]] = None,
        load_weights: bool = True,
        text_encoder=None,
        rng_seed: int = 0,
    ):
        import json
        import os

        self.od_config = od_config
        self.dtype = od_config.dtype
        tf_cfg = transformer_config or FluxLikeConfig(
            ffn=self.ffn_kind, context_norm=self.context_norm)
        v_cfg = vae_config or AutoencoderKLConfig(
            scaling_factor=0.3611, shift_factor=0.1159)
        self.scheduler_config = scheduler_config or {}
        if load_weights and od_config.model:
            def read(sub, name="config.json"):
                fp = os.path.join(od_config.model, sub, name)
                if os.path.isfile(fp):
                    with open(fp) as f:
                        return json.load(f)
                return None

            tc = read(self.transformer_subdir)
            if tc is not None:
                tf_cfg = FluxLikeConfig.from_hf(
                    tc, ffn=self.ffn_kind, context_norm=self.context_norm)
            vc = read("vae")
            if vc is not None:
                v_cfg = AutoencoderKLConfig.from_hf(vc)
            sc = read("scheduler", "scheduler_config.json")
            if sc is not None:
                self.scheduler_config = sc
        self.transformer = FluxLikeTransformer2DModel(tf_cfg, self.dtype)
        self.vae = AutoencoderKL(v_cfg, jnp.float32)
        self.vae_scale_factor = v_cfg.spatial_scale
        self.text_encoder = text_encoder
        if load_weights and od_config.model:
            from vllm_omni_tpu.diffusion.models.sd3.loader import (
                _read_safetensors,
            )

            from vllm_omni_tpu.diffusion.lora import merge_lora_for

            self.params = {
                "transformer": self.transformer.load_from_state_dict(
                    merge_lora_for(_read_safetensors(os.path.join(
                        od_config.model, self.transformer_subdir)),
                        od_config)),
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
        # DP/SP placement hooks (parallel_placement.py), identity when
        # the corresponding parallel size is 1
        self._dp_place = lambda x: x
        self._sp_place = lambda x: x

    def _build_denoise_step(self):
        transformer = self.transformer
        cls = type(self)

        @partial(jax.jit, static_argnames=("do_cfg", "grid", "n_cond"))
        def denoise_step(params, latents, txt, t, sigma, sigma_next,
                         guidance_scale, do_cfg: bool, grid: tuple,
                         cond_latents=None, n_cond: int = 0):
            B = latents.shape[0]
            Ltxt = txt.shape[1]
            n_gen = latents.shape[1]
            img_ids = cls.image_ids(*grid, Ltxt)
            txt_ids = cls.text_ids(Ltxt)
            lat = latents
            if n_cond:
                # edit conditioning: condition latents appended on the
                # sequence, modality id 2, same text offset (reference
                # pipeline_longcat_image_edit.py:430-438,607-616)
                cond_ids = cls.image_ids(*grid, Ltxt)
                cond_ids[:, 0] = 2
                import numpy as np

                img_ids = np.concatenate([img_ids, cond_ids], axis=0)
                lat = jnp.concatenate([latents, cond_latents], axis=1)
            if do_cfg:
                lat_in = jnp.concatenate([lat, lat], axis=0)
                tvec = jnp.full((2 * B,), t, jnp.float32)
                pred = transformer.forward(params, lat_in, txt, tvec,
                                           img_ids, txt_ids)[:, :n_gen]
                pos, neg = pred[:B], pred[B:]
                velocity = neg + guidance_scale * (pos - neg)
            else:
                tvec = jnp.full((B,), t, jnp.float32)
                velocity = transformer.forward(params, lat, txt, tvec,
                                               img_ids, txt_ids)[:, :n_gen]
            return scheduling.step(latents, velocity, sigma, sigma_next)

        return denoise_step

    def prepare_condition(self, req, height, width):
        """Edit subclasses return packed condition latents; None = t2i."""
        return None

    # ------------------------------------------------------------ forward
    def forward(self, req: OmniDiffusionRequest):
        od = self.od_config
        height = req.height or od.default_height
        width = req.width or od.default_width
        s = self.vae_scale_factor * 2
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
        zc = self.vae.cfg.latent_channels
        lat_h = height // self.vae_scale_factor
        lat_w = width // self.vae_scale_factor
        gh, gw = lat_h // 2, lat_w // 2
        seed = req.seed if req.seed is not None else 0
        if req.latents is not None:
            latents = jnp.asarray(req.latents, self.dtype)
            if latents.ndim == 4:
                latents = pack_latents(latents)
        else:
            noise = jax.random.normal(
                jax.random.key(seed), (B, zc, lat_h, lat_w), jnp.float32)
            latents = pack_latents(noise).astype(self.dtype)

        cond_latents = self.prepare_condition(req, height, width)
        n_cond = int(cond_latents.shape[1]) if cond_latents is not None else 0

        sc = self.scheduler_config
        mu = scheduling.calculate_shift(
            gh * gw, sc.get("base_image_seq_len", 256),
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

            txt = jnp.concatenate([pad_to(embeds, Lt), pad_to(neg, Lt)],
                                  axis=0)
        else:
            txt = embeds

        # DP: batch axes shard over the 'data' mesh (reference _DP split)
        latents = self._dp_place(latents)
        txt = self._dp_place(txt)
        if cond_latents is not None:
            cond_latents = self._dp_place(cond_latents)
        latents = self._sp_place(latents)

        t0 = time.perf_counter()
        cache = self.cache_backend
        if cache is not None:
            cache.begin_run(int(sched.num_steps))
        for i in range(sched.num_steps):
            t = sched.timesteps[i] / 1000.0
            if cache is not None and cache.should_skip(
                    i, self.params["transformer"], t, latents):
                latents = cache.apply_skip(latents, sched.sigmas[i],
                                           sched.sigmas[i + 1])
                metrics.steps_skipped += 1
                continue
            prev = latents
            latents = self._denoise_step(
                self.params["transformer"], latents, txt, t,
                sched.sigmas[i], sched.sigmas[i + 1],
                jnp.float32(req.guidance_scale), do_cfg=do_cfg,
                grid=(gh, gw), cond_latents=cond_latents, n_cond=n_cond)
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
        z = unpack_latents(latents, gh, gw).astype(jnp.float32)
        z = z / v.scaling_factor + v.shift_factor
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
