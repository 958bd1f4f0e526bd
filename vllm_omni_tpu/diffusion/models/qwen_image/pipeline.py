"""QwenImage text-to-image / image-edit pipelines (JAX).

Behavioral parity with the reference pipeline_qwen_image.py:
- prompt encoding via a Qwen2.5-VL text tower with chat template and
  template-token drop (reference :357-433);
- 2x2 latent packing (:435-457), resolution-shifted flow-match timesteps
  (:492-508), true-CFG combine with norm rescale (:580-583);
- VAE decode with per-channel latents mean/std (:736-747).

TPU-first deltas: CFG runs batched (cond+uncond in one forward, one jit)
instead of two sequential forwards; the denoise step (transformer + CFG +
scheduler update) is one jitted function reused across steps; TeaCache
skip decisions happen host-side between steps.
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
from vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
    QwenImageTransformer2DModel,
    QwenImageTransformerConfig,
)
from vllm_omni_tpu.diffusion.models.qwen_image.vae import (
    AutoencoderKLQwenImage,
    QwenImageVAEConfig,
)
from vllm_omni_tpu.diffusion.request import OmniDiffusionRequest
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.outputs import DiffusionMetrics

logger = init_logger(__name__)

# Qwen-Image magic prompt template (behavioral parity with the reference's
# template-drop encoding, pipeline_qwen_image.py:357-396).
PROMPT_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, shape, "
    "size, texture, quantity, text, spatial relationships of the objects and "
    "background:<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
    "<|im_start|>assistant\n"
)
PROMPT_TEMPLATE_DROP = 34  # tokens of template prefix dropped from hiddens


def pack_latents(latents: jax.Array) -> jax.Array:
    """[B, C, 1, H, W] -> [B, (H/2)*(W/2), C*4] (2x2 patches).

    Parity: _pack_latents (reference pipeline_qwen_image.py:435-441)."""
    B, C, _, H, W = latents.shape
    x = latents[:, :, 0].reshape(B, C, H // 2, 2, W // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(B, (H // 2) * (W // 2), C * 4)


def unpack_latents(packed: jax.Array, grid_h: int, grid_w: int) -> jax.Array:
    """[B, N, C*4] -> [B, C, 1, 2*grid_h, 2*grid_w]."""
    B, N, C4 = packed.shape
    C = C4 // 4
    x = packed.reshape(B, grid_h, grid_w, C, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(B, C, 1, grid_h * 2, grid_w * 2)


class QwenImagePipeline:
    """Offline t2i pipeline. Weights may be loaded from a diffusers dir or
    randomly initialized (tests)."""

    sp_shard_axis = 1  # packed latent token axis (sequence parallel)

    def __init__(
        self,
        od_config: OmniDiffusionConfig,
        transformer_config: Optional[QwenImageTransformerConfig] = None,
        vae_config: Optional[QwenImageVAEConfig] = None,
        load_weights: bool = True,
        text_encoder=None,  # callable(prompts) -> (embeds, mask) or None
        rng_seed: int = 0,
    ):
        self.od_config = od_config
        self.dtype = od_config.dtype
        tf_cfg = transformer_config or self._subfolder_config(
            od_config.model, "transformer", QwenImageTransformerConfig)
        v_cfg = vae_config or self._subfolder_config(
            od_config.model, "vae", QwenImageVAEConfig)
        self.transformer = QwenImageTransformer2DModel(tf_cfg, self.dtype)
        self.vae = AutoencoderKLQwenImage(
            v_cfg, getattr(od_config, 'vae_dtype', jnp.float32))
        # spatial compression = one 2x downsample per non-final stage
        self.vae_scale_factor = 2 ** (len(v_cfg.dim_mult) - 1)
        self.text_encoder = text_encoder
        from vllm_omni_tpu.diffusion.offload import (
            apply_offload_policy,
            init_device_for,
        )

        with init_device_for(od_config):
            if load_weights and od_config.model:
                self.params = {
                    "transformer": self.transformer.load_weights(
                        od_config.model),
                    "vae": self._load_vae_weights(od_config.model),
                }
            else:
                k1, k2 = jax.random.split(jax.random.key(rng_seed))
                self.params = {
                    "transformer": self.transformer.init_params(k1),
                    "vae": self.vae.init_params(k2),
                }
        self.params = apply_offload_policy(self.params, od_config)
        self._denoise_step = self._build_denoise_step()
        self._decode = jax.jit(self.vae.decode)
        # cache backend hook (TeaCache-style), set by the engine
        self.cache_backend = None
        # DP/SP placement hooks (parallel_placement.py), identity when
        # the corresponding parallel size is 1
        self._dp_place = lambda x: x
        self._sp_place = lambda x: x

    @staticmethod
    def _subfolder_config(model_dir: str, sub: str, cfg_cls):
        """Read a diffusers component config.json from the checkpoint
        (reference DiffusersPipelineLoader reads component subfolder
        configs, model_loader/diffusers_loader.py:36-228)."""
        import json
        import os

        p = os.path.join(model_dir or "", sub, "config.json")
        if model_dir and os.path.isfile(p):
            with open(p) as f:
                return cfg_cls.from_hf(json.load(f))
        return cfg_cls()

    def _load_vae_weights(self, path: str):
        from vllm_omni_tpu.diffusion.models.qwen_image.loader import (
            load_qwen_image_vae_weights,
        )

        return load_qwen_image_vae_weights(path, self.vae.cfg,
                                          self.vae.dtype)

    # ----------------------------------------------------------- prompts
    def encode_prompt(self, prompts: list[str]):
        if self.text_encoder is None:
            raise ValueError(
                "no text encoder attached; pass prompt_embeds explicitly"
            )
        return self.text_encoder(
            [PROMPT_TEMPLATE.format(p) for p in prompts],
            drop_prefix=PROMPT_TEMPLATE_DROP,
        )

    # ------------------------------------------------------------- steps
    def _build_denoise_step(self):
        transformer = self.transformer

        @partial(jax.jit, static_argnames=("img_shape", "do_cfg", "cfg_normalize"))
        def denoise_step(
            params,
            latents,  # [B, N, C4]
            txt,  # [2B or B, Ntxt, joint]
            txt_mask,
            t,  # scalar f32 (timestep / 1000)
            sigma,
            sigma_next,
            true_cfg_scale,
            img_shape: tuple,
            do_cfg: bool,
            cfg_normalize: bool,
        ):
            B = latents.shape[0]
            if do_cfg:
                # batched CFG: [cond, uncond] stacked on batch
                lat_in = jnp.concatenate([latents, latents], axis=0)
                tvec = jnp.full((2 * B,), t, latents.dtype)
                pred = transformer.forward(
                    params, lat_in, txt, tvec, img_shape, txt_mask
                )
                pos, neg = pred[:B], pred[B:]
                comb = neg + true_cfg_scale * (pos - neg)
                if cfg_normalize:
                    cond_norm = jnp.linalg.norm(
                        pos.astype(jnp.float32), axis=-1, keepdims=True)
                    comb_norm = jnp.linalg.norm(
                        comb.astype(jnp.float32), axis=-1, keepdims=True)
                    comb = (comb.astype(jnp.float32)
                            * (cond_norm / jnp.maximum(comb_norm, 1e-8))
                            ).astype(pred.dtype)
                velocity = comb
            else:
                tvec = jnp.full((B,), t, latents.dtype)
                velocity = transformer.forward(
                    params, latents, txt, tvec, img_shape, txt_mask
                )
            return scheduling.step(latents, velocity, sigma, sigma_next)

        return denoise_step

    # ------------------------------------------------------------ forward
    def forward(self, req: OmniDiffusionRequest):
        c = self.transformer.cfg
        od = self.od_config
        height = req.height or od.default_height
        width = req.width or od.default_width
        metrics = DiffusionMetrics()
        t_start = time.perf_counter()

        # ---- prompt embeds
        t0 = time.perf_counter()
        if req.prompt_embeds is None:
            prompts = req.prompt if isinstance(req.prompt, list) else [req.prompt]
            req.prompt_embeds, req.prompt_embeds_mask = self.encode_prompt(prompts)
        do_cfg = req.true_cfg_scale > 1.0
        if do_cfg and req.negative_prompt_embeds is None:
            if self.text_encoder is None:
                do_cfg = False
            else:
                negs = (req.negative_prompt
                        if isinstance(req.negative_prompt, list)
                        else [req.negative_prompt or ""])
                (req.negative_prompt_embeds,
                 req.negative_prompt_embeds_mask) = self.encode_prompt(negs)
        metrics.encode_latency = time.perf_counter() - t0

        embeds = jnp.asarray(req.prompt_embeds, self.dtype)
        B = embeds.shape[0]
        mask = (jnp.asarray(req.prompt_embeds_mask, bool)
                if req.prompt_embeds_mask is not None
                else jnp.ones(embeds.shape[:2], bool))

        # ---- latents
        grid_h = 2 * (height // (self.vae_scale_factor * 2)) // 2
        grid_w = 2 * (width // (self.vae_scale_factor * 2)) // 2
        zc = self.vae.cfg.z_dim
        seed = req.seed if req.seed is not None else 0
        if req.latents is not None:
            latents = jnp.asarray(req.latents, self.dtype)
        else:
            noise = jax.random.normal(
                jax.random.key(seed),
                (B, zc, 1, grid_h * 2, grid_w * 2), jnp.float32,
            ).astype(self.dtype)
            latents = pack_latents(noise)
        img_shape = (1, grid_h, grid_w)
        image_seq_len = latents.shape[1]

        # ---- timesteps
        mu = scheduling.calculate_shift(image_seq_len)
        sched = scheduling.set_timesteps(
            req.num_inference_steps, mu=mu, sigmas=req.sigmas
        )

        # ---- text stream for batched CFG
        if do_cfg:
            neg = jnp.asarray(req.negative_prompt_embeds, self.dtype)
            neg_mask = (jnp.asarray(req.negative_prompt_embeds_mask, bool)
                        if req.negative_prompt_embeds_mask is not None
                        else jnp.ones(neg.shape[:2], bool))
            # pad text streams to a common length
            Lt = max(embeds.shape[1], neg.shape[1])

            def pad_to(x, m, L):
                padn = L - x.shape[1]
                if padn:
                    x = jnp.pad(x, ((0, 0), (0, padn), (0, 0)))
                    m = jnp.pad(m, ((0, 0), (0, padn)))
                return x, m

            embeds_p, mask_p = pad_to(embeds, mask, Lt)
            neg_p, neg_mask_p = pad_to(neg, neg_mask, Lt)
            txt = jnp.concatenate([embeds_p, neg_p], axis=0)
            txt_mask = jnp.concatenate([mask_p, neg_mask_p], axis=0)
        else:
            txt, txt_mask = embeds, mask

        # DP: shard the batch axes over the 'data' mesh (reference _DP
        # batch split, parallel_state.py:661-668) — GSPMD partitions the
        # jitted denoise step from these input shardings
        latents = self._dp_place(latents)
        txt = self._dp_place(txt)
        txt_mask = self._dp_place(txt_mask)
        # SP: latent token axis shards over 'seq' (USP GSPMD mapping)
        latents = self._sp_place(latents)

        # ---- denoise loop (host loop over jitted steps; TeaCache-style
        # skip decisions slot in here)
        t0 = time.perf_counter()
        cache = self.cache_backend
        if cache is not None:
            cache.begin_run(int(sched.num_steps))
        for i in range(sched.num_steps):
            t = sched.timesteps[i] / 1000.0
            if cache is not None and cache.should_skip(
                i, self.params["transformer"], t, latents
            ):
                latents = cache.apply_skip(latents, sched.sigmas[i],
                                           sched.sigmas[i + 1])
                metrics.steps_skipped += 1
                continue
            prev = latents
            latents = self._denoise_step(
                self.params["transformer"], latents, txt, txt_mask,
                t, sched.sigmas[i], sched.sigmas[i + 1],
                jnp.float32(req.true_cfg_scale),
                img_shape=img_shape, do_cfg=do_cfg,
                cfg_normalize=req.cfg_normalize,
            )
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

        # ---- VAE decode with latents mean/std un-normalization
        t0 = time.perf_counter()
        z = unpack_latents(latents, grid_h, grid_w).astype(
            self.vae.dtype)
        vcfg = self.vae.cfg
        if vcfg.latents_mean is not None:
            mean = jnp.asarray(vcfg.latents_mean, self.vae.dtype).reshape(
                1, vcfg.z_dim, 1, 1, 1)
            std = jnp.asarray(vcfg.latents_std, self.vae.dtype).reshape(
                1, vcfg.z_dim, 1, 1, 1)
            z = z * std + mean
        image = self._decode(self.params["vae"], z)  # [B,3,1,H,W]
        image = jax.block_until_ready(image)[:, :, 0]
        metrics.vae_latency = time.perf_counter() - t0
        metrics.e2e_latency = time.perf_counter() - t_start
        return image, metrics


class QwenImageEditPipeline(QwenImagePipeline):
    """i2i editing: input image -> VAE-encode -> condition latents appended
    to the image stream (reference pipeline_qwen_image_edit.py pattern).
    Round 1: encode path + strength-based partial denoise."""

    def forward(self, req: OmniDiffusionRequest):
        if req.image is not None and req.latents is None and req.strength < 1.0:
            img = jnp.asarray(req.image, jnp.float32)  # [B,3,H,W] in [-1,1]
            z = self.vae.encode(self.params["vae"], img[:, :, None])
            vcfg = self.vae.cfg
            if vcfg.latents_mean is not None:
                mean = jnp.asarray(vcfg.latents_mean, jnp.float32).reshape(
                    1, vcfg.z_dim, 1, 1, 1)
                std = jnp.asarray(vcfg.latents_std, jnp.float32).reshape(
                    1, vcfg.z_dim, 1, 1, 1)
                z = (z - mean) / std
            packed = pack_latents(z.astype(self.dtype))
            seed = req.seed if req.seed is not None else 0
            noise = jax.random.normal(
                jax.random.key(seed), packed.shape, jnp.float32
            ).astype(self.dtype)
            sigma0 = jnp.float32(req.strength)
            req.latents = scheduling.add_noise(packed, noise, sigma0)
        return super().forward(req)


class QwenImageEditPlusPipeline(QwenImageEditPipeline):
    pass


def calculate_dimensions(target_area: int, ratio: float) -> tuple[int, int]:
    """(width, height) with ~target_area pixels at the given aspect ratio,
    rounded to multiples of 32 (reference
    pipeline_qwen_image_layered.py:109-117)."""
    import math

    width = math.sqrt(target_area * ratio)
    height = width / ratio
    return round(width / 32) * 32, round(height / 32) * 32


class QwenImageLayeredPipeline(QwenImagePipeline):
    """Image -> `layers` decomposed image layers (RGBA stack).

    Parity: QwenImageLayeredPipeline (reference
    pipeline_qwen_image_layered.py:168-881): the conditioning image is
    VAE-encoded and appended to the token stream; the generated stream
    holds layers+1 same-sized frames under layer-3D RoPE (condition at
    frame index -1); is_rgb=0 rides the timestep embedding
    (additional_t_cond); timestep shift uses the CONDITION sequence
    length; decode drops the first generated frame (the composite).

    TPU-first: batched CFG in one forward, one jitted denoise step.
    """

    def _build_denoise_step(self):
        transformer = self.transformer

        @partial(jax.jit, static_argnames=(
            "img_shape", "do_cfg", "cfg_normalize", "n_gen"))
        def denoise_step(
            params, latents, cond_latents, txt, txt_mask, t, sigma,
            sigma_next, true_cfg_scale, img_shape: tuple, do_cfg: bool,
            cfg_normalize: bool, n_gen: int,
        ):
            B = latents.shape[0]
            lat_cond = jnp.concatenate([latents, cond_latents], axis=1)
            if do_cfg:
                lat_in = jnp.concatenate([lat_cond, lat_cond], axis=0)
                tvec = jnp.full((2 * B,), t, latents.dtype)
                is_rgb = jnp.zeros((2 * B,), jnp.int32)
                pred = transformer.forward(
                    params, lat_in, txt, tvec, img_shape, txt_mask,
                    additional_t_cond=is_rgb,
                )[:, :n_gen]
                pos, neg = pred[:B], pred[B:]
                comb = neg + true_cfg_scale * (pos - neg)
                if cfg_normalize:
                    cond_norm = jnp.linalg.norm(
                        pos.astype(jnp.float32), axis=-1, keepdims=True)
                    comb_norm = jnp.linalg.norm(
                        comb.astype(jnp.float32), axis=-1, keepdims=True)
                    comb = (comb.astype(jnp.float32)
                            * (cond_norm / jnp.maximum(comb_norm, 1e-8))
                            ).astype(pred.dtype)
                velocity = comb
            else:
                tvec = jnp.full((B,), t, latents.dtype)
                is_rgb = jnp.zeros((B,), jnp.int32)
                velocity = transformer.forward(
                    params, lat_cond, txt, tvec, img_shape, txt_mask,
                    additional_t_cond=is_rgb,
                )[:, :n_gen]
            return scheduling.step(latents, velocity, sigma, sigma_next)

        return denoise_step

    def _encode_cond_image(self, img: jax.Array) -> jax.Array:
        """[B, 3, H, W] in [-1, 1] -> packed normalized latents."""
        z = self.vae.encode(self.params["vae"], img[:, :, None])
        vcfg = self.vae.cfg
        if vcfg.latents_mean is not None:
            mean = jnp.asarray(vcfg.latents_mean, self.vae.dtype).reshape(
                1, vcfg.z_dim, 1, 1, 1)
            std = jnp.asarray(vcfg.latents_std, self.vae.dtype).reshape(
                1, vcfg.z_dim, 1, 1, 1)
            z = (z - mean) / std
        return pack_latents(z.astype(self.dtype))

    def forward(self, req: OmniDiffusionRequest):
        metrics = DiffusionMetrics()
        t_start = time.perf_counter()
        layers = req.layers if req.layers is not None else 4
        resolution = req.resolution if req.resolution is not None else 640
        if resolution not in (640, 1024):
            # the reference asserts 640/1024 (checkpoint-supported targets,
            # pipeline_qwen_image_layered.py:75); smaller values are allowed
            # here for scaled-down models/tests
            logger.warning("layered resolution %d outside the reference-"
                           "supported {640, 1024}", resolution)
        if req.image is None:
            raise ValueError("layered decomposition requires an input image")

        img = jnp.asarray(req.image, jnp.float32)  # [B, 3, H, W] in [-1,1]
        B = img.shape[0]
        ch, cw = img.shape[2], img.shape[3]
        calc_w, calc_h = calculate_dimensions(
            resolution * resolution, cw / ch)
        m = self.vae_scale_factor * 2
        height, width = (calc_h // m) * m, (calc_w // m) * m
        if (ch, cw) != (calc_h, calc_w):
            img = jax.image.resize(
                img, (B, 3, calc_h, calc_w), method="bicubic")

        # ---- prompt embeds
        t0 = time.perf_counter()
        if req.prompt_embeds is None:
            prompts = (req.prompt if isinstance(req.prompt, list)
                       else [req.prompt])
            req.prompt_embeds, req.prompt_embeds_mask = self.encode_prompt(
                prompts)
        do_cfg = req.true_cfg_scale > 1.0
        if do_cfg and req.negative_prompt_embeds is None:
            if self.text_encoder is None:
                do_cfg = False
            else:
                negs = (req.negative_prompt
                        if isinstance(req.negative_prompt, list)
                        else [req.negative_prompt or ""])
                (req.negative_prompt_embeds,
                 req.negative_prompt_embeds_mask) = self.encode_prompt(negs)
        metrics.encode_latency = time.perf_counter() - t0
        embeds = jnp.asarray(req.prompt_embeds, self.dtype)
        mask = (jnp.asarray(req.prompt_embeds_mask, bool)
                if req.prompt_embeds_mask is not None
                else jnp.ones(embeds.shape[:2], bool))

        # ---- condition latents + noise latents
        cond_latents = self._encode_cond_image(img)
        zc = self.vae.cfg.z_dim
        gh = height // self.vae_scale_factor // 2
        gw = width // self.vae_scale_factor // 2
        cgh = calc_h // self.vae_scale_factor // 2
        cgw = calc_w // self.vae_scale_factor // 2
        seed = req.seed if req.seed is not None else 0
        if req.latents is not None:
            latents = jnp.asarray(req.latents, self.dtype)
        else:
            noise = jax.random.normal(
                jax.random.key(seed),
                (B, (layers + 1) * zc, 1, gh * 2, gw * 2), jnp.float32,
            )
            # per-layer frames packed contiguously on the token axis
            noise = noise.reshape(B, layers + 1, zc, 1, gh * 2, gw * 2)
            parts = [pack_latents(noise[:, i].astype(self.dtype))
                     for i in range(layers + 1)]
            latents = jnp.concatenate(parts, axis=1)
        n_gen = latents.shape[1]
        img_shape = tuple([(1, gh, gw)] * (layers + 1) + [(1, cgh, cgw)])

        # ---- timesteps: shift keyed to the CONDITION stream length
        # (reference :800-806 uses image_latents.shape[1])
        mu = (cond_latents.shape[1] / (256 * 256 / 16 / 16)) ** 0.5
        sigmas = (req.sigmas if req.sigmas is not None
                  else np.linspace(1.0, 0, req.num_inference_steps + 1)[:-1])
        sched = scheduling.set_timesteps(
            req.num_inference_steps, mu=mu, sigmas=list(sigmas))

        # ---- text stream for batched CFG
        if do_cfg:
            neg = jnp.asarray(req.negative_prompt_embeds, self.dtype)
            neg_mask = (jnp.asarray(req.negative_prompt_embeds_mask, bool)
                        if req.negative_prompt_embeds_mask is not None
                        else jnp.ones(neg.shape[:2], bool))
            Lt = max(embeds.shape[1], neg.shape[1])

            def pad_to(x, m_, L):
                padn = L - x.shape[1]
                if padn:
                    x = jnp.pad(x, ((0, 0), (0, padn), (0, 0)))
                    m_ = jnp.pad(m_, ((0, 0), (0, padn)))
                return x, m_

            embeds_p, mask_p = pad_to(embeds, mask, Lt)
            neg_p, neg_mask_p = pad_to(neg, neg_mask, Lt)
            txt = jnp.concatenate([embeds_p, neg_p], axis=0)
            txt_mask = jnp.concatenate([mask_p, neg_mask_p], axis=0)
        else:
            txt, txt_mask = embeds, mask

        # ---- denoise
        t0 = time.perf_counter()
        for i in range(sched.num_steps):
            t = sched.timesteps[i] / 1000.0
            latents = self._denoise_step(
                self.params["transformer"], latents, cond_latents, txt,
                txt_mask, t, sched.sigmas[i], sched.sigmas[i + 1],
                jnp.float32(req.true_cfg_scale),
                img_shape=img_shape, do_cfg=do_cfg,
                cfg_normalize=req.cfg_normalize, n_gen=n_gen,
            )
        jax.block_until_ready(latents)
        metrics.denoise_latency = time.perf_counter() - t0
        metrics.num_steps = sched.num_steps

        if req.output_type == "latent":
            metrics.e2e_latency = time.perf_counter() - t_start
            return latents, metrics

        # ---- unpack layers+1 frames, drop the composite, decode each
        t0 = time.perf_counter()
        grid = gh * gw
        frames = []
        vcfg = self.vae.cfg
        for i in range(1, layers + 1):  # skip frame 0 (the input)
            z = unpack_latents(
                latents[:, i * grid:(i + 1) * grid], gh, gw
            ).astype(jnp.float32)
            if vcfg.latents_mean is not None:
                mean = jnp.asarray(vcfg.latents_mean, jnp.float32).reshape(
                    1, vcfg.z_dim, 1, 1, 1)
                std = jnp.asarray(vcfg.latents_std, jnp.float32).reshape(
                    1, vcfg.z_dim, 1, 1, 1)
                z = z * std + mean
            frames.append(self._decode(self.params["vae"], z)[:, :, 0])
        image = jax.block_until_ready(jnp.stack(frames, axis=1))
        metrics.vae_latency = time.perf_counter() - t0
        metrics.e2e_latency = time.perf_counter() - t_start
        return image, metrics  # [B, layers, 3, H, W]
