"""QwenImage MMDiT transformer (functional JAX, scanned dual-stream blocks).

Behavioral parity with the reference QwenImageTransformer2DModel
(reference diffusion/models/qwen_image/qwen_image_transformer.py:609-839):
- packed 2x2 latent patches -> img_in linear (in 64 -> inner 3072 for the
  20B model: 60 layers, 24 heads x 128);
- joint text-image attention per block, order [text, image], q/k RMSNorm,
  3D RoPE (axes 16/56/56, scale_rope centering) on image tokens and
  offset 1D RoPE on text tokens, non-neox rotation;
- AdaLN dual modulation (6*dim per stream from SiLU(temb)), gelu-tanh MLPs,
  AdaLayerNormContinuous output head.

TPU-first deltas: blocks are stacked + lax.scan'ed; CFG runs batched in one
forward (pipeline-level); attention is dense-XLA (flash-fused by Mosaic/XLA
at these sequence lengths).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from vllm_omni_tpu.diffusion.layers import (
    apply_rope_interleaved,
    dense_attention,
    gelu_approx,
    layer_norm,
    modulate,
    rope_3d_freqs,
    rope_text_freqs,
    timestep_embed,
)
from vllm_omni_tpu.models.layers import linear, rms_norm


@dataclass
class QwenImageTransformerConfig:
    patch_size: int = 2
    in_channels: int = 64
    out_channels: int = 16
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584
    axes_dims_rope: tuple[int, int, int] = (16, 56, 56)
    eps: float = 1e-6
    # Layered variant (reference qwen_image_transformer.py:640-690):
    # layer-3D rope (condition segment at frame index -1, text offset also
    # covers the layer count), binary is_rgb timestep conditioning, and
    # zero-timestep modulation for condition tokens.
    use_layer3d_rope: bool = False
    use_additional_t_cond: bool = False
    zero_cond_t: bool = False

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "QwenImageTransformerConfig":
        keys = {
            "patch_size", "in_channels", "out_channels", "num_layers",
            "attention_head_dim", "num_attention_heads", "joint_attention_dim",
            "use_layer3d_rope", "use_additional_t_cond", "zero_cond_t",
        }
        kwargs = {k: v for k, v in d.items() if k in keys and v is not None}
        if "axes_dims_rope" in d:
            kwargs["axes_dims_rope"] = tuple(d["axes_dims_rope"])
        return cls(**kwargs)


class QwenImageTransformer2DModel:
    # Intra-model pipeline parallelism (parallel/pipeline.py): set by
    # setup_parallel_placement when pipeline_parallel_size > 1. The
    # stacked blocks run GPipe-scheduled over the "pipe" mesh axis
    # instead of a single-device lax.scan.
    pp_mesh = None
    pp_microbatches = None  # None -> one microbatch per batch row

    def __init__(self, config: QwenImageTransformerConfig, dtype=jnp.bfloat16):
        self.cfg = config
        self.dtype = dtype

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        dim, L = c.inner_dim, c.num_layers
        hd = c.attention_head_dim
        k = iter(jax.random.split(rng, 40))

        def w(shape, scale=0.02):
            # direct-dtype generation: an f32 stacked intermediate is a
            # multi-GB transient at real scale (see wan2_2/transformer.py)
            return jax.random.normal(next(k), shape, dt) * scale

        def lin(i, o, layers=True):
            if layers:
                return {"w": w((L, i, o)), "b": jnp.zeros((L, o), dt)}
            return {"w": w((i, o)), "b": jnp.zeros((o,), dt)}

        blocks = {
            "img_mod": lin(dim, 6 * dim),
            "txt_mod": lin(dim, 6 * dim),
            "attn": {
                "to_q": lin(dim, dim),
                "to_k": lin(dim, dim),
                "to_v": lin(dim, dim),
                "add_q": lin(dim, dim),
                "add_k": lin(dim, dim),
                "add_v": lin(dim, dim),
                "norm_q": jnp.ones((L, hd), dt),
                "norm_k": jnp.ones((L, hd), dt),
                "norm_added_q": jnp.ones((L, hd), dt),
                "norm_added_k": jnp.ones((L, hd), dt),
                "to_out": lin(dim, dim),
                "to_add_out": lin(dim, dim),
            },
            "img_mlp": {"fc1": lin(dim, 4 * dim), "fc2": lin(4 * dim, dim)},
            "txt_mlp": {"fc1": lin(dim, 4 * dim), "fc2": lin(4 * dim, dim)},
        }
        params = {
            "img_in": lin(c.in_channels, dim, layers=False),
            "txt_norm": jnp.ones((c.joint_attention_dim,), dt),
            "txt_in": lin(c.joint_attention_dim, dim, layers=False),
            "time_embed": {
                "mlp1": lin(256, dim, layers=False),
                "mlp2": lin(dim, dim, layers=False),
            },
            "blocks": blocks,
            "norm_out": lin(dim, 2 * dim, layers=False),
            "proj_out": lin(
                dim, c.patch_size * c.patch_size * c.out_channels, layers=False
            ),
        }
        if c.use_additional_t_cond:
            params["addition_t_embedding"] = w((2, dim))
        return params

    def load_weights(self, path: str, prefix: str = "") -> dict[str, Any]:
        from vllm_omni_tpu.diffusion.models.qwen_image.loader import (
            load_qwen_image_transformer_weights,
        )

        return load_qwen_image_transformer_weights(
            path, self.cfg, self.dtype, prefix=prefix
        )

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params: dict[str, Any],
        img: jax.Array,  # [B, Nimg, in_channels] packed latents
        txt: jax.Array,  # [B, Ntxt, joint_attention_dim]
        timestep: jax.Array,  # [B] (already divided by 1000)
        img_shape: tuple,  # (f, H//2, W//2) or tuple of such segments
        txt_mask: Optional[jax.Array] = None,  # [B, Ntxt] bool
        additional_t_cond: Optional[jax.Array] = None,  # [B] int (is_rgb)
    ) -> jax.Array:
        c = self.cfg
        B, Nimg, _ = img.shape
        Ntxt = txt.shape[1]
        H = c.num_attention_heads
        D = c.attention_head_dim
        eps = c.eps
        # multi-segment streams (edit conditioning / layered generation):
        # img_shape may be a tuple of (f, gh, gw) patch grids concatenated
        # on the token axis; rope frame offsets follow QwenEmbedRope
        # (segment index) or QwenEmbedLayer3DRope (condition at -1)
        # semantics (reference qwen_image_transformer.py:101-177,222-300).
        shapes = (img_shape if isinstance(img_shape[0], (tuple, list))
                  else (img_shape,))
        n_seg = len(shapes)

        temb = timestep_embed(params["time_embed"], timestep, c.inner_dim)
        if c.use_additional_t_cond:
            if additional_t_cond is None:
                raise ValueError("model requires additional_t_cond (is_rgb)")
            temb = temb + params["addition_t_embedding"][
                jnp.asarray(additional_t_cond, jnp.int32)]
        temb_act = jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype)
        # zero_cond_t: every segment after the FIRST is modulated with
        # the t=0 embedding — including the extra generated layer frames
        # in layered mode; this mirrors the reference exactly
        # (qwen_image_transformer.py:750-752 builds the condition
        # indicator as [0]*prod(sample[0]) + [1]*rest)
        temb0_act = None
        n_first = Nimg
        if c.zero_cond_t and n_seg > 1:
            temb0 = timestep_embed(
                params["time_embed"], jnp.zeros_like(timestep), c.inner_dim)
            if c.use_additional_t_cond:
                temb0 = temb0 + params["addition_t_embedding"][
                    jnp.asarray(additional_t_cond, jnp.int32)]
            temb0_act = jax.nn.silu(
                temb0.astype(jnp.float32)).astype(temb0.dtype)
            f0, gh0, gw0 = shapes[0]
            n_first = f0 * gh0 * gw0

        img_h = linear(img, params["img_in"]["w"], params["img_in"]["b"])
        txt_n = rms_norm(txt, params["txt_norm"], eps)
        txt_h = linear(txt_n, params["txt_in"]["w"], params["txt_in"]["b"])

        segs = []
        max_vid = 0
        for i, s in enumerate(shapes):
            f, gh, gw = s
            if c.use_layer3d_rope and n_seg > 1 and i == n_seg - 1:
                off = -1  # condition image segment
            else:
                off = i
            segs.append(rope_3d_freqs(
                f, gh, gw, c.axes_dims_rope, frame_offset=off))
            max_vid = max(max_vid, gh // 2, gw // 2)
        img_angles = jnp.concatenate(segs, axis=0)
        if c.use_layer3d_rope:
            max_vid = max(max_vid, n_seg - 1)
        txt_angles = rope_text_freqs(
            Ntxt, D // 2, c.axes_dims_rope, start=max_vid
        )

        attn_mask = None
        if txt_mask is not None:
            # joint order [txt, img]: mask padded text keys for all queries
            key_mask = jnp.concatenate(
                [txt_mask, jnp.ones((B, Nimg), bool)], axis=1
            )
            attn_mask = key_mask[:, None, :]  # [B, 1, Ltot]

        def mod_img(x, mod_t, mod_0):
            """Modulate image tokens; with zero_cond_t, condition tokens
            (after n_first) take the t=0 modulation."""
            out_t, gate_t = modulate(x, mod_t, eps)
            if mod_0 is None:
                return out_t, gate_t
            out_0, gate_0 = modulate(x, mod_0, eps)
            out = jnp.concatenate(
                [out_t[:, :n_first], out_0[:, n_first:]], axis=1)
            gate = (gate_t, gate_0)  # applied per segment by caller
            return out, gate

        def gate_apply(gate, y):
            if not isinstance(gate, tuple):
                return gate * y
            gate_t, gate_0 = gate
            return jnp.concatenate(
                [gate_t * y[:, :n_first], gate_0 * y[:, n_first:]], axis=1)

        def block(carry, p):
            # carry is a dict so the same block body runs under lax.scan
            # AND GPipe-microbatched under shard_map (parallel/pipeline.py)
            # — conditioning (temb/mask) rides in the carry because a
            # microbatch sees only its own batch rows
            img_h, txt_h = carry["img"], carry["txt"]
            c_temb = carry["temb"]
            c_temb0 = carry.get("temb0")
            c_mask = carry.get("mask")
            Bmb = img_h.shape[0]
            a = p["attn"]
            img_mod = linear(c_temb, p["img_mod"]["w"], p["img_mod"]["b"])
            txt_mod = linear(c_temb, p["txt_mod"]["w"], p["txt_mod"]["b"])
            img_mod1, img_mod2 = jnp.split(img_mod, 2, axis=-1)
            txt_mod1, txt_mod2 = jnp.split(txt_mod, 2, axis=-1)
            img_mod1_0 = img_mod2_0 = None
            if c_temb0 is not None:
                img_mod_0 = linear(
                    c_temb0, p["img_mod"]["w"], p["img_mod"]["b"])
                img_mod1_0, img_mod2_0 = jnp.split(img_mod_0, 2, axis=-1)

            img_md, img_gate1 = mod_img(img_h, img_mod1, img_mod1_0)
            txt_md, txt_gate1 = modulate(txt_h, txt_mod1, eps)

            def heads(x, pr):
                return linear(x, pr["w"], pr["b"]).reshape(Bmb, -1, H, D)

            q_i = rms_norm(heads(img_md, a["to_q"]), a["norm_q"], eps)
            k_i = rms_norm(heads(img_md, a["to_k"]), a["norm_k"], eps)
            v_i = heads(img_md, a["to_v"])
            q_t = rms_norm(heads(txt_md, a["add_q"]), a["norm_added_q"], eps)
            k_t = rms_norm(heads(txt_md, a["add_k"]), a["norm_added_k"], eps)
            v_t = heads(txt_md, a["add_v"])

            q_i = apply_rope_interleaved(q_i, img_angles)
            k_i = apply_rope_interleaved(k_i, img_angles)
            q_t = apply_rope_interleaved(q_t, txt_angles)
            k_t = apply_rope_interleaved(k_t, txt_angles)

            # joint attention, order [text, image]
            q = jnp.concatenate([q_t, q_i], axis=1)
            kk = jnp.concatenate([k_t, k_i], axis=1)
            vv = jnp.concatenate([v_t, v_i], axis=1)
            o = dense_attention(q, kk, vv, mask=c_mask)
            o = o.reshape(Bmb, Ntxt + Nimg, H * D)
            o_t, o_i = o[:, :Ntxt], o[:, Ntxt:]
            img_attn = linear(o_i, a["to_out"]["w"], a["to_out"]["b"])
            txt_attn = linear(o_t, a["to_add_out"]["w"], a["to_add_out"]["b"])

            img_h = img_h + gate_apply(img_gate1, img_attn)
            txt_h = txt_h + txt_gate1 * txt_attn

            img_md2, img_gate2 = mod_img(img_h, img_mod2, img_mod2_0)
            mlp = p["img_mlp"]
            img_mlp = linear(
                gelu_approx(linear(img_md2, mlp["fc1"]["w"], mlp["fc1"]["b"])),
                mlp["fc2"]["w"], mlp["fc2"]["b"],
            )
            img_h = img_h + gate_apply(img_gate2, img_mlp)

            txt_md2, txt_gate2 = modulate(txt_h, txt_mod2, eps)
            mlp = p["txt_mlp"]
            txt_mlp = linear(
                gelu_approx(linear(txt_md2, mlp["fc1"]["w"], mlp["fc1"]["b"])),
                mlp["fc2"]["w"], mlp["fc2"]["b"],
            )
            txt_h = txt_h + txt_gate2 * txt_mlp
            return dict(carry, img=img_h, txt=txt_h)

        carry = {"img": img_h, "txt": txt_h, "temb": temb_act}
        if temb0_act is not None:
            carry["temb0"] = temb0_act
        if attn_mask is not None:
            carry["mask"] = attn_mask
        if self.pp_mesh is not None:
            from vllm_omni_tpu.parallel.pipeline import pipeline_blocks

            carry = pipeline_blocks(
                block, params["blocks"], carry, self.pp_mesh,
                self.pp_microbatches or B)
        else:
            carry, _ = jax.lax.scan(
                lambda c, p: (block(c, p), None), carry, params["blocks"])
        img_h, txt_h = carry["img"], carry["txt"]

        # AdaLayerNormContinuous: scale, shift = chunk(linear(silu(temb)))
        so = linear(temb_act, params["norm_out"]["w"], params["norm_out"]["b"])
        scale, shift = jnp.split(so.astype(jnp.float32), 2, axis=-1)
        out = layer_norm(img_h, eps).astype(jnp.float32)
        out = out * (1.0 + scale[:, None, :]) + shift[:, None, :]
        out = out.astype(img_h.dtype)
        return linear(out, params["proj_out"]["w"], params["proj_out"]["b"])
