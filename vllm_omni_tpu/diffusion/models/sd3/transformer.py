"""SD3 / SD3.5 MMDiT transformer (functional JAX, scanned blocks).

Behavioral parity with the reference SD3Transformer2DModel (reference
diffusion/models/sd3/sd3_transformer.py:300-471):
- patchified latents + learned/sincos 2D positional embedding with
  `pos_embed_max_size` center-cropping (SD3PatchEmbed / diffusers
  PatchEmbed);
- CombinedTimestepTextProjEmbeddings: sinusoidal(256) -> MLP plus pooled
  text projection MLP, summed;
- joint text-image attention per block, order [text, image], optional
  per-head RMS q/k norm (SD3.5), NO rope;
- AdaLayerNormZero modulation (6*dim), SD3.5 dual-attention blocks
  (SD35AdaLayerNormZeroX, 9*dim, second self-attention on the image
  stream only), last block context_pre_only with AdaLayerNormContinuous
  on the text stream;
- gelu-tanh FFNs; AdaLayerNormContinuous output head + unpatchify.

TPU-first deltas: homogeneous block runs are stacked + lax.scan'ed
(dual-attention prefix / standard middle / final context_pre_only block);
CFG runs batched in one forward (pipeline-level); attention is dense-XLA.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.diffusion.layers import (
    dense_attention,
    gelu_approx,
    layer_norm,
    sinusoidal_timestep_embedding,
)
from vllm_omni_tpu.models.layers import linear, rms_norm


@dataclass
class SD3TransformerConfig:
    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    dual_attention_layers: tuple[int, ...] = ()
    qk_norm: Optional[str] = None  # "rms_norm" on SD3.5
    eps: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "SD3TransformerConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys and v is not None}
        if "dual_attention_layers" in kw:
            kw["dual_attention_layers"] = tuple(kw["dual_attention_layers"])
        return cls(**kw)


def sincos_pos_embed_2d(dim: int, h: int, w: int) -> np.ndarray:
    """diffusers get_2d_sincos_pos_embed: grid (w fastest), per-axis
    sin/cos halves, concat [h-emb, w-emb] -> [h*w, dim]."""
    def axis(pos, d):
        omega = 1.0 / (10000 ** (np.arange(d // 2, dtype=np.float64) /
                                 (d // 2)))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(h, dtype=np.float64)
    grid_w = np.arange(w, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)  # w first, like diffusers
    emb_h = axis(np.asarray(grid[1]), dim // 2)
    emb_w = axis(np.asarray(grid[0]), dim // 2)
    return np.concatenate([emb_h, emb_w], axis=1)  # [h*w, dim]


class SD3Transformer2DModel:
    def __init__(self, config: SD3TransformerConfig, dtype=jnp.bfloat16):
        self.cfg = config
        self.dtype = dtype
        dual = sorted(config.dual_attention_layers)
        if dual != list(range(len(dual))):
            raise ValueError(
                "dual_attention_layers must be a contiguous prefix "
                f"(got {config.dual_attention_layers})")
        self.n_dual = len(dual)
        # last block is context_pre_only; the middle are standard blocks
        self.n_std = config.num_layers - self.n_dual - 1
        if self.n_std < 0:
            raise ValueError("num_layers too small for dual prefix + final")

    # ------------------------------------------------------------- params
    def _block_init(self, k, n: int, dual: bool, last: bool):
        c, dt = self.cfg, self.dtype
        dim, hd = c.inner_dim, c.attention_head_dim
        ks = iter(jax.random.split(k, 24))

        def w(*shape, scale=0.02):
            # direct-dtype generation (no f32 stacked transient)
            return jax.random.normal(next(ks), shape, dt) * scale

        def lin(i, o):
            if n == 0:
                return {"w": w(i, o), "b": jnp.zeros((o,), dt)}
            return {"w": w(n, i, o), "b": jnp.zeros((n, o), dt)}

        def qn(shape):
            return jnp.ones(shape if n == 0 else (n,) + shape, dt)

        p = {
            # AdaLayerNormZero (6*dim) / SD35AdaLayerNormZeroX (9*dim)
            "norm1": lin(dim, (9 if dual else 6) * dim),
            # context norm: AdaLN-zero, or AdaLN-continuous on last block
            "norm1_context": lin(dim, (2 if last else 6) * dim),
            "attn": {
                "to_q": lin(dim, dim), "to_k": lin(dim, dim),
                "to_v": lin(dim, dim),
                "add_q": lin(dim, dim), "add_k": lin(dim, dim),
                "add_v": lin(dim, dim),
                "norm_q": qn((hd,)), "norm_k": qn((hd,)),
                "norm_added_q": qn((hd,)), "norm_added_k": qn((hd,)),
                "to_out": lin(dim, dim),
            },
            "ff": {"fc1": lin(dim, 4 * dim), "fc2": lin(4 * dim, dim)},
        }
        if not last:
            p["attn"]["to_add_out"] = lin(dim, dim)
            p["ff_context"] = {"fc1": lin(dim, 4 * dim),
                               "fc2": lin(4 * dim, dim)}
        if dual:
            p["attn2"] = {
                "to_q": lin(dim, dim), "to_k": lin(dim, dim),
                "to_v": lin(dim, dim),
                "norm_q": qn((hd,)), "norm_k": qn((hd,)),
                "to_out": lin(dim, dim),
            }
        return p

    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        dim = c.inner_dim
        p = c.patch_size
        ks = iter(jax.random.split(rng, 16))

        def w(*shape, scale=0.02):
            # direct-dtype generation (no f32 stacked transient)
            return jax.random.normal(next(ks), shape, dt) * scale

        pos = sincos_pos_embed_2d(
            dim, c.pos_embed_max_size, c.pos_embed_max_size)
        params = {
            "patch_proj": {"w": w(p * p * c.in_channels, dim),
                           "b": jnp.zeros((dim,), dt)},
            "pos_embed": jnp.asarray(pos, jnp.float32),
            "time_embed": {"fc1": {"w": w(256, dim),
                                   "b": jnp.zeros((dim,), dt)},
                           "fc2": {"w": w(dim, dim),
                                   "b": jnp.zeros((dim,), dt)}},
            "text_embed": {"fc1": {"w": w(c.pooled_projection_dim, dim),
                                   "b": jnp.zeros((dim,), dt)},
                           "fc2": {"w": w(dim, dim),
                                   "b": jnp.zeros((dim,), dt)}},
            "context_embedder": {"w": w(c.joint_attention_dim,
                                        c.caption_projection_dim),
                                 "b": jnp.zeros((c.caption_projection_dim,),
                                                dt)},
            "norm_out": {"w": w(dim, 2 * dim), "b": jnp.zeros((2 * dim,), dt)},
            "proj_out": {"w": w(dim, p * p * c.out_channels),
                         "b": jnp.zeros((p * p * c.out_channels,), dt)},
        }
        if self.n_dual:
            params["dual_blocks"] = self._block_init(
                next(ks), self.n_dual, dual=True, last=False)
        if self.n_std:
            params["std_blocks"] = self._block_init(
                next(ks), self.n_std, dual=False, last=False)
        params["last_block"] = self._block_init(
            next(ks), 0, dual=False, last=True)
        return params

    def load_weights(self, path: str, prefix: str = "") -> dict[str, Any]:
        from vllm_omni_tpu.diffusion.models.sd3.loader import (
            load_sd3_transformer_weights,
        )

        return load_sd3_transformer_weights(path, self, prefix=prefix)

    # ------------------------------------------------------------ helpers
    def _crop_pos_embed(self, pos: jax.Array, gh: int, gw: int) -> jax.Array:
        m = self.cfg.pos_embed_max_size
        top = (m - gh) // 2
        left = (m - gw) // 2
        grid = pos.reshape(m, m, -1)[top:top + gh, left:left + gw]
        return grid.reshape(gh * gw, -1)

    @staticmethod
    def _mod(x, chunks, eps):
        """LN (no affine) then shift/scale modulation; f32 math."""
        shift, scale = chunks
        h = layer_norm(x, eps).astype(jnp.float32)
        h = h * (1.0 + scale[:, None, :].astype(jnp.float32)) \
            + shift[:, None, :].astype(jnp.float32)
        return h.astype(x.dtype)

    def _attention(self, a, img, txt, eps, qk_norm):
        """Joint [text, image] attention. txt=None -> image-only (attn2)."""
        c = self.cfg
        B = img.shape[0]
        H, D = c.num_attention_heads, c.attention_head_dim

        def heads(x, pr):
            return linear(x, pr["w"], pr["b"]).reshape(B, -1, H, D)

        q_i = heads(img, a["to_q"])
        k_i = heads(img, a["to_k"])
        v_i = heads(img, a["to_v"])
        if qk_norm:
            q_i = rms_norm(q_i, a["norm_q"], eps)
            k_i = rms_norm(k_i, a["norm_k"], eps)
        if txt is None:
            o = dense_attention(q_i, k_i, v_i)
            o = o.reshape(B, -1, H * D)
            return linear(o, a["to_out"]["w"], a["to_out"]["b"]), None
        Nt = txt.shape[1]
        q_t = heads(txt, a["add_q"])
        k_t = heads(txt, a["add_k"])
        v_t = heads(txt, a["add_v"])
        # the added-stream q/k norms are always present (diffusers
        # norm_added_q/k exist regardless of qk_norm)
        q_t = rms_norm(q_t, a["norm_added_q"], eps)
        k_t = rms_norm(k_t, a["norm_added_k"], eps)
        q = jnp.concatenate([q_t, q_i], axis=1)
        k = jnp.concatenate([k_t, k_i], axis=1)
        v = jnp.concatenate([v_t, v_i], axis=1)
        o = dense_attention(q, k, v).reshape(B, -1, H * D)
        o_t, o_i = o[:, :Nt], o[:, Nt:]
        img_o = linear(o_i, a["to_out"]["w"], a["to_out"]["b"])
        txt_o = (linear(o_t, a["to_add_out"]["w"], a["to_add_out"]["b"])
                 if "to_add_out" in a else None)
        return img_o, txt_o

    def _ff(self, p, x):
        return linear(gelu_approx(linear(x, p["fc1"]["w"], p["fc1"]["b"])),
                      p["fc2"]["w"], p["fc2"]["b"])

    def _block(self, p, img, txt, temb_act, dual: bool, last: bool):
        c = self.cfg
        eps = c.eps
        qk = c.qk_norm == "rms_norm"
        n1 = linear(temb_act, p["norm1"]["w"], p["norm1"]["b"])
        if dual:
            (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
             shift_msa2, scale_msa2, gate_msa2) = jnp.split(n1, 9, axis=-1)
        else:
            (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
             gate_mlp) = jnp.split(n1, 6, axis=-1)
        img_md = self._mod(img, (shift_msa, scale_msa), eps)

        nc = linear(temb_act, p["norm1_context"]["w"],
                    p["norm1_context"]["b"])
        if last:
            # AdaLayerNormContinuous on the context stream
            c_scale, c_shift = jnp.split(nc, 2, axis=-1)
            txt_md = self._mod(txt, (c_shift, c_scale), eps)
        else:
            (c_shift_msa, c_scale_msa, c_gate_msa, c_shift_mlp, c_scale_mlp,
             c_gate_mlp) = jnp.split(nc, 6, axis=-1)
            txt_md = self._mod(txt, (c_shift_msa, c_scale_msa), eps)

        img_attn, txt_attn = self._attention(p["attn"], img_md, txt_md,
                                             eps, qk)
        img = img + gate_msa[:, None, :] * img_attn
        if dual:
            img_md2 = self._mod(img, (shift_msa2, scale_msa2), eps)
            attn2, _ = self._attention(p["attn2"], img_md2, None, eps, qk)
            img = img + gate_msa2[:, None, :] * attn2
        img_md2 = self._mod(img, (shift_mlp, scale_mlp), eps)
        img = img + gate_mlp[:, None, :] * self._ff(p["ff"], img_md2)

        if last:
            return img, None
        txt = txt + c_gate_msa[:, None, :] * txt_attn
        txt_md2 = self._mod(txt, (c_shift_mlp, c_scale_mlp), eps)
        txt = txt + c_gate_mlp[:, None, :] * self._ff(p["ff_context"],
                                                      txt_md2)
        return img, txt

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params: dict[str, Any],
        latents: jax.Array,  # [B, C, H, W]
        encoder_hidden_states: jax.Array,  # [B, Ntxt, joint_attention_dim]
        pooled_projections: jax.Array,  # [B, pooled_projection_dim]
        timestep: jax.Array,  # [B] in train-timestep units (0..1000)
    ) -> jax.Array:
        c = self.cfg
        B, _, Hpx, Wpx = latents.shape
        p = c.patch_size
        gh, gw = Hpx // p, Wpx // p

        # patchify: [B, C, gh, p, gw, p] -> [B, gh*gw, p*p*C]
        x = latents.reshape(B, c.in_channels, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(B, gh * gw,
                                                  p * p * c.in_channels)
        img = linear(x.astype(self.dtype), params["patch_proj"]["w"],
                     params["patch_proj"]["b"])
        pos = self._crop_pos_embed(params["pos_embed"], gh, gw)
        img = (img.astype(jnp.float32) + pos[None]).astype(img.dtype)

        # CombinedTimestepTextProjEmbeddings (timestep in 0..1000 units,
        # no pre-scaling — diffusers Timesteps(256, flip, shift=0))
        tproj = sinusoidal_timestep_embedding(timestep, 256, scale=1.0)
        te = params["time_embed"]
        temb = linear(
            jax.nn.silu(linear(tproj.astype(self.dtype), te["fc1"]["w"],
                               te["fc1"]["b"]).astype(jnp.float32)
                        ).astype(self.dtype),
            te["fc2"]["w"], te["fc2"]["b"])
        pe = params["text_embed"]
        pooled = linear(
            jax.nn.silu(
                linear(pooled_projections.astype(self.dtype), pe["fc1"]["w"],
                       pe["fc1"]["b"]).astype(jnp.float32)).astype(self.dtype),
            pe["fc2"]["w"], pe["fc2"]["b"])
        temb = temb + pooled
        temb_act = jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype)

        txt = linear(encoder_hidden_states.astype(self.dtype),
                     params["context_embedder"]["w"],
                     params["context_embedder"]["b"])

        if self.n_dual:
            def dual_blk(carry, bp):
                i, t = carry
                i, t = self._block(bp, i, t, temb_act, dual=True, last=False)
                return (i, t), None

            (img, txt), _ = jax.lax.scan(
                dual_blk, (img, txt), params["dual_blocks"])
        if self.n_std:
            def std_blk(carry, bp):
                i, t = carry
                i, t = self._block(bp, i, t, temb_act, dual=False, last=False)
                return (i, t), None

            (img, txt), _ = jax.lax.scan(
                std_blk, (img, txt), params["std_blocks"])
        img, _ = self._block(params["last_block"], img, txt, temb_act,
                             dual=False, last=True)

        # AdaLayerNormContinuous output head
        so = linear(temb_act, params["norm_out"]["w"],
                    params["norm_out"]["b"])
        scale, shift = jnp.split(so.astype(jnp.float32), 2, axis=-1)
        out = layer_norm(img, c.eps).astype(jnp.float32)
        out = (out * (1.0 + scale[:, None, :]) + shift[:, None, :]
               ).astype(img.dtype)
        out = linear(out, params["proj_out"]["w"], params["proj_out"]["b"])

        # unpatchify -> [B, out_channels, H, W]
        out = out.reshape(B, gh, gw, p, p, c.out_channels)
        out = jnp.einsum("nhwpqc->nchpwq", out)
        return out.reshape(B, c.out_channels, gh * p, gw * p)
