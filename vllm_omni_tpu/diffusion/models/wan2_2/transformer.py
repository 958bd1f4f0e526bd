"""Wan2.1/2.2 video DiT (functional JAX, scanned blocks).

Behavioral parity with the reference WanTransformer3DModel (reference
diffusion/models/wan2_2/wan2_2_transformer.py:49-704):
- 3D patch embedding (Conv3d kernel=stride=patch_size);
- 3D rope with per-axis frequency splits [D-2*(D//3), D//3, D//3] and the
  Wan pair-interleaved rotation (out[0::2]=x1*cos - x2*sin,
  out[1::2]=x1*sin + x2*cos);
- per-block self-attention (full-inner-dim RMS q/k norm) + text
  cross-attention (optional image-prefix KV for I2V) + gelu-tanh FFN,
  with scale_shift_table + 6-way timestep-proj modulation in f32;
- ti2v per-token timesteps: `timestep` may be [B] or [B, S] (temb then
  modulates per token);
- output head: scale_shift_table[2] + temb, FP32 LN, proj, unpatchify.

TPU-first deltas: blocks stacked + lax.scan'ed; CFG batched upstream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.diffusion.layers import (
    gelu_approx,
    layer_norm,
    sinusoidal_timestep_embedding,
)
from vllm_omni_tpu.models.layers import linear


@dataclass
class WanTransformerConfig:
    patch_size: tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 40
    attention_head_dim: int = 128
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    ffn_dim: int = 13824
    num_layers: int = 40
    cross_attn_norm: bool = True
    eps: float = 1e-6
    image_dim: Optional[int] = None
    added_kv_proj_dim: Optional[int] = None
    rope_max_seq_len: int = 1024
    pos_embed_seq_len: Optional[int] = None
    rope_theta: float = 10000.0
    text_len: int = 512  # text context length for the I2V image split

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "WanTransformerConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys and v is not None}
        if "patch_size" in kw:
            kw["patch_size"] = tuple(kw["patch_size"])
        return cls(**kw)


def wan_rope_angles(cfg: WanTransformerConfig, f: int, h: int, w: int):
    """Per-position rope angles [f*h*w, D//2] from the 3-axis split."""
    D = cfg.attention_head_dim
    split = [D - 2 * (D // 3), D // 3, D // 3]

    def axis_freqs(dim, n):
        inv = 1.0 / (cfg.rope_theta ** (
            np.arange(0, dim, 2, dtype=np.float64) / dim))
        return np.outer(np.arange(n, dtype=np.float64), inv)  # [n, dim//2]

    ft = axis_freqs(split[0], f)[:, None, None, :]
    fh = axis_freqs(split[1], h)[None, :, None, :]
    fw = axis_freqs(split[2], w)[None, None, :, :]
    grid = np.concatenate([
        np.broadcast_to(ft, (f, h, w, split[0] // 2)),
        np.broadcast_to(fh, (f, h, w, split[1] // 2)),
        np.broadcast_to(fw, (f, h, w, split[2] // 2)),
    ], axis=-1)
    return jnp.asarray(grid.reshape(f * h * w, D // 2), jnp.float32)


def apply_wan_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """x [B, S, H, D]; pair-interleaved rotation (reference
    apply_rotary_emb_wan, wan2_2_transformer.py:24-46).

    Reference formulation kept for exactness tests: the [..., D//2, 2]
    reshape puts a 2-wide trailing axis in the lane dimension, which
    TPU relayouts. The attention path uses apply_wan_rope_mm (same
    values — rot is a signed permutation; tests assert equality)."""
    B, S, H, D = x.shape
    xf = x.astype(jnp.float32).reshape(B, S, H, D // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(B, S, H, D).astype(x.dtype)


def wan_rope_tables(angles: jax.Array):
    """Interleave-duplicated cos/sin [S, D] + the [D, D] pair-rotation
    matrix for apply_wan_rope_mm. rot moves x[2i] -> out[2i+1] and
    -x[2i+1] -> out[2i] (exact: values are only permuted/negated)."""
    cos = jnp.repeat(jnp.cos(angles), 2, axis=1)
    sin = jnp.repeat(jnp.sin(angles), 2, axis=1)
    D = angles.shape[1] * 2
    rot = np.zeros((D, D), np.float32)
    idx = np.arange(0, D, 2)
    rot[idx + 1, idx] = -1.0
    rot[idx, idx + 1] = 1.0
    return cos, sin, jnp.asarray(rot)


def apply_wan_rope_mm(x: jax.Array, cos: jax.Array, sin: jax.Array,
                      rot: jax.Array) -> jax.Array:
    """Lane-layout-native rope: out = x*cos + (x@rot)*sin.

    The pair swap/negate runs as one tiny [D, D] matmul on the MXU
    (values unchanged — rot is a signed permutation, exact in bf16),
    so no 2-wide trailing-axis relayout ever materializes. Same math
    as apply_wan_rope: out[2i] = x[2i]cos - x[2i+1]sin,
    out[2i+1] = x[2i+1]cos + x[2i]sin, accumulated in f32."""
    xr = jax.lax.dot_general(
        x, rot.astype(x.dtype), (((3,), (0,)), ((), ())))
    out = (x.astype(jnp.float32) * cos[None, :, None, :]
           + xr.astype(jnp.float32) * sin[None, :, None, :])
    return out.astype(x.dtype)


def _rms_full(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """RMSNorm over the full feature dim (Wan q/k norm is NOT per-head)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
            ).astype(x.dtype)


def _fp32_ln(x, eps, gamma=None, beta=None):
    out = layer_norm(x, eps).astype(jnp.float32)
    if gamma is not None:
        out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out


class WanTransformer3DModel:
    # intra-model pipeline parallelism over a "pipe" mesh axis
    # (parallel/pipeline.py), installed by setup_parallel_placement
    pp_mesh = None
    pp_microbatches = None

    def __init__(self, config: WanTransformerConfig, dtype=jnp.bfloat16):
        self.cfg = config
        self.dtype = dtype

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        dim, L = c.inner_dim, c.num_layers
        pt, ph, pw = c.patch_size
        ks = iter(jax.random.split(rng, 48))

        def w(*shape, scale=0.02):
            # generate directly in the model dtype: an f32 stacked-layer
            # intermediate here is a multi-GB HBM transient at real model
            # scale (30L fc1 stack f32 = 5.3 GB) and was the difference
            # between a 5B model initializing or OOMing on v5e-1
            return jax.random.normal(next(ks), shape, dt) * scale

        def lin(i, o, layers=True):
            if layers:
                return {"w": w(L, i, o), "b": jnp.zeros((L, o), dt)}
            return {"w": w(i, o), "b": jnp.zeros((o,), dt)}

        blocks = {
            "scale_shift_table": (jax.random.normal(
                next(ks), (L, 6, dim), jnp.float32) / dim ** 0.5),
            "attn1": {
                "to_q": lin(dim, dim), "to_k": lin(dim, dim),
                "to_v": lin(dim, dim), "to_out": lin(dim, dim),
                "norm_q": jnp.ones((L, dim), dt),
                "norm_k": jnp.ones((L, dim), dt),
            },
            "attn2": {
                "to_q": lin(dim, dim), "to_k": lin(dim, dim),
                "to_v": lin(dim, dim), "to_out": lin(dim, dim),
                "norm_q": jnp.ones((L, dim), dt),
                "norm_k": jnp.ones((L, dim), dt),
            },
            "ffn": {"fc1": lin(dim, c.ffn_dim), "fc2": lin(c.ffn_dim, dim)},
        }
        if c.cross_attn_norm:
            blocks["norm2_g"] = jnp.ones((L, dim), dt)
            blocks["norm2_b"] = jnp.zeros((L, dim), dt)
        if c.added_kv_proj_dim is not None:
            blocks["attn2"]["add_k"] = lin(c.added_kv_proj_dim, dim)
            blocks["attn2"]["add_v"] = lin(c.added_kv_proj_dim, dim)
            blocks["attn2"]["norm_added_k"] = jnp.ones((L, dim), dt)

        params: dict[str, Any] = {
            "patch_proj": {"w": w(pt * ph * pw * c.in_channels, dim),
                           "b": jnp.zeros((dim,), dt)},
            "time_embed": {"fc1": lin(c.freq_dim, dim, layers=False),
                           "fc2": lin(dim, dim, layers=False)},
            "time_proj": lin(dim, 6 * dim, layers=False),
            "text_embed": {"fc1": lin(c.text_dim, dim, layers=False),
                           "fc2": lin(dim, dim, layers=False)},
            "blocks": blocks,
            "head_table": (jax.random.normal(
                next(ks), (1, 2, dim), jnp.float32) / dim ** 0.5),
            "proj_out": lin(dim, c.out_channels * pt * ph * pw,
                            layers=False),
        }
        if c.image_dim is not None:
            img = {
                "norm1_g": jnp.ones((c.image_dim,), dt),
                "norm1_b": jnp.zeros((c.image_dim,), dt),
                "ff_fc1": lin(c.image_dim, c.image_dim, layers=False),
                "ff_fc2": lin(c.image_dim, dim, layers=False),
                "norm2_g": jnp.ones((dim,), dt),
                "norm2_b": jnp.zeros((dim,), dt),
            }
            if c.pos_embed_seq_len:
                img["pos_embed"] = jnp.zeros(
                    (c.pos_embed_seq_len, c.image_dim), dt)
            params["image_embed"] = img
        return params

    def load_weights(self, path: str, subfolder: str = "transformer"):
        from vllm_omni_tpu.diffusion.models.wan2_2.loader import (
            load_wan_transformer_weights,
        )

        return load_wan_transformer_weights(path, self, subfolder)

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params: dict[str, Any],
        latents: jax.Array,  # [B, C, F, H, W]
        timestep: jax.Array,  # [B] or [B, S] in train-timestep units
        encoder_hidden_states: jax.Array,  # [B, Ltxt, text_dim]
        encoder_hidden_states_image: Optional[jax.Array] = None,
    ) -> jax.Array:
        c = self.cfg
        eps = c.eps
        B, C, F, Hpx, Wpx = latents.shape
        pt, ph, pw = c.patch_size
        gf, gh, gw = F // pt, Hpx // ph, Wpx // pw
        S = gf * gh * gw
        dim = c.inner_dim

        # rope tables once per shape; the per-block rotation runs as
        # x*cos + (x@rot)*sin — the pair swap/negate is a tiny [D, D]
        # signed-permutation matmul on the MXU, so the [..., D//2, 2]
        # lane relayout of the reference formulation never materializes
        # (exactness vs apply_wan_rope asserted in tests)
        angles = wan_rope_angles(c, gf, gh, gw)
        rope_cos, rope_sin, rope_rot = wan_rope_tables(angles)

        # 3D patchify: conv(kernel=stride=patch) == reshape + linear
        x = latents.reshape(B, C, gf, pt, gh, ph, gw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            B, S, C * pt * ph * pw)
        h = linear(x.astype(self.dtype), params["patch_proj"]["w"],
                   params["patch_proj"]["b"])

        # condition embeddings
        per_token_t = timestep.ndim == 2
        tflat = timestep.reshape(-1)
        tproj = sinusoidal_timestep_embedding(tflat, c.freq_dim, scale=1.0)
        te = params["time_embed"]
        temb = linear(
            jax.nn.silu(
                linear(tproj.astype(self.dtype), te["fc1"]["w"],
                       te["fc1"]["b"]).astype(jnp.float32)).astype(self.dtype),
            te["fc2"]["w"], te["fc2"]["b"])
        t6 = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(self.dtype),
                    params["time_proj"]["w"], params["time_proj"]["b"])
        if per_token_t:
            temb = temb.reshape(B, -1, dim)
            t6 = t6.reshape(B, -1, 6, dim)  # [B, S, 6, dim]
        else:
            t6 = t6.reshape(B, 6, dim)

        txt = params["text_embed"]
        ctx = linear(
            gelu_approx(linear(encoder_hidden_states.astype(self.dtype),
                               txt["fc1"]["w"], txt["fc1"]["b"])),
            txt["fc2"]["w"], txt["fc2"]["b"])
        if encoder_hidden_states_image is not None:
            ip = params["image_embed"]
            img = encoder_hidden_states_image.astype(self.dtype)
            if "pos_embed" in ip:
                img = img.reshape(B, -1, img.shape[-1]) + ip["pos_embed"]
            ih = _fp32_ln(img, eps, ip["norm1_g"], ip["norm1_b"]
                          ).astype(self.dtype)
            ih = linear(gelu_approx(
                linear(ih, ip["ff_fc1"]["w"], ip["ff_fc1"]["b"])),
                ip["ff_fc2"]["w"], ip["ff_fc2"]["b"])
            ih = _fp32_ln(ih, eps, ip["norm2_g"], ip["norm2_b"]
                          ).astype(self.dtype)
            ctx = jnp.concatenate([ih, ctx], axis=1)
        n_img_ctx = (ctx.shape[1] - c.text_len
                     if c.added_kv_proj_dim is not None else 0)

        def mod(table_row, c_t6):
            """scale_shift_table + t6 -> 6 chunks, f32."""
            if per_token_t:
                m = table_row[None, None] + c_t6.astype(jnp.float32)
                return [m[:, :, j] for j in range(6)]  # each [B, S, dim]
            m = table_row[None] + c_t6.astype(jnp.float32)
            return [m[:, j][:, None, :] for j in range(6)]  # [B, 1, dim]

        def attention(q, k, v):
            from vllm_omni_tpu.diffusion.layers import dense_attention

            o = dense_attention(q, k, v)
            return o.reshape(o.shape[0], -1, dim)

        def block(carry, p):
            # dict carry: batch-sized conditioning (t6, ctx) rides along
            # so the same body runs microbatched under GPipe PP
            # (parallel/pipeline.py) — shapes come from the arrays, not
            # the closed-over B
            h, t6, ctx = carry["h"], carry["t6"], carry["ctx"]
            Bmb = h.shape[0]
            (shift_msa, scale_msa, gate_msa, c_shift, c_scale,
             c_gate) = mod(p["scale_shift_table"], t6)
            # 1. self-attention
            hn = (_fp32_ln(h, eps) * (1 + scale_msa) + shift_msa
                  ).astype(h.dtype)
            a = p["attn1"]
            q = _rms_full(linear(hn, a["to_q"]["w"], a["to_q"]["b"]),
                          a["norm_q"], eps)
            k = _rms_full(linear(hn, a["to_k"]["w"], a["to_k"]["b"]),
                          a["norm_k"], eps)
            v = linear(hn, a["to_v"]["w"], a["to_v"]["b"])
            q = apply_wan_rope_mm(
                q.reshape(Bmb, S, -1, c.attention_head_dim),
                rope_cos, rope_sin, rope_rot)
            k = apply_wan_rope_mm(
                k.reshape(Bmb, S, -1, c.attention_head_dim),
                rope_cos, rope_sin, rope_rot)
            v = v.reshape(Bmb, S, -1, c.attention_head_dim)
            attn = linear(attention(q, k, v), a["to_out"]["w"],
                          a["to_out"]["b"])
            h = (h.astype(jnp.float32)
                 + attn.astype(jnp.float32) * gate_msa).astype(h.dtype)

            # 2. cross-attention
            a2 = p["attn2"]
            if "norm2_g" in p:
                hn = _fp32_ln(h, eps, p["norm2_g"], p["norm2_b"]
                              ).astype(h.dtype)
            else:
                hn = h
            if n_img_ctx:
                ctx_img = ctx[:, :n_img_ctx]
                ctx_txt = ctx[:, n_img_ctx:]
            else:
                ctx_img, ctx_txt = None, ctx
            q = _rms_full(linear(hn, a2["to_q"]["w"], a2["to_q"]["b"]),
                          a2["norm_q"], eps)
            k = _rms_full(linear(ctx_txt, a2["to_k"]["w"], a2["to_k"]["b"]),
                          a2["norm_k"], eps)
            v = linear(ctx_txt, a2["to_v"]["w"], a2["to_v"]["b"])
            q = q.reshape(Bmb, S, -1, c.attention_head_dim)
            k = k.reshape(Bmb, ctx_txt.shape[1], -1, c.attention_head_dim)
            v = v.reshape(Bmb, ctx_txt.shape[1], -1, c.attention_head_dim)
            xattn = attention(q, k, v)
            if ctx_img is not None:
                ki = _rms_full(
                    linear(ctx_img, a2["add_k"]["w"], a2["add_k"]["b"]),
                    a2["norm_added_k"], eps)
                vi = linear(ctx_img, a2["add_v"]["w"], a2["add_v"]["b"])
                ki = ki.reshape(Bmb, -1, c.num_attention_heads,
                                c.attention_head_dim)
                vi = vi.reshape(Bmb, -1, c.num_attention_heads,
                                c.attention_head_dim)
                xattn = xattn + attention(q, ki, vi)
            xattn = linear(xattn, a2["to_out"]["w"], a2["to_out"]["b"])
            h = h + xattn

            # 3. ffn
            hn = (_fp32_ln(h, eps) * (1 + c_scale) + c_shift).astype(h.dtype)
            f = p["ffn"]
            ff = linear(gelu_approx(linear(hn, f["fc1"]["w"], f["fc1"]["b"])),
                        f["fc2"]["w"], f["fc2"]["b"])
            h = (h.astype(jnp.float32)
                 + ff.astype(jnp.float32) * c_gate).astype(h.dtype)
            return dict(carry, h=h)

        carry = {"h": h, "t6": t6, "ctx": ctx}
        if self.pp_mesh is not None:
            from vllm_omni_tpu.parallel.pipeline import pipeline_blocks

            carry = pipeline_blocks(
                block, params["blocks"], carry, self.pp_mesh,
                self.pp_microbatches or B)
        else:
            carry, _ = jax.lax.scan(
                lambda cr, p: (block(cr, p), None), carry,
                params["blocks"])
        h = carry["h"]

        # output head: table + temb -> (shift, scale)
        table = params["head_table"].astype(jnp.float32)
        if per_token_t:
            m = table[None] + temb.astype(jnp.float32)[:, :, None, :]
            shift, scale = m[:, :, 0], m[:, :, 1]
        else:
            m = table + temb.astype(jnp.float32)[:, None, :]
            shift, scale = m[:, 0][:, None, :], m[:, 1][:, None, :]
        h = (_fp32_ln(h, eps) * (1 + scale) + shift).astype(h.dtype)
        out = linear(h, params["proj_out"]["w"], params["proj_out"]["b"])

        # unpatchify [B, S, C*pt*ph*pw] -> [B, C, F, H, W]
        out = out.reshape(B, gf, gh, gw, pt, ph, pw, c.out_channels)
        out = out.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return out.reshape(B, c.out_channels, gf * pt, gh * ph, gw * pw)
