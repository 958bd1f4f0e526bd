"""Z-Image (Lumina-style) DiT (functional JAX, scanned main layers).

Behavioral parity with the reference ZImageTransformer2DModel (reference
diffusion/models/z_image/z_image_transformer.py:346-698):
- unified single sequence [image tokens, caption tokens] after separate
  noise-refiner (modulated) and context-refiner (unmodulated) stacks;
- 3-axis rope (theta 256) over explicit position ids: caption tokens at
  (1+i, 0, 0), image tokens at (cap_len_padded+1, h, w), pad tokens at
  (0,0,0); non-neox pair-interleaved rotation; per-head RMS q/k norm
  (eps 1e-5);
- sandwich RMSNorm blocks: x += gate * norm2(attn(norm1(x) * scale));
  SwiGLU FFN with hidden = dim/3*8; adaLN from a 256-dim timestep embed,
  chunks (scale_msa, gate_msa, scale_mlp, gate_mlp), gates tanh'd;
- both sequences padded to multiples of 32 with learned pad tokens
  (x_pad_token / cap_pad_token);
- FinalLayer: LN (no affine) * (1 + silu-linear(adaln)) -> linear.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.diffusion.layers import (
    layer_norm,
    sinusoidal_timestep_embedding,
)
from vllm_omni_tpu.models.layers import linear, rms_norm

ADALN_DIM = 256
SEQ_MULTI_OF = 32


@dataclass
class ZImageTransformerConfig:
    patch_size: int = 2
    f_patch_size: int = 1
    in_channels: int = 16
    dim: int = 3840
    n_layers: int = 30
    n_refiner_layers: int = 2
    n_heads: int = 30
    norm_eps: float = 1e-5
    cap_feat_dim: int = 2560
    rope_theta: float = 256.0
    t_scale: float = 1000.0
    axes_dims: tuple[int, int, int] = (32, 48, 48)
    axes_lens: tuple[int, int, int] = (1024, 512, 512)

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def ffn_dim(self) -> int:
        return int(self.dim / 3 * 8)

    @classmethod
    def from_hf(cls, d: dict[str, Any]) -> "ZImageTransformerConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys and v is not None}
        # checkpoint configs carry list-valued all_patch_size
        if "all_patch_size" in d:
            kw["patch_size"] = int(d["all_patch_size"][0])
        if "all_f_patch_size" in d:
            kw["f_patch_size"] = int(d["all_f_patch_size"][0])
        for k in ("axes_dims", "axes_lens"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


def rope_angles_from_ids(cfg: ZImageTransformerConfig,
                         ids: jax.Array) -> jax.Array:
    """ids [S, 3] -> angles [S, head_dim//2] (per-axis freq concat)."""
    parts = []
    for ax, d in enumerate(cfg.axes_dims):
        inv = 1.0 / (cfg.rope_theta ** (
            jnp.arange(0, d, 2, dtype=jnp.float32) / d))
        parts.append(ids[:, ax].astype(jnp.float32)[:, None] * inv[None])
    return jnp.concatenate(parts, axis=-1)


def apply_rope_pairs(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Non-neox pair-interleaved rotation; x [B, S, H, D],
    angles [B, S, D//2] or [S, D//2]."""
    if angles.ndim == 2:
        angles = angles[None]
    B, S, H, D = x.shape
    xf = x.astype(jnp.float32).reshape(B, S, H, D // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(B, S, H, D).astype(x.dtype)


class ZImageTransformer2DModel:
    def __init__(self, config: ZImageTransformerConfig, dtype=jnp.bfloat16):
        self.cfg = config
        self.dtype = dtype

    # ------------------------------------------------------------- params
    def _block_init(self, k, n: int, modulation: bool):
        c, dt = self.cfg, self.dtype
        dim, hd = c.dim, c.head_dim
        ks = iter(jax.random.split(k, 16))

        def w(*shape, scale=0.02):
            # direct-dtype generation (no f32 stacked transient)
            return jax.random.normal(next(ks), shape, dt) * scale

        def lin(i, o, bias=False):
            p = {"w": w(n, i, o) if n else w(i, o)}
            if bias:
                p["b"] = jnp.zeros((n, o) if n else (o,), dt)
            return p

        def vec(shape):
            return jnp.ones((n,) + shape if n else shape, dt)

        p = {
            "to_q": lin(dim, dim), "to_k": lin(dim, dim),
            "to_v": lin(dim, dim), "to_out": lin(dim, dim),
            "norm_q": vec((hd,)), "norm_k": vec((hd,)),
            "w1": lin(dim, c.ffn_dim), "w3": lin(dim, c.ffn_dim),
            "w2": lin(c.ffn_dim, dim),
            "attention_norm1": vec((dim,)), "attention_norm2": vec((dim,)),
            "ffn_norm1": vec((dim,)), "ffn_norm2": vec((dim,)),
        }
        if modulation:
            p["adaln"] = lin(min(dim, ADALN_DIM), 4 * dim, bias=True)
        return p

    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        dim = c.dim
        p2, pf = c.patch_size, c.f_patch_size
        ks = iter(jax.random.split(rng, 16))

        def w(*shape, scale=0.02):
            # direct-dtype generation (no f32 stacked transient)
            return jax.random.normal(next(ks), shape, dt) * scale

        ada = min(dim, ADALN_DIM)
        return {
            "x_embedder": {"w": w(pf * p2 * p2 * c.in_channels, dim),
                           "b": jnp.zeros((dim,), dt)},
            "final": {
                "linear": {"w": w(dim, p2 * p2 * pf * c.in_channels),
                           "b": jnp.zeros((p2 * p2 * pf * c.in_channels,),
                                          dt)},
                "adaln": {"w": w(ada, dim), "b": jnp.zeros((dim,), dt)},
            },
            "t_embedder": {
                "fc1": {"w": w(256, 1024), "b": jnp.zeros((1024,), dt)},
                "fc2": {"w": w(1024, ada), "b": jnp.zeros((ada,), dt)},
            },
            "cap_embedder": {
                "norm": jnp.ones((c.cap_feat_dim,), dt),
                "proj": {"w": w(c.cap_feat_dim, dim),
                         "b": jnp.zeros((dim,), dt)},
            },
            "x_pad_token": w(dim),
            "cap_pad_token": w(dim),
            "noise_refiner": self._block_init(
                next(ks), c.n_refiner_layers, modulation=True),
            "context_refiner": self._block_init(
                next(ks), c.n_refiner_layers, modulation=False),
            "layers": self._block_init(next(ks), c.n_layers,
                                       modulation=True),
        }

    def load_weights(self, path: str, subfolder: str = "transformer"):
        from vllm_omni_tpu.diffusion.models.z_image.loader import (
            load_z_image_transformer_weights,
        )

        return load_z_image_transformer_weights(path, self, subfolder)

    # ------------------------------------------------------------ blocks
    def _block(self, p, x, angles, adaln):
        c = self.cfg
        eps = c.norm_eps
        B = x.shape[0]
        if adaln is not None and "adaln" in p:
            m = linear(adaln, p["adaln"]["w"], p["adaln"]["b"])
            scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(
                m.astype(jnp.float32), 4, axis=-1)
            gate_msa = jnp.tanh(gate_msa)[:, None, :]
            gate_mlp = jnp.tanh(gate_mlp)[:, None, :]
            scale_msa = (1.0 + scale_msa)[:, None, :]
            scale_mlp = (1.0 + scale_mlp)[:, None, :]
        else:
            gate_msa = gate_mlp = scale_msa = scale_mlp = None

        h = rms_norm(x, p["attention_norm1"], eps)
        if scale_msa is not None:
            h = (h.astype(jnp.float32) * scale_msa).astype(x.dtype)
        q = linear(h, p["to_q"]["w"]).reshape(B, -1, c.n_heads, c.head_dim)
        k = linear(h, p["to_k"]["w"]).reshape(B, -1, c.n_heads, c.head_dim)
        v = linear(h, p["to_v"]["w"]).reshape(B, -1, c.n_heads, c.head_dim)
        q = rms_norm(q, p["norm_q"], 1e-5)
        k = rms_norm(k, p["norm_k"], 1e-5)
        q = apply_rope_pairs(q, angles)
        k = apply_rope_pairs(k, angles)
        from vllm_omni_tpu.diffusion.layers import dense_attention

        attn = dense_attention(q, k, v).reshape(B, -1, c.dim)
        attn = linear(attn, p["to_out"]["w"])
        attn = rms_norm(attn, p["attention_norm2"], eps)
        if gate_msa is not None:
            x = (x.astype(jnp.float32)
                 + gate_msa * attn.astype(jnp.float32)).astype(x.dtype)
        else:
            x = x + attn

        h = rms_norm(x, p["ffn_norm1"], eps)
        if scale_mlp is not None:
            h = (h.astype(jnp.float32) * scale_mlp).astype(x.dtype)
        g = jax.nn.silu(
            linear(h, p["w1"]["w"]).astype(jnp.float32)).astype(x.dtype)
        ff = linear(g * linear(h, p["w3"]["w"]), p["w2"]["w"])
        ff = rms_norm(ff, p["ffn_norm2"], eps)
        if gate_mlp is not None:
            x = (x.astype(jnp.float32)
                 + gate_mlp * ff.astype(jnp.float32)).astype(x.dtype)
        else:
            x = x + ff
        return x

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params: dict[str, Any],
        latents: jax.Array,  # [B, C, H, W]
        timestep: jax.Array,  # [B], already (1000 - t)/1000 normalized
        cap_feats: jax.Array,  # [B, Lcap, cap_feat_dim] (pre-padded equal)
        cap_len: int,  # true caption length (same across batch)
    ) -> jax.Array:
        c = self.cfg
        B, C, Hpx, Wpx = latents.shape
        p2 = c.patch_size
        gh, gw = Hpx // p2, Wpx // p2
        n_img = gh * gw
        img_pad = (-n_img) % SEQ_MULTI_OF
        cap_pad = (-cap_len) % SEQ_MULTI_OF
        cap_total = cap_len + cap_pad

        # timestep -> adaln input (256-dim)
        t = timestep.astype(jnp.float32) * c.t_scale
        tfreq = sinusoidal_timestep_embedding(t, 256, scale=1.0)
        te = params["t_embedder"]
        adaln = linear(
            jax.nn.silu(linear(tfreq.astype(self.dtype), te["fc1"]["w"],
                               te["fc1"]["b"]).astype(jnp.float32)
                        ).astype(self.dtype),
            te["fc2"]["w"], te["fc2"]["b"])

        # image tokens: patchify "c f pf h ph w pw -> (f h w)(pf ph pw c)"
        x = latents.reshape(B, C, gh, p2, gw, p2)
        x = x.transpose(0, 2, 4, 3, 5, 1).reshape(B, n_img, p2 * p2 * C)
        x = linear(x.astype(self.dtype), params["x_embedder"]["w"],
                   params["x_embedder"]["b"])
        if img_pad:
            pad = jnp.broadcast_to(params["x_pad_token"],
                                   (B, img_pad, c.dim))
            x = jnp.concatenate([x, pad], axis=1)

        # caption tokens
        ce = params["cap_embedder"]
        cap = rms_norm(cap_feats.astype(self.dtype), ce["norm"], c.norm_eps)
        cap = linear(cap, ce["proj"]["w"], ce["proj"]["b"])
        if cap_pad:
            # reference pads by repeating the last feature, then REPLACES
            # embedded pad rows with cap_pad_token
            padc = jnp.broadcast_to(params["cap_pad_token"],
                                    (B, cap_pad, c.dim))
            cap = jnp.concatenate([cap[:, :cap_len], padc], axis=1)
        else:
            cap = cap[:, :cap_len]

        # position ids
        cap_ids = np.zeros((cap_total, 3), np.int32)
        cap_ids[:, 0] = np.arange(1, cap_total + 1)
        img_ids = np.zeros((n_img + img_pad, 3), np.int32)
        hh, ww = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        img_ids[:n_img, 0] = cap_total + 1
        img_ids[:n_img, 1] = hh.reshape(-1)
        img_ids[:n_img, 2] = ww.reshape(-1)
        # pad tokens keep (0, 0, 0)
        img_angles = rope_angles_from_ids(c, jnp.asarray(img_ids))
        cap_angles = rope_angles_from_ids(c, jnp.asarray(cap_ids))

        # refiners
        nr = params["noise_refiner"]
        for i in range(c.n_refiner_layers):
            x = self._block(jax.tree.map(lambda a: a[i], nr), x,
                            img_angles, adaln)
        cr = params["context_refiner"]
        for i in range(c.n_refiner_layers):
            cap = self._block(jax.tree.map(lambda a: a[i], cr), cap,
                              cap_angles, None)

        # unified [image, caption]
        uni = jnp.concatenate([x, cap], axis=1)
        uni_angles = jnp.concatenate([img_angles, cap_angles], axis=0)

        def layer(carry, p):
            return self._block(p, carry, uni_angles, adaln), None

        uni, _ = jax.lax.scan(layer, uni, params["layers"])

        # final layer
        f = params["final"]
        scale = 1.0 + linear(
            jax.nn.silu(adaln.astype(jnp.float32)).astype(self.dtype),
            f["adaln"]["w"], f["adaln"]["b"]).astype(jnp.float32)
        out = layer_norm(uni[:, :n_img], 1e-6).astype(jnp.float32)
        out = (out * scale[:, None, :]).astype(self.dtype)
        out = linear(out, f["linear"]["w"], f["linear"]["b"])

        # unpatchify "f h w pf ph pw c -> c (f pf)(h ph)(w pw)" (f=1)
        out = out.reshape(B, gh, gw, p2, p2, C)
        out = out.transpose(0, 5, 1, 3, 2, 4)
        return out.reshape(B, C, gh * p2, gw * p2)
