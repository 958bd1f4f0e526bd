"""Flux-family MMDiT (dual-stream + fused single-stream blocks) shared by
Ovis-Image and LongCat-Image.

Behavioral parity targets:
- OvisImageTransformer2DModel (reference diffusion/models/ovis_image/
  ovis_image_transformer.py:336-534): RMS-normed context embedder,
  SwiGLU dual-block FFNs, gated-silu single-block MLP;
- LongCatImageTransformer2DModel (reference diffusion/models/
  longcat_image/longcat_image_transformer.py:349-470): plain gelu-tanh
  FFNs/MLPs, no context norm.

Common structure: packed 2x2 latents -> x_embedder; joint order
[text, image]; flux rope (theta 10000, pair-interleaved, per-axis dims
over (0, y, x) ids); AdaLayerNormZero dual blocks; single blocks run
attention and MLP in parallel over the concatenated sequence with a
3-way AdaLayerNormZeroSingle and a fused [attn | mlp] output projection;
AdaLayerNormContinuous head. Timesteps scaled x1000. Blocks scanned.
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
class FluxLikeConfig:
    patch_size: int = 1  # latents arrive pre-packed (2x2 -> 64ch)
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 6
    num_single_layers: int = 27
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 2048
    axes_dims_rope: tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    mlp_ratio: float = 4.0
    ffn: str = "swiglu"  # "swiglu" (Ovis) | "gelu" (LongCat)
    context_norm: bool = True  # Ovis RMS-norms the text stream first
    eps: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_hf(cls, d: dict[str, Any], **overrides) -> "FluxLikeConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys and v is not None}
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        kw.update(overrides)
        return cls(**kw)


def flux_rope_angles(cfg: FluxLikeConfig, ids: np.ndarray) -> jax.Array:
    """ids [S, 3] -> angles [S, head_dim//2] (per-axis concat, flux
    repeat_interleave_real convention pairs with apply_rope_pairs)."""
    parts = []
    for ax, d in enumerate(cfg.axes_dims_rope):
        inv = 1.0 / (cfg.rope_theta ** (
            np.arange(0, d, 2, dtype=np.float64) / d))
        parts.append(np.asarray(ids[:, ax], np.float64)[:, None] * inv[None])
    return jnp.asarray(np.concatenate(parts, axis=-1), jnp.float32)


def flux_image_ids(gh: int, gw: int) -> np.ndarray:
    ids = np.zeros((gh * gw, 3), np.int32)
    hh, ww = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    ids[:, 1] = hh.reshape(-1)
    ids[:, 2] = ww.reshape(-1)
    return ids


def pack_latents(latents: jax.Array) -> jax.Array:
    """[B, C, H, W] -> [B, (H/2)(W/2), C*4] (flux _pack_latents)."""
    B, C, H, W = latents.shape
    x = latents.reshape(B, C, H // 2, 2, W // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(B, (H // 2) * (W // 2), C * 4)


def unpack_latents(latents: jax.Array, gh: int, gw: int) -> jax.Array:
    """[B, gh*gw, C*4] -> [B, C, gh*2, gw*2] (flux _unpack_latents)."""
    B, _, C4 = latents.shape
    C = C4 // 4
    x = latents.reshape(B, gh, gw, C, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(B, C, gh * 2, gw * 2)


class FluxLikeTransformer2DModel:
    def __init__(self, config: FluxLikeConfig, dtype=jnp.bfloat16):
        self.cfg = config
        self.dtype = dtype

    # ------------------------------------------------------------- params
    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        c, dt = self.cfg, self.dtype
        dim = c.inner_dim
        hd = c.attention_head_dim
        Ld, Ls = c.num_layers, c.num_single_layers
        mlp = int(dim * c.mlp_ratio)
        ks = iter(jax.random.split(rng, 32))

        def w(*shape, scale=0.02):
            # direct-dtype generation: an f32 stacked intermediate is a
            # multi-GB transient at real scale (see wan2_2/transformer.py)
            return jax.random.normal(next(ks), shape, dt) * scale

        def lin(n, i, o):
            if n == 0:
                return {"w": w(i, o), "b": jnp.zeros((o,), dt)}
            return {"w": w(n, i, o), "b": jnp.zeros((n, o), dt)}

        ffn_in = 2 * mlp if c.ffn == "swiglu" else mlp
        dual = {
            "norm1": lin(Ld, dim, 6 * dim),
            "norm1_context": lin(Ld, dim, 6 * dim),
            "attn": {
                "to_q": lin(Ld, dim, dim), "to_k": lin(Ld, dim, dim),
                "to_v": lin(Ld, dim, dim),
                "add_q": lin(Ld, dim, dim), "add_k": lin(Ld, dim, dim),
                "add_v": lin(Ld, dim, dim),
                "norm_q": jnp.ones((Ld, hd), dt),
                "norm_k": jnp.ones((Ld, hd), dt),
                "norm_added_q": jnp.ones((Ld, hd), dt),
                "norm_added_k": jnp.ones((Ld, hd), dt),
                "to_out": lin(Ld, dim, dim),
                "to_add_out": lin(Ld, dim, dim),
            },
            "ff": {"fc1": lin(Ld, dim, ffn_in), "fc2": lin(Ld, mlp, dim)},
            "ff_context": {"fc1": lin(Ld, dim, ffn_in),
                           "fc2": lin(Ld, mlp, dim)},
        }
        single_in = 2 * mlp if c.ffn == "swiglu" else mlp
        single = {
            "norm": lin(Ls, dim, 3 * dim),
            "proj_mlp": lin(Ls, dim, single_in),
            "proj_out": lin(Ls, dim + mlp, dim),
            "attn": {
                "to_q": lin(Ls, dim, dim), "to_k": lin(Ls, dim, dim),
                "to_v": lin(Ls, dim, dim),
                "norm_q": jnp.ones((Ls, hd), dt),
                "norm_k": jnp.ones((Ls, hd), dt),
            },
        }
        params = {
            "x_embedder": lin(0, c.in_channels, dim),
            "context_embedder": lin(0, c.joint_attention_dim, dim),
            "time_embed": {"fc1": lin(0, 256, dim), "fc2": lin(0, dim, dim)},
            "dual_blocks": dual,
            "single_blocks": single,
            "norm_out": lin(0, dim, 2 * dim),
            "proj_out": lin(0, dim,
                            c.patch_size * c.patch_size * c.out_channels),
        }
        if c.context_norm:
            params["context_norm"] = jnp.ones((c.joint_attention_dim,), dt)
        return params

    # ------------------------------------------------------------ helpers
    def _ffn(self, p, x):
        c = self.cfg
        h = linear(x, p["fc1"]["w"], p["fc1"]["b"])
        if c.ffn == "swiglu":
            # diffusers SwiGLU: split (hidden, gate); hidden * silu(gate)
            hidden, gate = jnp.split(h, 2, axis=-1)
            h = hidden * jax.nn.silu(
                gate.astype(jnp.float32)).astype(x.dtype)
        else:
            h = gelu_approx(h)
        return linear(h, p["fc2"]["w"], p["fc2"]["b"])

    def _attn(self, a, q_in, kv_txt, angles, eps):
        c = self.cfg
        B = q_in.shape[0]
        H, D = c.num_attention_heads, c.attention_head_dim

        def heads(x, pr):
            return linear(x, pr["w"], pr["b"]).reshape(B, -1, H, D)

        q = rms_norm(heads(q_in, a["to_q"]), a["norm_q"], eps)
        k = rms_norm(heads(q_in, a["to_k"]), a["norm_k"], eps)
        v = heads(q_in, a["to_v"])
        if kv_txt is not None:
            qt = rms_norm(heads(kv_txt, a["add_q"]), a["norm_added_q"], eps)
            kt = rms_norm(heads(kv_txt, a["add_k"]), a["norm_added_k"], eps)
            vt = heads(kv_txt, a["add_v"])
            q = jnp.concatenate([qt, q], axis=1)
            k = jnp.concatenate([kt, k], axis=1)
            v = jnp.concatenate([vt, v], axis=1)
        from vllm_omni_tpu.diffusion.models.z_image.transformer import (
            apply_rope_pairs,
        )

        q = apply_rope_pairs(q, angles)
        k = apply_rope_pairs(k, angles)
        return dense_attention(q, k, v).reshape(B, -1, c.inner_dim)

    @staticmethod
    def _adaln_mod(x, shift, scale, eps=1e-6):
        h = layer_norm(x, eps).astype(jnp.float32)
        h = h * (1.0 + scale[:, None, :]) + shift[:, None, :]
        return h

    # ------------------------------------------------------------ forward
    def forward(
        self,
        params: dict[str, Any],
        packed_latents: jax.Array,  # [B, Nimg, in_channels]
        encoder_hidden_states: jax.Array,  # [B, Ntxt, joint_dim]
        timestep: jax.Array,  # [B] in 0..1 sigma units (scaled x1000)
        img_ids: np.ndarray,  # [Nimg, 3]
        txt_ids: Optional[np.ndarray] = None,  # [Ntxt, 3], default zeros
    ) -> jax.Array:
        c = self.cfg
        eps = c.eps
        B, Nimg, _ = packed_latents.shape
        Ntxt = encoder_hidden_states.shape[1]
        if txt_ids is None:
            txt_ids = np.zeros((Ntxt, 3), np.int32)
        angles = flux_rope_angles(c, np.concatenate([txt_ids, img_ids]))

        img = linear(packed_latents.astype(self.dtype),
                     params["x_embedder"]["w"], params["x_embedder"]["b"])
        txt = encoder_hidden_states.astype(self.dtype)
        if c.context_norm:
            txt = rms_norm(txt, params["context_norm"], eps)
        txt = linear(txt, params["context_embedder"]["w"],
                     params["context_embedder"]["b"])

        t = timestep.astype(jnp.float32) * 1000.0
        tfreq = sinusoidal_timestep_embedding(t, 256, scale=1.0)
        te = params["time_embed"]
        temb = linear(
            jax.nn.silu(linear(tfreq.astype(self.dtype), te["fc1"]["w"],
                               te["fc1"]["b"]).astype(jnp.float32)
                        ).astype(self.dtype),
            te["fc2"]["w"], te["fc2"]["b"])
        temb_act = jax.nn.silu(temb.astype(jnp.float32)).astype(self.dtype)

        def dual(carry, p):
            img, txt = carry
            m = linear(temb_act, p["norm1"]["w"],
                       p["norm1"]["b"]).astype(jnp.float32)
            (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
             gate_mlp) = jnp.split(m, 6, axis=-1)
            mc = linear(temb_act, p["norm1_context"]["w"],
                        p["norm1_context"]["b"]).astype(jnp.float32)
            (c_shift_msa, c_scale_msa, c_gate_msa, c_shift_mlp, c_scale_mlp,
             c_gate_mlp) = jnp.split(mc, 6, axis=-1)
            img_md = self._adaln_mod(img, shift_msa, scale_msa
                                     ).astype(img.dtype)
            txt_md = self._adaln_mod(txt, c_shift_msa, c_scale_msa
                                     ).astype(txt.dtype)
            o = self._attn(p["attn"], img_md, txt_md, angles, eps)
            o_t, o_i = o[:, :Ntxt], o[:, Ntxt:]
            o_i = linear(o_i, p["attn"]["to_out"]["w"],
                         p["attn"]["to_out"]["b"])
            o_t = linear(o_t, p["attn"]["to_add_out"]["w"],
                         p["attn"]["to_add_out"]["b"])
            img = img + (gate_msa[:, None, :]
                         * o_i.astype(jnp.float32)).astype(img.dtype)
            txt = txt + (c_gate_msa[:, None, :]
                         * o_t.astype(jnp.float32)).astype(txt.dtype)
            img_md = self._adaln_mod(img, shift_mlp, scale_mlp
                                     ).astype(img.dtype)
            img = img + (gate_mlp[:, None, :] * self._ffn(
                p["ff"], img_md).astype(jnp.float32)).astype(img.dtype)
            txt_md = self._adaln_mod(txt, c_shift_mlp, c_scale_mlp
                                     ).astype(txt.dtype)
            txt = txt + (c_gate_mlp[:, None, :] * self._ffn(
                p["ff_context"], txt_md).astype(jnp.float32)
                ).astype(txt.dtype)
            return (img, txt), None

        (img, txt), _ = jax.lax.scan(dual, (img, txt),
                                     params["dual_blocks"])

        uni = jnp.concatenate([txt, img], axis=1)
        mlp = int(c.inner_dim * c.mlp_ratio)

        def single(carry, p):
            h = carry
            m = linear(temb_act, p["norm"]["w"],
                       p["norm"]["b"]).astype(jnp.float32)
            shift, scale, gate = jnp.split(m, 3, axis=-1)
            hn = self._adaln_mod(h, shift, scale).astype(h.dtype)
            proj = linear(hn, p["proj_mlp"]["w"], p["proj_mlp"]["b"])
            if c.ffn == "swiglu":
                # Ovis: split (states, gate); silu(gate) * states
                states, g = jnp.split(proj, 2, axis=-1)
                mlp_out = jax.nn.silu(
                    g.astype(jnp.float32)).astype(h.dtype) * states
            else:
                mlp_out = gelu_approx(proj)
            attn_out = self._attn(p["attn"], hn, None, angles, eps)
            fused = jnp.concatenate([attn_out, mlp_out], axis=-1)
            out = linear(fused, p["proj_out"]["w"], p["proj_out"]["b"])
            h = h + (gate[:, None, :]
                     * out.astype(jnp.float32)).astype(h.dtype)
            return h, None

        uni, _ = jax.lax.scan(single, uni, params["single_blocks"])
        img = uni[:, Ntxt:]

        so = linear(temb_act, params["norm_out"]["w"],
                    params["norm_out"]["b"]).astype(jnp.float32)
        scale, shift = jnp.split(so, 2, axis=-1)
        out = layer_norm(img, eps).astype(jnp.float32)
        out = ((out * (1.0 + scale[:, None, :]) + shift[:, None, :])
               ).astype(img.dtype)
        return linear(out, params["proj_out"]["w"], params["proj_out"]["b"])

    # ------------------------------------------------------------ loading
    def load_from_state_dict(self, sd: dict[str, Any]) -> dict[str, Any]:
        c = self.cfg
        dt = self.dtype

        def t(name):
            return jnp.asarray(
                np.asarray(sd[name], np.float32).T).astype(dt)

        def v(name):
            return jnp.asarray(np.asarray(sd[name], np.float32)).astype(dt)

        def lin(name):
            return {"w": t(f"{name}.weight"), "b": v(f"{name}.bias")}

        def stack(items):
            return jax.tree.map(lambda *xs: jnp.stack(xs), *items)

        def dual_block(i):
            pre = f"transformer_blocks.{i}"
            return {
                "norm1": lin(f"{pre}.norm1.linear"),
                "norm1_context": lin(f"{pre}.norm1_context.linear"),
                "attn": {
                    "to_q": lin(f"{pre}.attn.to_q"),
                    "to_k": lin(f"{pre}.attn.to_k"),
                    "to_v": lin(f"{pre}.attn.to_v"),
                    "add_q": lin(f"{pre}.attn.add_q_proj"),
                    "add_k": lin(f"{pre}.attn.add_k_proj"),
                    "add_v": lin(f"{pre}.attn.add_v_proj"),
                    "norm_q": v(f"{pre}.attn.norm_q.weight"),
                    "norm_k": v(f"{pre}.attn.norm_k.weight"),
                    "norm_added_q": v(f"{pre}.attn.norm_added_q.weight"),
                    "norm_added_k": v(f"{pre}.attn.norm_added_k.weight"),
                    "to_out": lin(f"{pre}.attn.to_out.0"),
                    "to_add_out": lin(f"{pre}.attn.to_add_out"),
                },
                "ff": {"fc1": lin(f"{pre}.ff.net.0.proj"),
                       "fc2": lin(f"{pre}.ff.net.2")},
                "ff_context": {"fc1": lin(f"{pre}.ff_context.net.0.proj"),
                               "fc2": lin(f"{pre}.ff_context.net.2")},
            }

        def single_block(i):
            pre = f"single_transformer_blocks.{i}"
            return {
                "norm": lin(f"{pre}.norm.linear"),
                "proj_mlp": lin(f"{pre}.proj_mlp"),
                "proj_out": lin(f"{pre}.proj_out"),
                "attn": {
                    "to_q": lin(f"{pre}.attn.to_q"),
                    "to_k": lin(f"{pre}.attn.to_k"),
                    "to_v": lin(f"{pre}.attn.to_v"),
                    "norm_q": v(f"{pre}.attn.norm_q.weight"),
                    "norm_k": v(f"{pre}.attn.norm_k.weight"),
                },
            }

        # LongCat FeedForward uses w_in/w_out (not diffusers net.*)
        def ff_name_fixup():
            for k in list(sd):
                if ".ff.w_in." in k or ".ff_context.w_in." in k:
                    sd[k.replace(".w_in.", ".net.0.proj.")] = sd[k]
                if ".ff.w_out." in k or ".ff_context.w_out." in k:
                    sd[k.replace(".w_out.", ".net.2.")] = sd[k]

        ff_name_fixup()
        params = {
            "x_embedder": lin("x_embedder"),
            "context_embedder": lin("context_embedder"),
            "time_embed": {
                "fc1": lin("time_embed.timestep_embedder.linear_1")
                if "time_embed.timestep_embedder.linear_1.weight" in sd
                else lin("timestep_embedder.linear_1"),
                "fc2": lin("time_embed.timestep_embedder.linear_2")
                if "time_embed.timestep_embedder.linear_2.weight" in sd
                else lin("timestep_embedder.linear_2"),
            },
            "dual_blocks": stack(
                [dual_block(i) for i in range(c.num_layers)]),
            "single_blocks": stack(
                [single_block(i) for i in range(c.num_single_layers)]),
            "norm_out": lin("norm_out.linear"),
            "proj_out": lin("proj_out"),
        }
        if c.context_norm:
            params["context_norm"] = v("context_embedder_norm.weight")
        return params
