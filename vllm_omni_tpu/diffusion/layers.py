"""Shared DiT building blocks (functional JAX).

Parity targets: the reference's AdaLayerNorm / timestep embeddings /
non-neox rotary (reference diffusion/layers/adalayernorm.py:10, rope.py:68,
qwen_image_transformer.py:40-287). All ops are jnp-level so XLA fuses them
into surrounding matmuls; attention has a dense path (XLA does flash-style
fusion on TPU) used by the DiT blocks.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.layers import linear, rms_norm


def sinusoidal_timestep_embedding(
    t: jax.Array, dim: int, scale: float = 1000.0, max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
) -> jax.Array:
    """diffusers `Timesteps` parity: [B] -> [B, dim] f32."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    freqs = jnp.exp(exponent)
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


def timestep_embed(params: dict, t: jax.Array, dim: int = 0) -> jax.Array:
    """Sinusoidal -> MLP (linear, silu, linear) -> [B, inner_dim]."""
    h = sinusoidal_timestep_embedding(t, 256)
    w1 = params["mlp1"]["w"]
    # int8-quantized weights are {"q","s"} dicts (ops/quant.py); the
    # activation dtype then comes from the (unquantized) bias
    h = h.astype(params["mlp1"]["b"].dtype if isinstance(w1, dict)
                 else w1.dtype)
    h = linear(h, params["mlp1"]["w"], params["mlp1"]["b"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    return linear(h, params["mlp2"]["w"], params["mlp2"]["b"])


def layer_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm without affine params (AdaLN convention)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def modulate(x: jax.Array, mod3: jax.Array, eps: float = 1e-6):
    """AdaLN modulation: mod3 [B, 3*dim] -> (normed*(1+scale)+shift, gate).

    Chunk order (shift, scale, gate) matches the reference `_modulate`
    (qwen_image_transformer.py:505-540)."""
    shift, scale, gate = jnp.split(mod3.astype(jnp.float32), 3, axis=-1)
    xn = layer_norm(x, eps).astype(jnp.float32)
    out = xn * (1.0 + scale[:, None, :]) + shift[:, None, :]
    return out.astype(x.dtype), gate[:, None, :].astype(x.dtype)


def gelu_approx(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)


# ------------------------------------------------------------------ rope 3d
def _rope_1d_freqs(index: jax.Array, dim: int, theta: float = 10000.0):
    inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    return jnp.outer(index.astype(jnp.float32), inv)  # [n, dim/2] angles


def rope_3d_freqs(
    frame: int,
    height: int,
    width: int,
    axes_dim: tuple[int, int, int] = (16, 56, 56),
    theta: float = 10000.0,
    scale_rope: bool = True,
    frame_offset: int = 0,
) -> jax.Array:
    """Angles [frame*height*width, sum(axes_dim)/2] for image tokens.

    scale_rope centers the h/w positions: [-(n - n//2) .. n//2 - 1]
    (reference QwenEmbedRope._compute_video_freqs, transformer.py:263-287).
    """
    def axis_index(n: int, centered: bool) -> jax.Array:
        if centered:
            return jnp.arange(-(n - n // 2), n // 2, dtype=jnp.float32)
        return jnp.arange(n, dtype=jnp.float32)

    f_idx = jnp.arange(frame_offset, frame_offset + frame, dtype=jnp.float32)
    h_idx = axis_index(height, scale_rope)
    w_idx = axis_index(width, scale_rope)
    ff = _rope_1d_freqs(f_idx, axes_dim[0], theta)  # [F, d0/2]
    fh = _rope_1d_freqs(h_idx, axes_dim[1], theta)  # [H, d1/2]
    fw = _rope_1d_freqs(w_idx, axes_dim[2], theta)  # [W, d2/2]
    F, H, W = frame, height, width
    ff = jnp.broadcast_to(ff[:, None, None, :], (F, H, W, ff.shape[-1]))
    fh = jnp.broadcast_to(fh[None, :, None, :], (F, H, W, fh.shape[-1]))
    fw = jnp.broadcast_to(fw[None, None, :, :], (F, H, W, fw.shape[-1]))
    return jnp.concatenate([ff, fh, fw], axis=-1).reshape(F * H * W, -1)


def rope_text_freqs(
    txt_len: int,
    head_dim_half: int,
    axes_dim: tuple[int, int, int] = (16, 56, 56),
    theta: float = 10000.0,
    start: int = 0,
) -> jax.Array:
    """Text tokens use 1D positions starting after the image extent
    (reference transformer.py:222-262: start = max(h//2, w//2))."""
    idx = jnp.arange(start, start + txt_len, dtype=jnp.float32)
    parts = [_rope_1d_freqs(idx, d, theta) for d in axes_dim]
    return jnp.concatenate(parts, axis=-1)


def apply_rope_interleaved(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Non-neox (GPT-J/interleaved) rotation: pairs (x[2i], x[2i+1]) rotated
    by angles[..., i]. x: [B, L, H, D], angles: [L, D/2]."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    out = jnp.stack([o0, o1], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


# --------------------------------------------------------- attention impl
# Kernel-orthogonal backend selection (parity: the reference's attention
# selector + parallel-strategy pre/post hooks, reference diffusion/
# attention/selector.py:18-77, attention/layer.py:17-70). A registered
# impl wraps/replaces the dense kernel — e.g. Ulysses SP installs
# `parallel.ulysses.ulysses_attention` inside its shard_map region.
_ATTENTION_IMPL = None


def set_attention_impl(fn) -> None:
    """fn(q, k, v, scale, mask) -> out, or None to restore the default."""
    global _ATTENTION_IMPL
    _ATTENTION_IMPL = fn


def get_attention_impl():
    return _ATTENTION_IMPL


# sequence length from which the Pallas flash kernel takes over from the
# XLA-fused dense path (the dense path materializes the [L, Lk] score
# matrix in HBM; flash keeps it in VMEM tiles). Override via env.
def _flash_min_seq() -> int:
    import os

    # 1024: measured crossover on v5e — at 1088 tokens (512px qwen-image)
    # flash is already ~10% faster per DiT step than the HBM-materialized
    # dense path, and the gap grows quadratically with sequence length
    return int(os.environ.get("OMNI_TPU_FLASH_MIN_SEQ", "1024"))


def dense_attention(
    q: jax.Array,  # [B, L, H, D]
    k: jax.Array,  # [B, Lk, H, D]
    v: jax.Array,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,  # [B, L, Lk] or broadcastable
) -> jax.Array:
    """Dense attention front door for the DiT blocks: XLA-fused dense
    kernel for short sequences, Pallas flash above _flash_min_seq()
    (long-sequence Wan2.2 video). [B, L, H, D] out."""
    if _ATTENTION_IMPL is not None:
        return _ATTENTION_IMPL(q, k, v, scale, mask)
    L, Lk = q.shape[1], k.shape[1]
    key_mask = None
    flash_ok = max(L, Lk) >= _flash_min_seq()
    if mask is not None:
        # flash path supports key-validity masks ([B, 1, Lk] / [B, Lk]);
        # full per-query masks fall back to the dense kernel
        if mask.ndim == 3 and mask.shape[1] == 1:
            key_mask = mask[:, 0, :]
        elif mask.ndim == 2:
            key_mask = mask
        else:
            flash_ok = False
    if flash_ok:
        from vllm_omni_tpu.ops.attention.pallas_flash import flash_attention

        return flash_attention(
            q, k, v, scale=scale, kv_mask=key_mask,
            interpret=jax.default_backend() == "cpu",
        )
    return dense_attention_base(q, k, v, scale=scale, mask=mask)


def dense_attention_base(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """The raw dense kernel (never re-dispatched — backends call this)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v)
