"""DiT attention backends: quantized (sage-style int8) + selector.

Parity with the reference's backend zoo (reference diffusion/attention/
backends/{flash_attn,sage_attn,sdpa}.py + selector.py:18-77 with the
DIFFUSION_ATTENTION_BACKEND env override). On TPU the default dense
kernel already flash-fuses under XLA, so the interesting extra backend
is the SageAttention-style INT8 path:

- K is mean-smoothed along the sequence axis: subtracting a per-head
  mean vector shifts every logit of a query row by the same constant
  (q . mean_k), so softmax is invariant — but the int8 quantization
  error drops a lot because K values center on zero.
- Q and K quantize per token to int8 (absmax / 127 scales); QK^T runs
  as an int8 x int8 -> int32 dot, which the MXU executes at ~2x bf16
  throughput. Scores dequantize with the outer product of scales.
- softmax in fp32; P @ V stays bf16 (sage-v1 semantics).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_omni_tpu.diffusion.layers import (
    dense_attention_base,
    set_attention_impl,
)


def _quant_i8(x: jax.Array):
    """Per-token symmetric int8 quantization along the last axis."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = (absmax / 127.0).astype(jnp.float32) + 1e-8
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale[..., 0]  # scales [..., L, H]


def sage_attention(
    q: jax.Array,  # [B, L, H, D]
    k: jax.Array,  # [B, Lk, H, D]
    v: jax.Array,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # softmax-invariant K smoothing (see module docstring)
    k_smooth = k - jnp.mean(k, axis=1, keepdims=True)
    qi, qs = _quant_i8(q)
    ki, ks = _quant_i8(k_smooth)
    scores_i32 = jnp.einsum(
        "blhd,bmhd->bhlm", qi, ki, preferred_element_type=jnp.int32)
    # dequant: per-(query, key) scale outer product
    scores = (scores_i32.astype(jnp.float32)
              * qs.transpose(0, 2, 1)[:, :, :, None]
              * ks.transpose(0, 2, 1)[:, :, None, :]) * scale
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v)


_BACKENDS = {
    # TPU default: XLA flash-fuses the dense kernel
    "": None,
    "dense": None,
    "flash_attn": None,
    "sdpa": None,
    "sage_attn": sage_attention,
    "sage": sage_attention,
}


def select_attention_backend(name: Optional[str] = None) -> None:
    """Install a DiT attention backend by name (reference selector.py:
    18-77; DIFFUSION_ATTENTION_BACKEND env parity). None/'' restores
    the default dense kernel."""
    if name is None:
        name = os.environ.get("DIFFUSION_ATTENTION_BACKEND", "")
    key = (name or "").lower()
    if key not in _BACKENDS:
        raise ValueError(
            f"unknown attention backend {name!r}; "
            f"available: {sorted(_BACKENDS)}")
    set_attention_impl(_BACKENDS[key])


__all__ = ["sage_attention", "select_attention_backend",
           "dense_attention_base"]
