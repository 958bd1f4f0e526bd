"""Shared functional building blocks for AR decoders.

TPU-first conventions:
- parameters are plain pytrees (nested dicts of jax arrays), weights stored
  [in, out] so the hot path is `x @ w` (MXU-friendly, no transposes);
- decoder layers are scanned (stacked leading L axis) for fast compiles;
- norms compute in fp32, matmuls in the param dtype (bf16 by default) with
  fp32 accumulation via preferred_element_type.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    if isinstance(w, dict) and "q" in w:
        # weight-only int8 (ops/quant.py): dequant fuses into the dot's
        # operand pipeline, so only int8 weights stream from HBM
        wd = (w["q"].astype(jnp.float32) * w["s"][None, :]).astype(x.dtype)
        out = jnp.dot(x, wd, preferred_element_type=jnp.float32)
    else:
        out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def swiglu_mlp(x: jax.Array, p: Params) -> jax.Array:
    gate = linear(x, p["gate_proj"])
    up = linear(x, p["up_proj"])
    return linear(jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up, p["down_proj"])


def embed(token_ids: jax.Array, embedding: jax.Array) -> jax.Array:
    return embedding[token_ids]


def unembed(hidden: jax.Array, lm_head: jax.Array) -> jax.Array:
    return jnp.dot(
        hidden, lm_head, preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------- init utils
def dense_init(rng, in_dim: int, out_dim: int, dtype, bias: bool = False):
    k1, _ = jax.random.split(rng)
    scale = (2.0 / (in_dim + out_dim)) ** 0.5
    w = (jax.random.normal(k1, (in_dim, out_dim), jnp.float32) * scale).astype(dtype)
    if bias:
        return {"w": w, "b": jnp.zeros((out_dim,), dtype)}
    return w
