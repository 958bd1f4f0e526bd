"""Rotary position embeddings, including multimodal M-RoPE.

Parity: the reference relies on vLLM MRotaryEmbedding plus its omni
extension computing interleaved temporal/height/width + audio positions
(reference model_executor/layers/mrope.py:415-587). Here: functional JAX —
a precomputed cos/sin table gathered by positions, with `mrope_section`
splitting the rotary dims across (t, h, w) position streams.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def rope_table(
    head_dim: int,
    max_position: int,
    theta: float = 10000.0,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables of shape [max_position, head_dim // 2]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hk, D]
    positions: jax.Array,  # [T] int32 or [3, T] for mrope (may be float)
    cos_table: jax.Array,  # [max_pos, D//2]
    sin_table: jax.Array,
    mrope_section: Optional[Sequence[int]] = None,
    interleaved: bool = False,
    theta: float = 10000.0,
) -> tuple[jax.Array, jax.Array]:
    """Rotate q/k by position-gathered cos/sin (rotate-half convention,
    matching HF Qwen2/Qwen3)."""
    if positions.ndim == 1:
        cos = cos_table[positions.astype(jnp.int32)]  # [T, D//2]
        sin = sin_table[positions.astype(jnp.int32)]
    elif interleaved:
        # Qwen3-Omni interleaved M-RoPE: per-axis angles, with the H/W
        # axes overwriting the T angles at strided frequency indices
        # [THW THW ... TT] (HF apply_interleaved_mrope). Positions may be
        # fractional (video time grids), so angles are computed directly.
        assert mrope_section is not None
        D2 = cos_table.shape[-1]
        inv_freq = 1.0 / (
            theta ** (jnp.arange(0, 2 * D2, 2, dtype=jnp.float32) / (2 * D2))
        )
        freqs = positions.astype(jnp.float32)[:, :, None] * inv_freq[None, None, :]
        freqs_t = freqs[0]
        for axis, offset in ((1, 1), (2, 2)):
            idx = jnp.arange(offset, mrope_section[axis] * 3, 3)
            freqs_t = freqs_t.at[:, idx].set(freqs[axis][:, idx])
        cos = jnp.cos(freqs_t)
        sin = jnp.sin(freqs_t)
    else:
        # M-RoPE: positions [3, T]; rotary dims split into mrope_section
        # chunks fed by the t/h/w position streams respectively
        # (reference mrope.py:415-587 semantics).
        assert mrope_section is not None, "mrope positions need mrope_section"
        pos_i = positions.astype(jnp.int32)
        cos3 = cos_table[pos_i]  # [3, T, D//2]
        sin3 = sin_table[pos_i]
        parts_c, parts_s = [], []
        start = 0
        for i, sec in enumerate(mrope_section):
            parts_c.append(cos3[i, :, start : start + sec])
            parts_s.append(sin3[i, :, start : start + sec])
            start += sec
        cos = jnp.concatenate(parts_c, axis=-1)
        sin = jnp.concatenate(parts_s, axis=-1)

    # duplicate halves: [T, D]
    cos = jnp.concatenate([cos, cos], axis=-1)[:, None, :]
    sin = jnp.concatenate([sin, sin], axis=-1)[:, None, :]
    q_dtype, k_dtype = q.dtype, k.dtype
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    q_rot = q * cos + _rotate_half(q) * sin
    k_rot = k * cos + _rotate_half(k) * sin
    return q_rot.astype(q_dtype), k_rot.astype(k_dtype)
