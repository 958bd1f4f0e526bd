"""Ring attention over a sequence-sharded mesh axis.

The reference DECLARES a ring sequence-parallel strategy but never
implements it (reference diffusion/attention/parallel/factory.py:31-45
"ring strategy declared but not wired"). TPU-native implementation:
each device holds a sequence shard of Q/K/V; KV shards rotate around
the ring via `lax.ppermute` while every device accumulates
flash-attention partials with an online softmax (running max +
denominator), so peak memory is O(Ls^2 / n) per device and the
collectives ride ICI. XLA overlaps the permute with the chunk matmuls.

Supports bidirectional (DiT) and causal (AR prefill) masking; causal
masking uses global positions derived from the ring ranks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(
    q: jax.Array,  # [B, Ls, H, D] — sequence-sharded along `axis`
    k: jax.Array,
    v: jax.Array,
    axis: str,
    scale: Optional[float] = None,
    causal: bool = False,
) -> jax.Array:
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    B, Ls, H, D = q.shape

    qf = q.astype(jnp.float32)
    q_pos = my * Ls + jnp.arange(Ls)  # global query positions

    def chunk(carry, kv_rank, k_blk, v_blk):
        out, m, l = carry  # [B,H,Ls,D], [B,H,Ls], [B,H,Ls]
        scores = jnp.einsum(
            "blhd,bmhd->bhlm", qf, k_blk.astype(jnp.float32)) * scale
        if causal:
            k_pos = kv_rank * Ls + jnp.arange(Ls)
            mask = k_pos[None, :] <= q_pos[:, None]  # [Ls, Lk]
            scores = jnp.where(mask[None, None], scores, NEG_INF)
        m_blk = scores.max(axis=-1)
        m_new = jnp.maximum(m, m_blk)
        # guard fully-masked blocks (exp(NEG_INF - NEG_INF) would be 1)
        p = jnp.exp(scores - m_new[..., None])
        p = jnp.where(scores <= NEG_INF / 2, 0.0, p)
        alpha = jnp.exp(m - m_new)
        alpha = jnp.where(m <= NEG_INF / 2, 0.0, alpha)
        l_new = l * alpha + p.sum(axis=-1)
        out_new = (out * alpha[..., None]
                   + jnp.einsum("bhlm,bmhd->bhld", p,
                                v_blk.astype(jnp.float32)))
        return out_new, m_new, l_new

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, state):
        out, m, l, k_cur, v_cur = state
        kv_rank = (my - i) % n  # whose shard we currently hold
        out, m, l = chunk((out, m, l), kv_rank, k_cur, v_cur)
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        return out, m, l, k_cur, v_cur

    init = (
        jax.lax.pvary(jnp.zeros((B, H, Ls, D), jnp.float32), axis),
        jax.lax.pvary(jnp.full((B, H, Ls), NEG_INF, jnp.float32), axis),
        jax.lax.pvary(jnp.zeros((B, H, Ls), jnp.float32), axis),
        k, v,
    )
    out, m, l, _, _ = jax.lax.fori_loop(0, n, body, init)
    out = out / jnp.maximum(l[..., None], 1e-20)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # [B, Ls, H, D]
