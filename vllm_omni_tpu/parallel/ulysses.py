"""Ulysses sequence parallelism for DiT attention (TPU-native).

Parity: UlyssesParallelAttention (reference diffusion/attention/
parallel/ulysses.py:59-135) — sequence-sharded activations are
all-to-all'ed to head-sharded QKV before the kernel and back after.
On TPU the SeqAllToAll4D/5D primitives (reference comm.py:12-221)
collapse to `jax.lax.all_to_all` over a named mesh axis inside
`shard_map`, riding ICI.

The reference declares a ring strategy but does not implement it
(reference attention/parallel/factory.py:31-45); ring attention lands
as a Pallas kernel with collective-permute KV rotation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ulysses_attention(
    q: jax.Array,  # [B, Ls, H, D] — seq-sharded along `axis`
    k: jax.Array,
    v: jax.Array,
    axis: str,
    scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,  # [B, Ls*n, Lk*n] full-seq mask
) -> jax.Array:
    """Dense attention under Ulysses SP: all-to-all seq->heads, dense
    attention over the full sequence with H/n local heads, all-to-all
    back. Heads and the global sequence must divide the axis size."""
    from vllm_omni_tpu.diffusion.layers import dense_attention_base

    n = jax.lax.axis_size(axis)
    if q.shape[2] % n:
        raise ValueError(f"heads {q.shape[2]} not divisible by axis {n}")

    def fwd(x):
        # [B, Ls, H, D] -> [B, Ls*n, H/n, D]: split heads, gather seq
        return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                  tiled=True)

    def rev(x):
        # [B, L, H/n, D] -> [B, L/n, H, D]
        return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                  tiled=True)

    o = dense_attention_base(fwd(q), fwd(k), fwd(v), scale=scale, mask=mask)
    return rev(o)
