"""Mixture-of-Experts ops: top-k routing + grouped expert matmuls.

TPU-native replacement for the vLLM fused-MoE CUDA kernels the reference's
Qwen3OmniMoeSparseMoeBlock leans on (SURVEY.md §2.10 row 2). Two compute
paths behind one call:

- "ragged": sort tokens by expert and run jax.lax.ragged_dot grouped
  matmuls (megablox-style) — the production path; MXU-dense, O(T*K) work.
- "dense": every expert over every token with einsum + mask — O(T*E) work,
  used for tiny test configs and as a numerics oracle.

EP: under shard_map with `ep_axis`, each shard owns E/ep experts (expert
weights sharded on their leading E dim); routing is computed replicated,
non-local assignments are masked out, and shards psum their partial
outputs. Composes with TP on the expert hidden dim (`tp_axis` psum is the
caller's, fused into the same psum here when both are set).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def route_top_k(
    router_logits: jax.Array,  # [T, E] f32
    top_k: int,
    norm_topk_prob: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Returns (weights [T, K] f32, expert_idx [T, K] int32).

    Softmax over all experts first, then top-k, optionally renormalized —
    HF Qwen3-MoE semantics."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    weights, idx = jax.lax.top_k(probs, top_k)
    if norm_topk_prob:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, idx.astype(jnp.int32)


def _experts_dense(x, w_gate, w_up, w_down, weights, idx):
    T, H = x.shape
    E = w_gate.shape[0]
    K = idx.shape[1]
    # combine weights per (token, expert): [T, E]
    comb = jnp.zeros((T, E), jnp.float32)
    comb = comb.at[jnp.arange(T)[:, None], idx].add(weights)
    gate = jnp.einsum("th,ehi->tei", x, w_gate, preferred_element_type=jnp.float32)
    up = jnp.einsum("th,ehi->tei", x, w_up, preferred_element_type=jnp.float32)
    act = jax.nn.silu(gate) * up
    out = jnp.einsum(
        "tei,eih->teh", act.astype(x.dtype), w_down,
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum("te,teh->th", comb, out).astype(x.dtype)


@jax.custom_batching.custom_vmap
def _experts_ragged(x, w_gate, w_up, w_down, weights, idx):
    T, H = x.shape
    E = w_gate.shape[0]
    K = idx.shape[1]
    TK = T * K
    flat_expert = idx.reshape(TK)
    flat_token = jnp.repeat(jnp.arange(T, dtype=jnp.int32), K)
    flat_weight = weights.reshape(TK)
    # stable sort by expert id
    order = jnp.argsort(flat_expert, stable=True)
    sort_expert = flat_expert[order]
    sort_token = flat_token[order]
    sort_weight = flat_weight[order]
    xs = x[sort_token]  # [TK, H]
    group_sizes = jnp.bincount(sort_expert, length=E).astype(jnp.int32)
    gate = jax.lax.ragged_dot(xs, w_gate, group_sizes)  # [TK, I]
    up = jax.lax.ragged_dot(xs, w_up, group_sizes)
    act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
           ).astype(x.dtype)
    down = jax.lax.ragged_dot(act, w_down, group_sizes)  # [TK, H]
    contrib = down.astype(jnp.float32) * sort_weight[:, None]
    out = jnp.zeros((T, H), jnp.float32).at[sort_token].add(contrib)
    return out.astype(x.dtype)


@_experts_ragged.def_vmap
def _experts_ragged_vmap_rule(axis_size, in_batched, x, w_gate, w_up,
                              w_down, weights, idx):
    """vmap rule: flatten the mapped axis into the token axis.

    The lockstep-batched talker vmaps its forward over requests
    (talker_engine._generate_batched); without this rule ragged_dot has
    no batching rule and batched programs had to fall back to the dense
    one-hot einsum — O(T*E) expert FLOPs instead of O(T*K) (4x at
    8-expert test shapes, 8x at the 32-expert top-4 flagship talker).
    Expert weights are shared across the batch, so a [B, T] batch of
    token activations is just B*T tokens: reshape, one ragged dispatch,
    reshape back. Exact — no approximation."""
    xb, gb, ub, db, wb, ib = in_batched
    if gb or ub or db:
        raise NotImplementedError(
            "_experts_ragged: vmap over expert weights is unsupported "
            "(use impl='dense')")
    B = axis_size

    def bcast(a, batched):
        return a if batched else jnp.broadcast_to(a[None], (B,) + a.shape)

    x_ = bcast(x, xb)
    w_ = bcast(weights, wb)
    i_ = bcast(idx, ib)
    T = x_.shape[1]
    out = _experts_ragged(
        x_.reshape(B * T, x_.shape[-1]), w_gate, w_up, w_down,
        w_.reshape(B * T, w_.shape[-1]), i_.reshape(B * T, i_.shape[-1]))
    return out.reshape(B, T, out.shape[-1]), True


def moe_mlp(
    x: jax.Array,  # [T, H]
    router_w: jax.Array,  # [H, E]
    w_gate: jax.Array,  # [E_local, H, I_local]
    w_up: jax.Array,
    w_down: jax.Array,  # [E_local, I_local, H]
    top_k: int,
    norm_topk_prob: bool = True,
    ep_axis: Optional[str] = None,
    impl: str = "auto",
) -> jax.Array:
    """Routed MoE MLP. Caller psums over tp/ep axes (the returned value is
    a partial sum when ep_axis is set or w_down is row-sharded)."""
    logits = jnp.dot(x, router_w, preferred_element_type=jnp.float32)
    weights, idx = route_top_k(logits, top_k, norm_topk_prob)

    if ep_axis is not None:
        e_local = w_gate.shape[0]
        shard = jax.lax.axis_index(ep_axis)
        offset = shard * e_local
        local_idx = idx - offset
        valid = (local_idx >= 0) & (local_idx < e_local)
        idx = jnp.where(valid, local_idx, 0)
        weights = jnp.where(valid, weights, 0.0)

    if impl == "auto":
        impl = "ragged" if hasattr(jax.lax, "ragged_dot") else "dense"
    fn = _experts_ragged if impl == "ragged" else _experts_dense
    return fn(x, w_gate, w_up, w_down, weights, idx)
