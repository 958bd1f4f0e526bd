"""Pallas TPU flash attention for dense (DiT / prefill) sequences.

The reference consumes FlashAttention-2/3 CUDA kernels for its diffusion
attention backends (reference diffusion/attention/backends/flash_attn.py,
selector.py:18-77); on TPU the XLA-fused dense softmax-attention is fine
up to a few thousand tokens but materializes the [L, Lk] score matrix in
HBM beyond that. This kernel is the long-sequence path (Wan2.2 720p video
is tens of thousands of tokens): blocked online-softmax flash with the
score matrix living only in VMEM tiles.

Design:
- inputs arrive [B, L, H, D] (the repo-wide dense_attention layout) and
  are folded to [B*H, L, D]; grid = (B*H, Lq/BQ, Lk/BK) with the key axis
  innermost, so the f32 accumulator + running max/denominator scratch
  carry across key blocks and the output tile is written once, on the
  last key block (standard flash scheduling — Pallas double-buffers the
  HBM->VMEM block streams automatically).
- optional key-validity mask [B, Lk] (the joint text-image mask of
  qwen_image_transformer) rides a per-(batch, key-block) VMEM tile;
  padded tails of both axes are handled by the same mask.
- optional causal mode for AR/context-parallel prefill: key blocks fully
  above the diagonal are skipped (no MXU work), the diagonal block is
  element-masked.
- head_dim is zero-padded to the 128-lane boundary (scores are unchanged;
  padded output columns are sliced off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    q_ref,  # [1, BQ, Dp] VMEM
    k_ref,  # [1, BK, Dp]
    v_ref,  # [1, BK, Dp]
    mask_ref,  # [B, BK] bool VMEM (all batch rows of this key block), or None
    out_ref,  # [1, BQ, Dp]
    acc_ref,  # [BQ, Dp] f32 scratch
    m_ref,  # [BQ, 128] f32
    l_ref,  # [BQ, 128] f32
    *,
    scale: float,
    block_q: int,
    block_k: int,
    causal: bool,
    num_heads: int = 1,
):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    batch = pl.program_id(0) // num_heads if mask_ref is not None else 0

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # causal: the whole key block is in the future -> skip all compute
    # (queries at absolute pos iq*BQ .. iq*BQ+BQ-1, keys from ik*BK)
    run = True
    if causal:
        run = (iq + 1) * block_q - 1 >= ik * block_k

    @pl.when(run)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, BK]
        if mask_ref is not None:
            s = jnp.where(mask_ref[batch][None, :], s, NEG_INF)
        if causal:
            qpos = (jax.lax.broadcasted_iota(jnp.int32,
                                             (block_q, block_k), 0)
                    + iq * block_q)
            kpos = (jax.lax.broadcasted_iota(jnp.int32,
                                             (block_q, block_k), 1)
                    + ik * block_k)
            s = jnp.where(qpos >= kpos, s, NEG_INF)

        m_prev = m_ref[:, :1]  # [BQ, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # [BQ, 1]
        p = jnp.exp(s - m_new)  # [BQ, BK]
        # fully-masked rows: m_new stays NEG_INF; exp(0)=1 rows of p would
        # pollute l -> zero them explicitly
        p = jnp.where(m_new > NEG_INF / 2, p, 0.0)
        alpha = jnp.where(m_new > NEG_INF / 2, alpha, 0.0)

        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        out = acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
        out_ref[0] = out.astype(out_ref.dtype)


def _pad_to(x: jax.Array, axis: int, mult: int, value=0.0) -> jax.Array:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,  # [B, L, H, D]
    k: jax.Array,  # [B, Lk, H, D]
    v: jax.Array,  # [B, Lk, H, D]
    scale: float | None = None,
    kv_mask: jax.Array | None = None,  # [B, Lk] bool key validity
    causal: bool = False,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Blocked flash attention; output [B, L, H, D] matching
    dense_attention_base numerics (f32 accumulation)."""
    B, L, H, D = q.shape
    Lk = k.shape[1]
    if scale is None:
        scale = D**-0.5

    block_q = min(block_q, max(L, 8))
    block_k = min(block_k, max(Lk, 8))

    qf = _pad_to(_pad_to(
        jnp.swapaxes(q, 1, 2).reshape(B * H, L, D), 1, block_q), 2, 128)
    kf = _pad_to(_pad_to(
        jnp.swapaxes(k, 1, 2).reshape(B * H, Lk, D), 1, block_k), 2, 128)
    vf = _pad_to(_pad_to(
        jnp.swapaxes(v, 1, 2).reshape(B * H, Lk, D), 1, block_k), 2, 128)
    Lq_p, Dp = qf.shape[1], qf.shape[2]
    Lk_p = kf.shape[1]

    need_mask = kv_mask is not None or Lk_p != Lk
    mask_p = None
    if need_mask:
        if kv_mask is None:
            kv_mask = jnp.ones((B, Lk), bool)
        mask_p = _pad_to(kv_mask.astype(jnp.bool_), 1, block_k, False)

    grid = (B * H, Lq_p // block_q, Lk_p // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, Dp), lambda bh, iq, ik: (bh, iq, 0)),
        pl.BlockSpec((1, block_k, Dp), lambda bh, iq, ik: (bh, ik, 0)),
        pl.BlockSpec((1, block_k, Dp), lambda bh, iq, ik: (bh, ik, 0)),
    ]
    args = [qf, kf, vf]
    if need_mask:
        # all batch rows of the key block: a (1, BK) block would violate
        # the TPU (8, 128) sublane tiling when B > 1 — the kernel picks
        # its row as program_id(0) // H
        in_specs.append(
            pl.BlockSpec((B, block_k), lambda bh, iq, ik: (0, ik)))
        args.append(mask_p)

    kernel = functools.partial(
        _kernel if need_mask else
        functools.partial(_wrap_nomask, _kernel),
        scale=scale, block_q=block_q, block_k=block_k, causal=causal,
        num_heads=H,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, Dp),
                               lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq_p, Dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, Dp), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    out = out[:, :L, :D].reshape(B, H, L, D)
    return jnp.swapaxes(out, 1, 2)


def _wrap_nomask(kernel, q_ref, k_ref, v_ref, out_ref, acc, m, l, **kw):
    kernel(q_ref, k_ref, v_ref, None, out_ref, acc, m, l, **kw)

