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
- the kernel is VPU-bound at production shapes (the two MXU matmuls per
  tile cost ~1.4 us; each elementwise f32 pass over the [BQ, BK] score
  tile costs ~0.5 us, and exp is several) — so the schedule minimizes
  score-tile passes: the softmax scale is folded into the q tile (64x
  fewer elements), padded-tail masking runs via a kpos iota ONLY in the
  last key block (no mask array, no per-block `where`), and the
  fully-masked-row guards exist only in explicit-kv_mask mode (a padded
  tail always leaves >=1 valid key per row; masked columns die through
  exp(NEG_INF - m) = 0 on their own). Measured on v5e at
  [2, 20880, 24, 128]: 37 -> 85+ TFLOP/s.
- optional key-validity mask [B, Lk] (the joint text-image mask of
  qwen_image_transformer) rides a per-(batch, key-block) VMEM tile.
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
LOG2E = 1.4426950408889634


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
    lk_valid: int,
    num_heads: int = 1,
    softmax_dtype=jnp.float32,
):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    batch = pl.program_id(0) // num_heads if mask_ref is not None else 0
    # does the LAST key block carry padded columns? (static)
    has_tail = lk_valid % block_k != 0

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

    def compute(masked_tail: bool):
        # softmax runs in the exp2 domain: log2(e) folds into the same
        # per-q-tile scale multiply (one [BQ, D] pass), so the big
        # [BQ, BK] exp pass is a bare exp2 — jnp.exp would spend an
        # extra VPU multiply per score element on x*log2e itself
        q = q_ref[0] * jnp.asarray(scale * LOG2E, q_ref.dtype)
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            # the MXU accumulates in 32-bit only (Mosaic rejects a bf16
            # acc); bf16 softmax mode converts the tile once here and
            # runs the max/exp/mask passes at half VMEM width
            preferred_element_type=jnp.float32,
        ).astype(softmax_dtype)  # [BQ, BK] log2-domain scores
        guarded = mask_ref is not None
        if mask_ref is not None:
            s = jnp.where(mask_ref[batch][None, :], s,
                          jnp.asarray(NEG_INF, softmax_dtype))
        elif masked_tail:
            kpos = (jax.lax.broadcasted_iota(jnp.int32,
                                             (block_q, block_k), 1)
                    + ik * block_k)
            s = jnp.where(kpos < lk_valid, s,
                          jnp.asarray(NEG_INF, softmax_dtype))
        if causal:
            qpos = (jax.lax.broadcasted_iota(jnp.int32,
                                             (block_q, block_k), 0)
                    + iq * block_q)
            kpos = (jax.lax.broadcasted_iota(jnp.int32,
                                             (block_q, block_k), 1)
                    + ik * block_k)
            s = jnp.where(qpos >= kpos, s,
                          jnp.asarray(NEG_INF, softmax_dtype))
            # padded q rows above Lk can be fully masked; their l stays 0
            # and finalize guards the divide — no per-tile guard needed

        m_prev = m_ref[:, :1]  # [BQ, 1] f32, log2 domain
        m_cur = jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)  # [BQ, 1]
        p = jnp.exp2(s - m_new.astype(softmax_dtype))  # [BQ, BK]
        if guarded:
            # an explicit kv_mask can invalidate EVERY key a row sees:
            # m_new stays NEG_INF and exp2(0)=1 rows of p would pollute l
            p = jnp.where(m_new > NEG_INF / 2,
                          p, jnp.asarray(0.0, p.dtype))
            alpha = jnp.where(m_new > NEG_INF / 2, alpha, 0.0)
        # without an explicit mask, no row can be fully masked: causal
        # rows always see key 0 (qpos >= 0) in their first block, and a
        # padded tail still leaves keys [0, Lk) valid — masked columns
        # die through exp2(NEG_INF - m) = 0 with no extra pass

        l_new = alpha * l_ref[:, :1] + jnp.sum(
            p, axis=-1, keepdims=True, dtype=jnp.float32)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    if mask_ref is not None or not has_tail:
        # single branch: explicit mask every block, or no padding at all

        @pl.when(run)
        def _compute():
            compute(masked_tail=False)

    else:
        # pad-tail only: full-speed branch for interior key blocks, the
        # iota-masked branch only for the last one

        @pl.when(run & (ik < nk - 1))
        def _interior():
            compute(masked_tail=False)

        @pl.when(run & (ik == nk - 1))
        def _tail():
            compute(masked_tail=True)

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
    static_argnames=("scale", "causal", "block_q", "block_k",
                     "softmax_dtype", "interpret"),
)
def flash_attention(
    q: jax.Array,  # [B, L, H, D]
    k: jax.Array,  # [B, Lk, H, D]
    v: jax.Array,  # [B, Lk, H, D]
    scale: float | None = None,
    kv_mask: jax.Array | None = None,  # [B, Lk] bool key validity
    causal: bool = False,
    # v5e sweep at [2, 21120, 24, 128] (benchmarks/micro_flash.py, r5):
    # (1024, 2048) = 137 TFLOP/s vs 131 for (512, 2048) and 52 for the
    # old (256, 512) — the kernel is VPU-bound in the softmax passes, so
    # bigger tiles amortize per-tile bookkeeping; (1024, 4096) f32 blows
    # the 16 MiB scoped-vmem stack
    block_q: int = 1024,
    block_k: int = 2048,
    # "bf16" runs the [BQ, BK] score/exp passes in bfloat16 (the m/l
    # bookkeeping and the output accumulator stay f32, and the row sum
    # widens to f32): halves the VPU-bound score-tile traffic and drops
    # the p->bf16 convert pass before the PV matmul. Opt-in accuracy
    # trade (post-max-subtraction exp2 outputs live in (0, 1], so the
    # error is ~2^-9 relative on the softmax weights).
    softmax_dtype: str = "f32",
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

    # padding alone needs NO mask array: the kernel masks the tail of the
    # last key block with an iota compare (interior blocks run unmasked)
    need_mask = kv_mask is not None
    mask_p = None
    if need_mask:
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
        lk_valid=Lk, num_heads=H,
        softmax_dtype=(jnp.bfloat16 if softmax_dtype == "bf16"
                       else jnp.float32),
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
        compiler_params=pltpu.CompilerParams(
            # bh/iq carry no state between steps; only the key axis is
            # sequential (m/l/acc accumulate across it)
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    out = out[:, :L, :D].reshape(B, H, L, D)
    return jnp.swapaxes(out, 1, 2)


def _wrap_nomask(kernel, q_ref, k_ref, v_ref, out_ref, acc, m, l, **kw):
    kernel(q_ref, k_ref, v_ref, None, out_ref, acc, m, l, **kw)
