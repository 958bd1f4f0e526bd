"""Pallas decode-shaped paged attention (one token per row).

The decode hot path previously used an XLA page gather + einsum
(ragged_paged.py ragged_paged_attention_gather). Ablation on v5e
(bench.py with attention no-op'd) showed attention costing ~1.96x of
end-to-end decode: XLA materializes the gathered [T, Hkv, L, D] pages
(padded to the full block-table bucket width) in HBM before the einsum,
so traffic is ~3-4x the live KV bytes.

This kernel streams each token's ACTUAL pages (ceil(valid/B) of them,
not the padded bucket width) straight into VMEM and runs one masked
softmax-attention per token in VMEM:

  grid = (T/2,): TWO tokens per step, each with its own page buffers
  and semaphore bank — their DMA streams interleave, so one token's
  page latency hides under the other's bandwidth
  ring of RING outstanding [Hkv, B, D] page copies per (token, K|V)
  scores [Hkv, G, LMAX] f32 in VMEM (never HBM)
  self column for deferred-write decode (the in-flight token's K/V)

Traffic per token ~= its live KV bytes — the HBM floor.

Reference role: the vLLM PagedAttention v1/v2 decode CUDA kernels
(SURVEY.md §2.10 row 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
RING = 16  # in-flight page DMAs per (token, stream)


def _token_attention(
    slot, q_ref, k_self_ref, v_self_ref, out_ref, k_buf, v_buf, valid,
    in_batch, lo, *, scale, has_self, sliding_window,
):
    Hq, D = q_ref.shape[1], q_ref.shape[2]
    Hkv = k_buf.shape[1]
    G = Hq // Hkv
    LMAX = k_buf.shape[2]

    qg = q_ref[slot].reshape(Hkv, G, D)
    scores = jax.lax.dot_general(
        qg, k_buf[slot], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [Hkv, G, LMAX]
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LMAX), 2)
    mask = kv_pos < valid
    if sliding_window > 0:
        mask &= kv_pos >= lo
    scores = jnp.where(mask, scores, NEG_INF)

    if has_self:
        # NOTE: like the gather path (ragged_paged.py:270-281), the self
        # column stays active even for padded tokens — their outputs are
        # discarded downstream
        s_self = (jnp.sum(
            qg.astype(jnp.float32)
            * k_self_ref[slot][:, None, :].astype(jnp.float32),
            axis=-1, keepdims=True) * scale)  # [Hkv, G, 1]
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_self)
    else:
        m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.maximum(m, NEG_INF / 2)  # fully-masked rows stay finite
    p_kv = jnp.exp(scores - m)
    p_kv = jnp.where(mask, p_kv, 0.0)
    l = jnp.sum(p_kv, axis=-1, keepdims=True)
    # beyond-valid V pages are never DMA'd: zero them so 0-probability
    # columns cannot contribute 0 * garbage(= possibly NaN) to the dot
    v_valid = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, LMAX, 1), 1) < valid,
        v_buf[slot], 0).astype(v_buf.dtype)
    acc = jax.lax.dot_general(
        p_kv.astype(k_buf.dtype), v_valid,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hkv, G, D]
    if has_self:
        p_self = jnp.exp(s_self - m)
        l = l + p_self
        acc = acc + p_self * v_self_ref[slot][:, None, :].astype(
            jnp.float32)
    out = acc / jnp.where(l == 0.0, 1.0, l)
    if not has_self:
        out = jnp.where(in_batch, out, 0.0)
    out_ref[slot] = out.reshape(Hq, D).astype(out_ref.dtype)


def _kernel(
    # scalar prefetch (SMEM)
    rows_ref,  # [Tp] (clipped; padded entries = S)
    pos_ref,  # [Tp]
    seq_lens_ref,  # [S]
    tables_ref,  # [S * MAXB]
    # inputs
    q_ref,  # [2, Hq, D] VMEM (token pair)
    k_self_ref,  # [2, Hkv, D] VMEM (zeros when has_self=False)
    v_self_ref,
    k_hbm_ref,  # [Hkv, N, B, D] ANY
    v_hbm_ref,
    # outputs
    out_ref,  # [2, Hq, D] VMEM
    # scratch
    k_buf,  # [2, Hkv, LMAX, D] VMEM (one slot per token)
    v_buf,
    sems,  # DMA sems [2 slots, 2 streams, RING]
    *,
    scale: float,
    block_size: int,
    max_blocks: int,
    num_rows: int,
    has_self: bool,
    sliding_window: int,
):
    step = pl.program_id(0)
    B = block_size

    def meta(slot):
        t = step * 2 + slot
        row = rows_ref[t]
        in_batch = row < num_rows
        row_c = jnp.where(in_batch, row, 0)
        pos = pos_ref[t]
        # strict causal when the token's own K/V ride the self column
        # (deferred write), else inclusive (gather-path parity,
        # ragged_paged.py:258-264)
        valid = jnp.minimum(
            seq_lens_ref[row_c], pos if has_self else pos + 1)
        valid = jnp.where(in_batch, valid, 0)
        lo = jnp.maximum(pos - sliding_window + 1, 0) \
            if sliding_window > 0 else 0
        n_pages = jnp.where(valid > 0, (valid + B - 1) // B, 0)
        return row_c, in_batch, valid, lo, n_pages

    r0, in0, valid0, lo0, np0 = meta(0)
    r1, in1, valid1, lo1, np1 = meta(1)

    def dma(slot, stream, row_c, p):
        hbm = k_hbm_ref if stream == 0 else v_hbm_ref
        buf = k_buf if stream == 0 else v_buf
        blk = tables_ref[row_c * max_blocks + p]
        return pltpu.make_async_copy(
            hbm.at[:, blk],
            buf.at[slot, :, pl.ds(p * B, B), :],
            sems.at[slot, stream, p % RING],
        )

    def issue(slot, row_c, n_pages, p):
        @pl.when(p < n_pages)
        def _():
            if p >= RING:
                dma(slot, 0, row_c, p - RING).wait()
                dma(slot, 1, row_c, p - RING).wait()
            dma(slot, 0, row_c, p).start()
            dma(slot, 1, row_c, p).start()

    # interleave the two tokens' page streams so their latencies overlap
    for p in range(max_blocks):  # static loop, predicated
        issue(0, r0, np0, p)
        issue(1, r1, np1, p)

    # drain: the most recent min(n_pages, RING) DMAs per slot are
    # outstanding, one per semaphore index (waits count sem bytes; all
    # page copies are identically sized, so the descriptor's own page
    # index is irrelevant)
    for j in range(min(RING, max_blocks)):
        @pl.when(j < np0)
        def _(j=j):
            dma(0, 0, r0, j).wait()
            dma(0, 1, r0, j).wait()

        @pl.when(j < np1)
        def _(j=j):
            dma(1, 0, r1, j).wait()
            dma(1, 1, r1, j).wait()

    _token_attention(
        0, q_ref, k_self_ref, v_self_ref, out_ref, k_buf, v_buf,
        valid0, in0, lo0, scale=scale, has_self=has_self,
        sliding_window=sliding_window)
    _token_attention(
        1, q_ref, k_self_ref, v_self_ref, out_ref, k_buf, v_buf,
        valid1, in1, lo1, scale=scale, has_self=has_self,
        sliding_window=sliding_window)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "has_self", "interpret"),
)
def decode_paged_attention(
    q: jax.Array,  # [T, Hq, D]
    k_cache: jax.Array,  # [Hkv, N, B, D]
    v_cache: jax.Array,
    seq_lens: jax.Array,  # [S]
    block_tables: jax.Array,  # [S, MAXB]
    positions: jax.Array,  # [T]
    token_rows: jax.Array,  # [T]
    scale: float,
    k_self: jax.Array | None = None,  # [T, Hkv, D]
    v_self: jax.Array | None = None,
    sliding_window: int = 0,
    has_self: bool = False,
    interpret: bool = False,
) -> jax.Array:
    T, Hq, D = q.shape
    S, MAXB = block_tables.shape
    Hkv, _, B, _ = k_cache.shape
    if k_self is None:
        k_self = jnp.zeros((T, Hkv, D), q.dtype)
        v_self = jnp.zeros((T, Hkv, D), q.dtype)
    Tp = T + (T % 2)  # token pairs
    if Tp != T:
        pad = [(0, 1)] + [(0, 0)] * (q.ndim - 1)
        q = jnp.pad(q, pad)
        k_self = jnp.pad(k_self, pad)
        v_self = jnp.pad(v_self, pad)
    rows = jnp.pad(jnp.clip(token_rows, 0, S), (0, Tp - T),
                   constant_values=S)
    pos = jnp.pad(positions, (0, Tp - T))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Tp // 2,),
        in_specs=[
            pl.BlockSpec((2, Hq, D), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec((2, Hkv, D), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec((2, Hkv, D), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2, Hq, D), lambda s, *_: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Hkv, MAXB * B, D), k_cache.dtype),
            pltpu.VMEM((2, Hkv, MAXB * B, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, RING)),
        ],
    )
    kernel = functools.partial(
        _kernel, scale=scale, block_size=B, max_blocks=MAXB,
        num_rows=S, has_self=has_self, sliding_window=sliding_window,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, Hq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        rows, pos, seq_lens, block_tables.reshape(-1),
        q, k_self, v_self, k_cache, v_cache,
    )
    return out[:T]
