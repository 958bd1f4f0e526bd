"""Pallas decode-shaped paged attention (one token per row).

The decode hot path previously used an XLA page gather + einsum
(ragged_paged.py ragged_paged_attention_gather). Ablation on v5e
(bench.py with attention no-op'd) showed attention costing ~1.96x of
end-to-end decode: XLA materializes the gathered [T, Hkv, L, D] pages
(padded to the full block-table bucket width) in HBM before the einsum,
so traffic is ~3-4x the live KV bytes.

This kernel streams each token's ACTUAL pages (ceil(valid/B) of them,
not the padded bucket width) straight into VMEM with a ring of
in-flight DMAs, then runs one masked softmax-attention in VMEM:

  grid = (T,): per token, row/pages from scalar-prefetched metadata
  ring of R=8 outstanding [Hkv, B, D] page copies per K and V
  scores  [Hkv, G, LMAX] f32 in VMEM (never HBM)
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
RING = 16  # in-flight page DMAs per stream (K and V each)


def _kernel(
    # scalar prefetch (SMEM)
    rows_ref,  # [T]
    pos_ref,  # [T]
    seq_lens_ref,  # [S]
    tables_ref,  # [S * MAXB]
    # inputs
    q_ref,  # [1, Hq, D] VMEM
    k_self_ref,  # [1, Hkv, D] VMEM (zeros when has_self=False)
    v_self_ref,
    k_hbm_ref,  # [Hkv, N, B, D] ANY
    v_hbm_ref,
    # outputs
    out_ref,  # [1, Hq, D] VMEM
    # scratch
    k_buf,  # [Hkv, LMAX, D] VMEM
    v_buf,
    sems,  # DMA sems [2, RING]
    *,
    scale: float,
    block_size: int,
    max_blocks: int,
    num_rows: int,
    has_self: bool,
    sliding_window: int,
):
    t = pl.program_id(0)
    B = block_size
    row = rows_ref[t]
    in_batch = row < num_rows
    row_c = jnp.where(in_batch, row, 0)
    pos = pos_ref[t]
    # valid cache positions for THIS token: strict causal when the
    # token's own K/V ride the self column (deferred write), else
    # inclusive (gather-path parity, ragged_paged.py:258-264)
    valid = jnp.minimum(seq_lens_ref[row_c], pos if has_self else pos + 1)
    valid = jnp.where(in_batch, valid, 0)
    lo = 0
    if sliding_window > 0:
        lo = jnp.maximum(pos - sliding_window + 1, 0)
    n_pages = jnp.where(valid > 0, (valid + B - 1) // B, 0)

    def dma(stream_hbm, buf, sem_row, p):
        blk = tables_ref[row_c * max_blocks + p]
        return pltpu.make_async_copy(
            stream_hbm.at[:, blk],
            buf.at[:, pl.ds(p * B, B), :],
            sems.at[sem_row, p % RING],
        )

    # pipelined page streams: start DMA p after waiting out DMA p-RING
    # on the same semaphore slot
    for p in range(max_blocks):  # static loop, predicated
        @pl.when(p < n_pages)
        def _(p=p):
            if p >= RING:
                dma(k_hbm_ref, k_buf, 0, p - RING).wait()
                dma(v_hbm_ref, v_buf, 1, p - RING).wait()
            dma(k_hbm_ref, k_buf, 0, p).start()
            dma(v_hbm_ref, v_buf, 1, p).start()

    # drain: after the loop the most recent min(n_pages, RING) DMAs are
    # outstanding, one per semaphore slot — wait each used slot once
    # (waits count sem bytes; all page copies are identically sized, so
    # the descriptor's own page index is irrelevant)
    for j in range(min(RING, max_blocks)):  # static slots
        @pl.when(j < n_pages)
        def _(j=j):
            dma(k_hbm_ref, k_buf, 0, j).wait()
            dma(v_hbm_ref, v_buf, 1, j).wait()

    Hq, D = q_ref.shape[1], q_ref.shape[2]
    Hkv = k_buf.shape[0]
    G = Hq // Hkv
    LMAX = k_buf.shape[1]

    qg = q_ref[0].reshape(Hkv, G, D)
    scores = jax.lax.dot_general(
        qg, k_buf[...], (((2,), (2,)), ((0,), (0,))),
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
            * k_self_ref[0][:, None, :].astype(jnp.float32),
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
        v_buf[...], 0).astype(v_buf.dtype)
    acc = jax.lax.dot_general(
        p_kv.astype(k_buf.dtype), v_valid,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Hkv, G, D]
    if has_self:
        p_self = jnp.exp(s_self - m)
        l = l + p_self
        acc = acc + p_self * v_self_ref[0][:, None, :].astype(jnp.float32)
    out = acc / jnp.where(l == 0.0, 1.0, l)
    if not has_self:
        out = jnp.where(in_batch, out, 0.0)
    out_ref[0] = out.reshape(Hq, D).astype(out_ref.dtype)


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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Hq, D), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, MAXB * B, D), k_cache.dtype),
            pltpu.VMEM((Hkv, MAXB * B, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, RING)),
        ],
    )
    kernel = functools.partial(
        _kernel, scale=scale, block_size=B, max_blocks=MAXB,
        num_rows=S, has_self=has_self, sliding_window=sliding_window,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, Hq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        jnp.clip(token_rows, 0, S), positions, seq_lens,
        block_tables.reshape(-1),
        q, k_self, v_self, k_cache, v_cache,
    )
