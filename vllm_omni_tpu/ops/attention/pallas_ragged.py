"""Pallas TPU ragged paged attention kernel.

The production attention path replacing the PagedAttention CUDA kernels +
FlashAttention the reference consumes from vLLM (SURVEY.md §2.10). One
kernel serves prefill, chunked prefill, and decode in a single mixed batch.

Design (interface shared with ops/attention/ragged_paged.py):
- grid = (num_q_tiles, num_kv_heads): the token axis is cut into aligned
  TQ-sized tiles; a tile may span several sequences (ragged segments).
  Per-row segment metadata (q_starts/q_lens/seq_lens/block_tables/
  token_rows) arrives via scalar prefetch (SMEM); all per-token masks are
  derived arithmetically from it, using the scheduler contract
  position(t) = seq_len - q_len + (t - q_start)   for t in a row's segment.
- for each (tile, kv head): loop the sequences the tile touches; stream
  that row's KV pages HBM→VMEM in CHUNKS of CT tokens (CP = CT/B pages per
  chunk), double-buffered: chunk c+1's page DMAs are issued before chunk
  c's compute, and a full chunk's CP page signals are drained by ONE
  chunk-sized semaphore wait (waits consume byte counts — the same trick
  as pallas_decode.py; per-page waits and per-page online-softmax updates
  made the original per-page variant run prefill at <10% MFU: a 16-wide
  score matmul wastes the 128-lane MXU and the [R, D] accumulator rescale
  ran once per 16 tokens instead of once per CT).
- causal upper bound: a q tile only visits KV chunks up to the LAST
  visible position of its tokens (seq_len - q_len + last_tile_token), so
  prefill does the causal half of the square, not all of it.
- queries of the G = Hq/Hkv grouped heads are folded into the lane dim
  ([Hkv, T, G*D] layout) so blocks satisfy TPU tiling and the score matmul
  is [TQ*G, D] @ [D, CT] — decode still feeds the MXU reasonable tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# KV chunk size target (tokens). Each of the 2 ring slots stages a
# [CT, D] K and V tile: at CT=512/D=128/bf16 that is 512 KiB total —
# well inside the ~16 MiB scoped-vmem stack XLA budgets for the call.
_CHUNK_TOKENS = 512


def _kernel(
    # scalar prefetch (SMEM)
    layer_ref,  # [1] layer index into a stacked cache (0 when unstacked)
    q_starts_ref,  # [S]
    q_lens_ref,  # [S]
    seq_lens_ref,  # [S]
    block_tables_ref,  # [S * MAXB]
    token_rows_ref,  # [T] (only tile endpoints are read)
    # inputs
    q_ref,  # [1, TQ, G*D] VMEM tile (this kv head's q group)
    k_hbm_ref,  # [Nblk, Hkv, B, D] ANY/HBM (page-major)
    v_hbm_ref,  # [Nblk, Hkv, B, D]
    # outputs
    out_ref,  # [1, TQ, G*D] VMEM tile
    # scratch
    k_buf,  # [2, CT, D] VMEM (2 ring slots of one KV chunk each)
    v_buf,  # [2, CT, D]
    acc_ref,  # [TQ*G, D] f32
    m_ref,  # [TQ*G, 128] f32
    l_ref,  # [TQ*G, 128] f32
    sems,  # DMA sems [2, 2]: [k|v, slot]
    *,
    scale: float,
    block_size: int,
    max_blocks: int,
    num_seqs: int,
    logit_cap: float,
    sliding_window: int,
    stacked: bool,
    chunk_pages: int,
):
    li = layer_ref[0]
    qc = pl.program_id(0)
    h = pl.program_id(1)
    _, TQ, GD = q_ref.shape
    B = block_size
    CP = chunk_pages
    CT = CP * B
    D = k_buf.shape[-1]
    G = GD // D
    R = TQ * G
    t0 = qc * TQ

    # rows this tile touches (token_rows is non-decreasing; padding = S)
    rs = jnp.minimum(token_rows_ref[t0], num_seqs - 1)
    re = jnp.minimum(token_rows_ref[t0 + TQ - 1], num_seqs - 1)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    # keep q in model dtype: bf16 q/k feed the MXU natively (f32 accum);
    # the scale is applied to the f32 scores afterwards
    q = q_ref[0].reshape(R, D)

    # token index of each score row (G head-group rows per token)
    tok_idx = t0 + jax.lax.broadcasted_iota(jnp.int32, (R, CT), 0) // G
    kv_off = jax.lax.broadcasted_iota(jnp.int32, (R, CT), 1)

    def issue_chunk(slot, s, c):
        """Start the CP page DMAs of chunk c into ring slot `slot`.

        Page indices past the row's table extent are clamped — the pad
        entries point at reserved block 0, the mask zeroes their scores,
        and issuing ALL CP pages keeps the chunk's byte count constant so
        one chunk-sized wait drains the slot."""
        for p in range(CP):  # static unroll: CP DMA issues
            j = c * CP + p
            blk = block_tables_ref[
                s * max_blocks + jnp.minimum(j, max_blocks - 1)]
            ksrc = (k_hbm_ref.at[li, blk, h] if stacked
                    else k_hbm_ref.at[blk, h])  # contiguous [B, D] page
            vsrc = (v_hbm_ref.at[li, blk, h] if stacked
                    else v_hbm_ref.at[blk, h])
            pltpu.make_async_copy(
                ksrc, k_buf.at[slot, pl.ds(p * B, B)], sems.at[0, slot]
            ).start()
            pltpu.make_async_copy(
                vsrc, v_buf.at[slot, pl.ds(p * B, B)], sems.at[1, slot]
            ).start()

    def wait_chunk(slot):
        """Drain ALL CP page signals of the slot with ONE chunk-sized
        wait (DMA semaphore waits consume the descriptor's byte count —
        per-page waits were the dominant fixed cost of the old per-page
        variant; src of the dummy descriptor is irrelevant)."""
        pltpu.make_async_copy(
            k_buf.at[slot], k_buf.at[slot], sems.at[0, slot]).wait()
        pltpu.make_async_copy(
            v_buf.at[slot], v_buf.at[slot], sems.at[1, slot]).wait()

    def process_row(s, _):
        seq_len = seq_lens_ref[s]
        q_start = q_starts_ref[s]
        q_len = q_lens_ref[s]
        # tokens of row s inside this tile, and their absolute positions
        row_mask = (tok_idx >= q_start) & (tok_idx < q_start + q_len)
        tok_pos = seq_len - q_len + (tok_idx - q_start)  # [R, CT]
        # causal upper bound: the LAST tile token of this row sees
        # positions <= pos_max, so chunks past it are fully masked and
        # never streamed (prefill does the causal half, not the square)
        tmax = jnp.minimum(q_start + q_len, t0 + TQ) - 1
        pos_max = seq_len - q_len + (tmax - q_start)
        ext = jnp.minimum(seq_len, pos_max + 1)
        n_ch = pl.cdiv(ext, CT)

        def kv_step(c, _):
            slot = jax.lax.rem(c, 2)
            # prefetch next chunk while computing this one
            @pl.when(c + 1 < n_ch)
            def _():
                issue_chunk(jax.lax.rem(c + 1, 2), s, c + 1)

            wait_chunk(slot)
            k = k_buf[slot]  # [CT, D]
            v = v_buf[slot]
            scores = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [R, CT] f32
            if logit_cap > 0.0:
                scores = logit_cap * jnp.tanh(scores / logit_cap)
            kv_pos = c * CT + kv_off  # [R, CT]
            mask = row_mask & (kv_pos <= tok_pos) & (kv_pos < seq_len)
            if sliding_window > 0:
                mask &= kv_pos > tok_pos - sliding_window
            scores = jnp.where(mask, scores, NEG_INF)

            m_prev = m_ref[:, :1]  # [R, 1]
            m_cur = jnp.maximum(m_prev, jnp.max(scores, axis=1,
                                                keepdims=True))
            alpha = jnp.exp(m_prev - m_cur)
            p = jnp.exp(scores - m_cur)  # [R, CT]
            p = jnp.where(mask, p, 0.0)
            l_cur = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            m_ref[:, :1] = m_cur
            l_ref[:, :1] = l_cur
            return 0

        @pl.when((n_ch > 0) & (q_len > 0))
        def _():
            issue_chunk(0, s, 0)
            jax.lax.fori_loop(0, n_ch, kv_step, 0)

        return 0

    jax.lax.fori_loop(rs, re + 1, process_row, 0)

    l = l_ref[:, :1]
    out = jnp.where(l > 0.0, acc_ref[:] / jnp.where(l > 0.0, l, 1.0), 0.0)
    out_ref[:] = out.reshape(1, TQ, GD).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "logit_cap", "sliding_window", "q_tile",
                     "chunk_tokens", "interpret"),
)
def ragged_paged_attention_pallas(
    q: jax.Array,  # [T, Hq, D]
    k_cache: jax.Array,  # [Nblk, Hkv, B, D] page-major
    v_cache: jax.Array,
    q_starts: jax.Array,  # [S]
    q_lens: jax.Array,  # [S]
    seq_lens: jax.Array,  # [S]
    block_tables: jax.Array,  # [S, MAXB]
    positions: jax.Array,  # [T] (unused: derived from scalars in-kernel)
    token_rows: jax.Array,  # [T]
    scale: float,
    logit_cap: float = 0.0,
    sliding_window: int = 0,
    q_tile: int = 128,
    chunk_tokens: int = _CHUNK_TOKENS,
    interpret: bool = False,
    layer: jax.Array | int = 0,  # layer index for a stacked cache (the
    # kernel indexes [layer, block] itself; slicing a stack with a
    # traced index under a layer scan makes XLA copy the slice)
) -> jax.Array:
    T, Hq, D = q.shape
    stacked = k_cache.ndim == 5
    Nblk, Hkv, B, _ = k_cache.shape[1:] if stacked else k_cache.shape
    S, MAXB = block_tables.shape
    G = Hq // Hkv
    TQ = min(q_tile, T)
    assert T % TQ == 0, f"token count {T} not a multiple of tile {TQ}"
    num_tiles = T // TQ
    R = TQ * G
    # pages per chunk: aim at chunk_tokens, bounded by the table extent
    CP = max(1, min(chunk_tokens // B, MAXB))
    CT = CP * B

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_tiles, Hkv),
        in_specs=[
            pl.BlockSpec(
                (1, TQ, G * D), lambda qc, h, *_: (h, qc, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # k_cache
            pl.BlockSpec(memory_space=pl.ANY),  # v_cache
        ],
        out_specs=pl.BlockSpec(
            (1, TQ, G * D), lambda qc, h, *_: (h, qc, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CT, D), k_cache.dtype),
            pltpu.VMEM((2, CT, D), v_cache.dtype),
            pltpu.VMEM((R, D), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = functools.partial(
        _kernel,
        scale=scale,
        block_size=B,
        max_blocks=MAXB,
        num_seqs=S,
        logit_cap=logit_cap,
        sliding_window=sliding_window,
        stacked=stacked,
        chunk_pages=CP,
    )

    # GQA layout: q heads of kv group h are adjacent (i // G == h); fold the
    # group into the lane dim and lead with the kv head so blocks satisfy
    # TPU tiling: [Hkv, T, G*D].
    q_r = jnp.transpose(q.reshape(T, Hkv, G * D), (1, 0, 2))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, T, G * D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        q_starts.astype(jnp.int32),
        q_lens.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        block_tables.reshape(-1).astype(jnp.int32),
        token_rows.astype(jnp.int32),
        q_r,
        k_cache,
        v_cache,
    )
    # [Hkv, T, G*D] -> [T, Hq, D]
    return jnp.transpose(out, (1, 0, 2)).reshape(T, Hq, D)
