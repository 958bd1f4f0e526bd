"""Pallas decode-shaped paged attention (one token per row), KV-chunked.

The decode hot path previously used an XLA page gather + einsum
(ragged_paged.py ragged_paged_attention_gather). Ablation on v5e
(bench.py with attention no-op'd) showed attention costing ~1.96x of
end-to-end decode: XLA materializes the gathered [T, Hkv, L, D] pages
(padded to the full block-table bucket width) in HBM before the einsum,
so traffic is ~3-4x the live KV bytes.

This kernel streams each token's ACTUAL pages (ceil(valid/B) of them,
not the padded bucket width) straight into VMEM and runs a masked
online-softmax attention per token entirely in VMEM. Round-3 rework
(flash-decoding style, VERDICT.md Weak #1): the context is processed in
fixed-size KV chunks of CT tokens with an online-softmax combine across
chunks, so VMEM use is constant in context length — the former
``MAXB * B <= 1024`` cap is gone and any context length runs through
the kernel.

  grid = (T/2,): TWO tokens per step, each with its own chunk buffers
  and semaphore bank — their DMA streams interleave, so one token's
  page latency hides under the other's bandwidth
  per (token, K|V): NBUF=2 chunk buffers [Hkv, CT, D]; chunk c+1's page
  DMAs are issued BEFORE chunk c's compute, so the stream stays busy
  scores [Hkv, G, CT] f32 in VMEM (never HBM)
  self column for deferred-write decode (the in-flight token's K/V)

KV layout is page-major ([N, Hkv, B, D] per layer): one page is one
contiguous (Hkv*B*D)-byte DMA. Measured on v5e-1
(benchmarks/micro_dma.py): page-major per-page copies reach ~725 GB/s
(~89% of HBM peak) vs ~570 GB/s for the former head-major layout.

Traffic per token ~= its live KV bytes — the HBM floor.

Reference role: the vLLM PagedAttention v2 decode CUDA kernels with
KV-partitioned reduction (SURVEY.md §2.10 row 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# total VMEM budget for the chunk buffers (2 slots x 2 bufs x K+V)
_VMEM_BUDGET = 8 * 1024 * 1024


def _chunk_tokens(Hkv: int, D: int, itemsize: int, B: int,
                  max_len: int, nbuf: int = 2) -> int:
    """Chunk length CT (tokens): fill the VMEM budget (2 slots x nbuf
    ring buffers x K+V), multiple of B, capped at 1024 and at the
    maximum context."""
    ct = _VMEM_BUDGET // (2 * nbuf * 2 * Hkv * D * itemsize)
    ct = min(ct, 1024, max_len)
    ct = max(ct - ct % B, B)
    return ct


def _kernel(
    # scalar prefetch (SMEM)
    layer_ref,  # [1] layer index into a stacked cache (0 when unstacked)
    rows_ref,  # [Tp] (clipped; padded entries = S)
    pos_ref,  # [Tp]
    seq_lens_ref,  # [S]
    tables_ref,  # [S * MAXB]
    # inputs
    q_ref,  # [2, Hq, D] VMEM (token pair)
    k_self_ref,  # [2, Hkv, D] VMEM (zeros when has_self=False)
    v_self_ref,
    k_hbm_ref,  # [N, Hkv, B, D] ANY (page-major), or [L, N, Hkv, B, D]
    v_hbm_ref,  # stacked when `stacked` (the layer scan passes the FULL
    # cache + a layer scalar: slicing a 5-D stack with a traced index
    # inside lax.scan makes XLA materialize a per-layer COPY of the
    # slice — at multi-GB caches that copy dominated decode)
    ks_ref,  # [1, 2, MC, Hkv, CT] f32 VMEM — per-slot K scales of the
    vs_ref,  # pair's WHOLE context, pre-gathered chunk-major by XLA
    # outside the kernel (int8 KV), or None. Pre-gathering sidesteps
    # Mosaic's DMA tiling limits (a raw scale page is [B, Hkv] — its
    # sub-128 minor dim cannot be DMA'd); in-kernel access is a major-
    # dim chunk index + a tile-aligned [Hkv, CT] read, and the scale
    # bytes are ~3% of the int8 page bytes.
    # outputs
    out_ref,  # [2, Hq, D] VMEM
    # scratch
    k_buf,  # [2 slots, 2 bufs, Hkv, CT, D] VMEM
    v_buf,
    sems,  # DMA sems [2 slots, 2 streams, 2 bufs]
    *,
    scale: float,
    block_size: int,
    max_blocks: int,
    num_rows: int,
    has_self: bool,
    sliding_window: int,
    chunk_tokens: int,
    stacked: bool,
):
    quantized = ks_ref is not None
    step = pl.program_id(0)
    li = layer_ref[0]
    B = block_size
    CT = chunk_tokens
    CP = CT // B  # pages per chunk
    Hq, D = q_ref.shape[1], q_ref.shape[2]
    Hkv = k_buf.shape[2]
    G = Hq // Hkv

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
        n_chunks = (n_pages + CP - 1) // CP
        c_lo = lo // CT  # first chunk inside the sliding window
        return row_c, in_batch, valid, lo, n_chunks, c_lo

    r0, in0, valid0, lo0, nc0, clo0 = meta(0)
    r1, in1, valid1, lo1, nc1, clo1 = meta(1)

    def issue_chunk(slot, buf, row_c, valid, c, active):
        """Start the page DMAs of chunk c into buffer `buf` (static)."""
        base = c * CP
        n_pages = (valid + B - 1) // B
        n_pages_c = jnp.where(active, jnp.clip(n_pages - base, 0, CP), 0)
        for j in range(CP):
            @pl.when(j < n_pages_c)
            def _(j=j):
                blk = tables_ref[row_c * max_blocks + base + j]
                k_src = (k_hbm_ref.at[li, blk] if stacked
                         else k_hbm_ref.at[blk])
                v_src = (v_hbm_ref.at[li, blk] if stacked
                         else v_hbm_ref.at[blk])
                pltpu.make_async_copy(
                    k_src,
                    k_buf.at[slot, buf, :, pl.ds(j * B, B), :],
                    sems.at[slot, 0, buf],
                ).start()
                pltpu.make_async_copy(
                    v_src,
                    v_buf.at[slot, buf, :, pl.ds(j * B, B), :],
                    sems.at[slot, 1, buf],
                ).start()
        return n_pages_c

    def wait_chunk(slot, buf, row_c, n_pages_c):
        """Wait the page DMAs of the chunk in buffer `buf` (static).

        DMA semaphore waits consume the descriptor's BYTE count, so a
        full chunk's CP page signals are drained by ONE wait with a
        chunk-sized descriptor — per-page waits were the dominant fixed
        cost of the kernel (scalar-core serialized, ~45 ns each)."""

        @pl.when(n_pages_c == CP)
        def _():
            # chunk-sized dummy descriptor (src irrelevant for a wait;
            # only the byte count is consumed): CP pages in one wait
            pltpu.make_async_copy(
                k_buf.at[slot, buf],
                k_buf.at[slot, buf],
                sems.at[slot, 0, buf],
            ).wait()
            pltpu.make_async_copy(
                v_buf.at[slot, buf],
                v_buf.at[slot, buf],
                sems.at[slot, 1, buf],
            ).wait()

        @pl.when(n_pages_c < CP)
        def _():
            for j in range(CP):
                @pl.when(j < n_pages_c)
                def _(j=j):
                    # page-sized dummy descriptors (VMEM src=dst; only
                    # the byte count is consumed by a wait)
                    pltpu.make_async_copy(
                        k_buf.at[slot, buf, :, pl.ds(0, B), :],
                        k_buf.at[slot, buf, :, pl.ds(0, B), :],
                        sems.at[slot, 0, buf],
                    ).wait()
                    pltpu.make_async_copy(
                        v_buf.at[slot, buf, :, pl.ds(0, B), :],
                        v_buf.at[slot, buf, :, pl.ds(0, B), :],
                        sems.at[slot, 1, buf],
                    ).wait()

    def chunk_active(slot, c):
        nc = nc0 if slot == 0 else nc1
        clo = clo0 if slot == 0 else clo1
        return (c >= clo) & (c < nc)

    def compute_chunk(slot, buf, c, valid, lo, m, l, acc, qg):
        """Online-softmax fold of chunk c (already resident in `buf`)."""
        k_c = k_buf[slot, buf]  # [Hkv, CT, D]
        v_c = v_buf[slot, buf]
        if k_c.dtype != q_ref.dtype:
            # narrow KV cache: fp8 pages upcast here in VMEM; int8 pages
            # convert int8->bf16 (VPU-native on v5e, unlike the fp8
            # emulated upcast) with their per-(slot, head) scales folded
            # into the score/probability rows below — the scale is
            # constant across D, so no dequantized K/V tile ever
            # materializes: q.(k*s) = (q.k)*s and sum p*(v*s) = (p*s).v
            k_c = k_c.astype(q_ref.dtype)
            v_c = v_c.astype(q_ref.dtype)
        scores = jax.lax.dot_general(
            qg, k_c, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [Hkv, G, CT]
        if quantized:
            # pre-gathered chunk-major scales: major-dim chunk index +
            # one tile-aligned [Hkv, CT] read. Clamp: with a sliding
            # window the pair's shared iteration count can push the
            # SHORTER slot's c past its (and the buffer's) last chunk —
            # those iterations are fully masked, values irrelevant
            cc = jnp.minimum(c, ks_ref.shape[2] - 1)
            scores = scores * ks_ref[0, slot, cc][:, None, :]
        kv_pos = c * CT + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, CT), 2)
        mask = kv_pos < valid
        if sliding_window > 0:
            mask &= kv_pos >= lo
        scores = jnp.where(mask, scores, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        p = jnp.where(mask, p, 0.0)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # stale/beyond-valid V columns are zeroed so 0-probability
        # columns cannot contribute 0 * garbage(= possibly NaN)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, CT, 1), 1)
        v_valid = jnp.where((c * CT + col) < valid, v_c, 0).astype(
            v_c.dtype)
        if quantized:
            # masked columns have p == 0 but pad-page scale entries are
            # arbitrary — 0 * NaN/inf would poison the accumulator
            cc = jnp.minimum(c, vs_ref.shape[2] - 1)
            pv = jnp.where(mask, p * vs_ref[0, slot, cc][:, None, :], 0.0)
        else:
            pv = p
        acc_new = acc * alpha + jax.lax.dot_general(
            pv.astype(k_c.dtype), v_valid,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, G, D]
        return m_new, l_new, acc_new

    qg0 = q_ref[0].reshape(Hkv, G, D)
    qg1 = q_ref[1].reshape(Hkv, G, D)

    NBUF = k_buf.shape[1]  # ring depth: NBUF-1 chunks in flight

    def _issue_dyn(slot, buf, row_c, valid, c, active):
        return jax.lax.switch(
            buf, [functools.partial(issue_chunk, slot, b, row_c, valid,
                                    c, active) for b in range(NBUF)])

    def _wait_dyn(slot, buf, row_c, pc):
        jax.lax.switch(
            buf, [functools.partial(wait_chunk, slot, b, row_c, pc)
                  for b in range(NBUF)])

    def _compute_dyn(slot, buf, c, valid, lo, m, l, acc, qg):
        return jax.lax.switch(
            buf, [functools.partial(compute_chunk, slot, b, c, valid,
                                    lo, m, l, acc, qg)
                  for b in range(NBUF)])

    # prologue: chunks clo .. clo+NBUF-2 for both slots -> bufs
    # 0..NBUF-2; the two slots' page streams interleave
    pcs0 = [issue_chunk(0, b, r0, valid0, clo0 + b,
                        chunk_active(0, clo0 + b))
            for b in range(NBUF - 1)]
    pcs1 = [issue_chunk(1, b, r1, valid1, clo1 + b,
                        chunk_active(1, clo1 + b))
            for b in range(NBUF - 1)]
    zero = jnp.int32(0)
    # per-buffer in-flight page counts as [NBUF] vectors; updates/reads
    # use iota-selects (a traced-index scatter/gather does not lower in
    # Pallas TPU kernels)
    pcs0v = jnp.stack(pcs0 + [zero]).reshape(1, NBUF)
    pcs1v = jnp.stack(pcs1 + [zero]).reshape(1, NBUF)
    buf_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NBUF), 1)

    m_i = jnp.full((Hkv, G, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((Hkv, G, 1), jnp.float32)
    a_i = jnp.zeros((Hkv, G, D), jnp.float32)

    # chunk index c per slot counts from that slot's first live chunk
    # (sliding window skips whole chunks below the window)
    n_live0 = nc0 - jnp.minimum(clo0, nc0)
    n_live1 = nc1 - jnp.minimum(clo1, nc1)
    n_iter = jnp.maximum(n_live0, n_live1)

    def body(i, carry):
        m0, l0, a0, m1, l1, a1, pcs0v, pcs1v = carry
        buf = jax.lax.rem(i, NBUF)
        ibuf = jax.lax.rem(i + NBUF - 1, NBUF)
        c0, c1 = clo0 + i, clo1 + i
        # issue chunk i+NBUF-1 BEFORE computing chunk i: the target
        # buffer held chunk i-1, already consumed and waited
        npc0 = _issue_dyn(0, ibuf, r0, valid0, c0 + NBUF - 1,
                          chunk_active(0, c0 + NBUF - 1))
        npc1 = _issue_dyn(1, ibuf, r1, valid1, c1 + NBUF - 1,
                          chunk_active(1, c1 + NBUF - 1))
        pcs0v = jnp.where(buf_iota == ibuf, npc0, pcs0v)
        pcs1v = jnp.where(buf_iota == ibuf, npc1, pcs1v)
        pc0 = jnp.sum(jnp.where(buf_iota == buf, pcs0v, 0))
        pc1 = jnp.sum(jnp.where(buf_iota == buf, pcs1v, 0))
        _wait_dyn(0, buf, r0, pc0)
        _wait_dyn(1, buf, r1, pc1)
        m0, l0, a0 = _compute_dyn(0, buf, c0, valid0, lo0, m0, l0, a0,
                                  qg0)
        m1, l1, a1 = _compute_dyn(1, buf, c1, valid1, lo1, m1, l1, a1,
                                  qg1)
        return m0, l0, a0, m1, l1, a1, pcs0v, pcs1v

    m0, l0, a0, m1, l1, a1, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (m_i, l_i, a_i, m_i, l_i, a_i, pcs0v, pcs1v))

    def finalize(slot, m, l, acc, qg, in_batch):
        if has_self:
            # NOTE: like the gather path (ragged_paged.py:270-281), the
            # self column stays active even for padded tokens — their
            # outputs are discarded downstream
            s_self = (jnp.sum(
                qg.astype(jnp.float32)
                * k_self_ref[slot][:, None, :].astype(jnp.float32),
                axis=-1, keepdims=True) * scale)  # [Hkv, G, 1]
            m_f = jnp.maximum(m, s_self)
            m_f = jnp.maximum(m_f, NEG_INF / 2)
            alpha = jnp.exp(m - m_f)
            p_self = jnp.exp(s_self - m_f)
            l_f = l * alpha + p_self
            acc_f = acc * alpha + p_self * v_self_ref[slot][
                :, None, :].astype(jnp.float32)
        else:
            m_f = jnp.maximum(m, NEG_INF / 2)
            alpha = jnp.exp(m - m_f)
            l_f = l * alpha
            acc_f = acc * alpha
        out = acc_f / jnp.where(l_f == 0.0, 1.0, l_f)
        if not has_self:
            out = jnp.where(in_batch, out, 0.0)
        out_ref[slot] = out.reshape(Hq, D).astype(out_ref.dtype)

    finalize(0, m0, l0, a0, qg0, in0)
    finalize(1, m1, l1, a1, qg1, in1)


def _wrap_plain(kernel, layer_ref, rows_ref, pos_ref, seq_lens_ref,
                tables_ref, q_ref, k_self_ref, v_self_ref, k_hbm_ref,
                v_hbm_ref, out_ref, k_buf, v_buf, sems, **kw):
    kernel(layer_ref, rows_ref, pos_ref, seq_lens_ref, tables_ref,
           q_ref, k_self_ref, v_self_ref, k_hbm_ref, v_hbm_ref,
           None, None, out_ref, k_buf, v_buf, sems, **kw)


def gather_chunk_scales(scale, tables, rows, layer, CT: int):
    """XLA-side pre-gather of int8-KV scales for the decode kernel.

    scale [L, N, B, Hkv] (or [N, B, Hkv]), tables [S, MAXB],
    rows [Tp] -> [Tp, MC, Hkv, CT] f32, chunk-major: entry
    [t, m, h, j] is the scale of context slot m*CT + j for token t.
    Pad pages index the reserved pad block 0 (zero scales — masked in
    the kernel). The gathered bytes are Hkv*4 per slot vs the page's
    Hkv*D int8 bytes: ~3% extra HBM traffic at D=128."""
    if scale.ndim == 4:
        scale = scale[layer]
    N, B, Hkv = scale.shape
    S, MAXB = tables.shape
    CP = CT // B
    MC = max(1, -(-(MAXB * B) // CT))
    t = tables[jnp.clip(rows, 0, S - 1)]  # [Tp, MAXB]
    pad = MC * CP - MAXB
    if pad > 0:
        t = jnp.pad(t, ((0, 0), (0, pad)))
    g = scale[t]  # [Tp, MC*CP, B, Hkv]
    Tp = g.shape[0]
    g = g.reshape(Tp, MC, CP, B, Hkv)
    g = jnp.transpose(g, (0, 1, 4, 2, 3))  # [Tp, MC, Hkv, CP, B]
    return g.reshape(Tp, MC, Hkv, CP * B)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "has_self", "interpret",
                     "chunk_tokens", "nbuf"),
)
def decode_paged_attention(
    q: jax.Array,  # [T, Hq, D]
    k_cache: jax.Array,  # [N, Hkv, B, D] page-major, or the FULL
    v_cache: jax.Array,  # [L, N, Hkv, B, D] stack (then pass `layer`)
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
    chunk_tokens: int | None = None,  # None = auto-size to VMEM budget
    layer: jax.Array | int = 0,  # layer index for a stacked cache — the
    # kernel indexes [layer, block] itself, so a layer scan never
    # slices the stack (XLA would copy the slice per layer)
    k_scale: jax.Array | None = None,  # [(L,) N, B, Hkv] f32 per-slot
    v_scale: jax.Array | None = None,  # scales for int8 KV caches
    nbuf: int | None = None,  # DMA ring depth (default env/2)
) -> jax.Array:
    import os

    T, Hq, D = q.shape
    S, MAXB = block_tables.shape
    stacked = k_cache.ndim == 5
    _, Hkv, B, _ = k_cache.shape[1:] if stacked else k_cache.shape
    quantized = k_scale is not None
    NBUF = nbuf or int(os.environ.get("OMNI_TPU_DECODE_NBUF", 2))
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

    # chunk sizing uses the COMPUTE itemsize: narrow (fp8/int8) caches
    # stream as 1-byte pages but convert to the q dtype inside VMEM, so
    # the converted temporaries — not the stream buffers — bound the
    # chunk
    CT = chunk_tokens or _chunk_tokens(
        Hkv, D, max(k_cache.dtype.itemsize, q.dtype.itemsize), B,
        MAXB * B, NBUF)
    assert CT % B == 0, (CT, B)

    in_specs = [
        pl.BlockSpec((2, Hq, D), lambda s, *_: (s, 0, 0)),
        pl.BlockSpec((2, Hkv, D), lambda s, *_: (s, 0, 0)),
        pl.BlockSpec((2, Hkv, D), lambda s, *_: (s, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((2, NBUF, Hkv, CT, D), k_cache.dtype),
        pltpu.VMEM((2, NBUF, Hkv, CT, D), v_cache.dtype),
        pltpu.SemaphoreType.DMA((2, 2, NBUF)),
    ]
    args = [q, k_self, v_self, k_cache, v_cache]
    if quantized:
        # pre-gathered chunk-major scales ride grid-blocked VMEM inputs
        # (one pair's whole context per step; Pallas double-buffers)
        ks_g = gather_chunk_scales(k_scale, block_tables, rows, layer, CT)
        vs_g = gather_chunk_scales(v_scale, block_tables, rows, layer, CT)
        ks_g = ks_g.reshape(Tp // 2, 2, *ks_g.shape[1:])
        vs_g = vs_g.reshape(Tp // 2, 2, *vs_g.shape[1:])
        MC = ks_g.shape[2]
        in_specs += [
            pl.BlockSpec((1, 2, MC, Hkv, CT),
                         lambda s, *_: (s, 0, 0, 0, 0)),
            pl.BlockSpec((1, 2, MC, Hkv, CT),
                         lambda s, *_: (s, 0, 0, 0, 0)),
        ]
        args += [ks_g, vs_g]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(Tp // 2,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, Hq, D), lambda s, *_: (s, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel if quantized else functools.partial(_wrap_plain, _kernel),
        scale=scale, block_size=B, max_blocks=MAXB,
        num_rows=S, has_self=has_self, sliding_window=sliding_window,
        chunk_tokens=CT, stacked=stacked,
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
        jnp.asarray(layer, jnp.int32).reshape(1),
        rows, pos, seq_lens, block_tables.reshape(-1),
        *args,
    )
    return out[:T]
