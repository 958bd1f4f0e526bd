"""Microbenchmark: paged-KV DMA bandwidth on the current chip.

Answers the round-3 design questions for the decode attention kernel
(VERDICT.md Weak #1 / Next #4): what HBM fraction do per-page copies
achieve at block sizes 16/32/64, head-major vs page-major layout, and
how much does a contiguous multi-page (chunk) copy win?

Each variant runs a Pallas kernel that streams N_PAGES pages from an
HBM-resident cache into a rotating VMEM chunk buffer with a deep DMA
ring and no compute; achieved GB/s = bytes_moved / wall.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HKV = 8
D = 128
RING = 16


def _per_page_kernel(tables_ref, hbm_ref, out_ref, buf, sems, *,
                     n_pages, head_major):
    """Stream n_pages single-page copies through a RING-deep sem ring."""

    def dma(p):
        blk = tables_ref[p]
        slot = p % RING
        if head_major:
            src = hbm_ref.at[:, blk]
        else:
            src = hbm_ref.at[blk]
        return pltpu.make_async_copy(src, buf.at[slot], sems.at[slot])

    for p in range(n_pages):
        if p >= RING:
            dma(p - RING).wait()
        dma(p).start()
    for j in range(min(RING, n_pages)):
        dma(j).wait()
    out_ref[0, :] = buf[0, 0, 0]


def _chunk_kernel(tables_ref, hbm_ref, out_ref, buf, sems, *,
                  n_chunks, chunk_pages):
    """Contiguous chunk copies: chunk c = pages [c*CP, (c+1)*CP)."""

    def dma(c):
        blk = tables_ref[c * chunk_pages]
        slot = c % 2
        return pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds(blk, chunk_pages)], buf.at[slot],
            sems.at[slot])

    for c in range(n_chunks):
        if c >= 2:
            dma(c - 2).wait()
        dma(c).start()
    for j in range(min(2, n_chunks)):
        dma(j).wait()
    out_ref[0, :] = buf[0, 0, 0, 0]


def _kv_pair_kernel(tables_ref, k_ref, v_ref, out_ref, buf, sems, *,
                    n_pages, combined):
    """K+V of one page: either TWO DMAs (split caches, the current
    decode-kernel schedule) or ONE DMA of a combined [N,2,Hkv,B,D]
    page (round-3 Next: halve the DMA issue count)."""

    def dma(p):
        blk = tables_ref[p]
        slot = p % RING
        if combined:
            return [pltpu.make_async_copy(k_ref.at[blk], buf.at[slot],
                                          sems.at[slot])]
        return [
            pltpu.make_async_copy(k_ref.at[blk],
                                  buf.at[slot, 0], sems.at[slot]),
            pltpu.make_async_copy(v_ref.at[blk],
                                  buf.at[slot, 1], sems.at[slot]),
        ]

    for p in range(n_pages):
        if p >= RING:
            for c in dma(p - RING):
                c.wait()
        for c in dma(p):
            c.start()
    for j in range(min(RING, n_pages)):
        for c in dma(j):
            c.wait()
    out_ref[0, :] = buf[0, 0, 0, 0]


def run_kv_pair(name, B, n_pages, combined, reps=5):
    n_blocks = n_pages + 64
    if combined:
        k = jnp.zeros((n_blocks, 2, HKV, B, D), jnp.bfloat16)
        v = jnp.zeros((1,), jnp.bfloat16)  # unused
    else:
        k = jnp.zeros((n_blocks, HKV, B, D), jnp.bfloat16)
        v = jnp.zeros((n_blocks, HKV, B, D), jnp.bfloat16)
    tables = jnp.asarray(
        (np.arange(n_pages) * 16 % n_pages).astype(np.int32))
    page_bytes = 2 * HKV * B * D * 2  # K+V
    kern = functools.partial(_kv_pair_kernel, n_pages=n_pages,
                             combined=combined)
    scratch = [
        pltpu.VMEM((RING, 2, HKV, B, D), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((RING,)),
    ]
    moved = n_pages * page_bytes

    @functools.partial(jax.jit, static_argnames=("passes",))
    def go(tables, k, v, passes):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(passes,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(tables, k, v)

    P1, P2 = 16, 144
    np.asarray(go(tables, k, v, P1))
    np.asarray(go(tables, k, v, P2))

    def timed(passes):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(go(tables, k, v, passes))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = timed(P2) - timed(P1)
    gbs = moved * (P2 - P1) / dt / 1e9
    print(f"{name:48s} {moved/1e6:8.1f} MB/pass {dt/(P2-P1)*1e3:7.3f} "
          f"ms/pass {gbs:7.1f} GB/s")
    return gbs


def run_variant(name, B, n_pages, head_major=True, chunk_pages=0,
                shuffle=True, reps=5):
    n_blocks = n_pages + 64
    if head_major:
        cache = jnp.zeros((HKV, n_blocks, B, D), jnp.bfloat16)
    else:
        cache = jnp.zeros((n_blocks, HKV, B, D), jnp.bfloat16)
    if chunk_pages:
        tables = np.arange(n_pages, dtype=np.int32)  # contiguous by design
    else:
        tables = np.arange(n_pages, dtype=np.int32)
        if shuffle:
            # decode-realistic: blocks of one row strided by the batch
            tables = (tables * 16 % n_pages).astype(np.int32)
    tables = jnp.asarray(tables)

    page_bytes = HKV * B * D * 2
    if chunk_pages:
        n_chunks = n_pages // chunk_pages
        kern = functools.partial(_chunk_kernel, n_chunks=n_chunks,
                                 chunk_pages=chunk_pages)
        scratch = [
            pltpu.VMEM((2, HKV, chunk_pages, B, D), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        moved = n_chunks * chunk_pages * page_bytes
    else:
        kern = functools.partial(_per_page_kernel, n_pages=n_pages,
                                 head_major=head_major)
        shape = (RING, HKV, B, D) if head_major else (RING, HKV, B, D)
        scratch = [
            pltpu.VMEM(shape, jnp.bfloat16),
            pltpu.SemaphoreType.DMA((RING,)),
        ]
        moved = n_pages * page_bytes

    @functools.partial(jax.jit, static_argnames=("passes",))
    def go(tables, cache, passes):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(passes,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(tables, cache)

    # difference two pass counts to cancel the fixed dispatch+fetch
    # overhead of the remote tunnel (~23 ms per sync)
    P1, P2 = 16, 144
    np.asarray(go(tables, cache, P1))  # compile + real host sync
    np.asarray(go(tables, cache, P2))

    def timed(passes):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(go(tables, cache, passes))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = timed(P2) - timed(P1)
    gbs = moved * (P2 - P1) / dt / 1e9
    print(f"{name:48s} {moved/1e6:8.1f} MB/pass {dt/(P2-P1)*1e3:7.3f} "
          f"ms/pass {gbs:7.1f} GB/s")
    return gbs


def main():
    print(f"device: {jax.devices()[0]}")
    n_tokens = 64 * 1024  # stream 64k tokens' worth of KV (one side)
    for B in (16, 32, 64):
        run_variant(f"per-page head-major B={B} strided-table", B,
                    n_tokens // B, head_major=True)
    for B in (16, 32, 64):
        run_variant(f"per-page page-major B={B} strided-table", B,
                    n_tokens // B, head_major=False)
    for cp in (8, 32):
        run_variant(f"chunk-contig head-major B=16 CP={cp}", 16,
                    n_tokens // 16, chunk_pages=cp)
    run_variant("chunk-contig head-major B=32 CP=16", 32,
                n_tokens // 32, chunk_pages=16)
    for B in (16, 32):
        run_kv_pair(f"K+V split 2-DMA page-major B={B}", B,
                    n_tokens // B, combined=False)
        run_kv_pair(f"K+V combined 1-DMA [N,2,Hkv,B,D] B={B}", B,
                    n_tokens // B, combined=True)


if __name__ == "__main__":
    main()
