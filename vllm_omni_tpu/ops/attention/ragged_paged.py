"""Ragged paged attention — unified prefill/chunked-prefill/decode.

TPU-native replacement for the PagedAttention CUDA kernels + FlashAttention
the reference consumes from vLLM (SURVEY.md §2.10 row 1). One interface
serves every AR step: the query axis flattens all new tokens of all
sequences (ragged segments), KV lives in a paged HBM cache indexed by
per-row block tables.

Two implementations behind one signature:
- `ragged_paged_attention_ref`: pure-XLA gather/mask reference. Correct on
  any backend (CPU tests); O(S * Lmax) memory — fine for tests and small
  contexts.
- Pallas kernel in ops/attention/pallas_ragged.py for the production path
  (selected by ops.attention.backend).

Shapes:
  q            [T, Hq, D]    flattened new tokens
  k_cache      [N_blk, Hkv, B, D]   (page-major: one page is ONE
  v_cache      [N_blk, Hkv, B, D]    contiguous Hkv*B*D-byte DMA;
                                     measured ~89% of HBM peak on v5e
                                     vs ~70% head-major — see
                                     benchmarks/micro_dma.py)
  q_starts     [S] int32     token-axis start of each row's segment
  q_lens       [S] int32     segment length (0 = idle row)
  seq_lens     [S] int32     total kv len per row (incl. this step's tokens)
  block_tables [S, MAXB] int32
  positions    [T] int32     absolute position of each query token
  token_rows   [T] int32     row of each query token (S for padding)
Returns [T, Hq, D].
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def write_kv(
    k_cache: jax.Array,  # [N_blk, Hkv, B, D]
    v_cache: jax.Array,
    k_new: jax.Array,  # [T, Hkv, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [T] int32 flat slot = blk * B + off
) -> tuple[jax.Array, jax.Array]:
    """Scatter this step's K/V into the paged cache (pad tokens hit the
    reserved pad block 0, harmlessly)."""
    nb, hk, bs, d = k_cache.shape
    blk = slot_mapping // bs
    off = slot_mapping % bs
    # advanced indices at axes (0, 2) with the Hkv slice between ->
    # result/update shape [T, Hkv, D]
    k_cache = k_cache.at[blk, :, off].set(k_new.astype(k_cache.dtype))
    v_cache = v_cache.at[blk, :, off].set(v_new.astype(v_cache.dtype))
    return k_cache, v_cache


def write_kv_layer(
    k_cache: jax.Array,  # [L, N_blk, Hkv, B, D] (FULL stack, all layers)
    v_cache: jax.Array,
    layer: jax.Array,  # scalar int32 layer index
    k_new: jax.Array,  # [T, Hkv, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,  # [T] int32 flat slot = blk * B + off
) -> tuple[jax.Array, jax.Array]:
    """Scatter this step's K/V for ONE layer into the full cache stack.

    Used when the cache rides a layer-scan as CARRY: a single scatter
    into the big donated array keeps XLA's in-place analysis happy,
    whereas routing per-layer slices through scan ys re-materializes
    the ENTIRE cache every step (measured 2.4x decode slowdown at 2GB
    cache on v5e)."""
    bs = k_cache.shape[3]
    blk = slot_mapping // bs
    off = slot_mapping % bs
    # advanced indices at axes (0, 1, 3) with the Hkv slice between ->
    # result/update shape [T, Hkv, D]
    k_cache = k_cache.at[layer, blk, :, off].set(
        k_new.astype(k_cache.dtype))
    v_cache = v_cache.at[layer, blk, :, off].set(
        v_new.astype(v_cache.dtype))
    return k_cache, v_cache


def _pallas_kv_write_ok(B: int, D: int) -> bool:
    from vllm_omni_tpu import envs

    return (envs.is_tpu_platform() and D % 128 == 0 and B % 8 == 0
            and envs.kv_write_backend() != "xla")


def uses_grouped_kv_write(T: int, Hkv: int, B: int, D: int,
                          itemsize: int = 2) -> bool:
    """Single dispatch predicate for the page-grouped prefill KV-write
    kernel — shared by write_kv_auto and by callers that precompute
    `prepare_page_groups` outside a layer scan (e.g. models/qwen2.py),
    so the two conditions cannot silently diverge.

    No VMEM-size cap: the grouped kernel streams k_new/v_new as
    grid-blocked [C, Hkv, D] tiles (pre-sorted by slot), so its VMEM
    footprint is independent of T. (An earlier whole-array-staging
    variant blew the ~16 MiB scoped-vmem stack at 8k-token prefills
    and fell back to XLA scatter — 2.6x slower device time.)"""
    return _pallas_kv_write_ok(B, D) and T > 32


def write_kv_auto(
    k_cache: jax.Array,  # [L, N_blk, Hkv, B, D]
    v_cache: jax.Array,
    layer,
    k_new: jax.Array,  # [T, Hkv, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,
    groups: Optional[dict] = None,  # prepare_page_groups(slot_mapping)
) -> tuple[jax.Array, jax.Array]:
    """Layer-indexed KV write, backend-dispatched.

    On TPU every shape routes to an in-place Pallas kernel
    (pallas_kv_write.py) — XLA lowers the equivalent scatter as ~50 us
    PER INDEX WINDOW of serialized work (a 512-token prefill write
    measured 32 ms across 16 layers, ~500x off memory speed-of-light).
    Decode-shaped steps (small T) use the per-token page-RMW kernel;
    prefill-shaped steps use the page-grouped kernel (tokens sorted by
    slot, whole pages staged in VMEM, one DMA out per page) up to a
    VMEM staging cap (uses_grouped_kv_write), beyond which the XLA
    scatter takes over. Callers running the write inside a layer scan
    should precompute `groups` once outside the scan
    (prepare_page_groups) — it holds the sort of slot_mapping, which is
    loop-invariant.

    Slot-uniqueness contract: each REAL slot appears at most once in
    slot_mapping per call (the scheduler assigns each new token its own
    slot); duplicates are only the pad tokens routed to reserved pad
    block 0. The grouped kernel's full-page-coverage test counts run
    LENGTH, so duplicate real slots would skip the page read and leak
    uninitialized scratch into uncovered rows — any future caller that
    rewrites a live slot twice in one step (e.g. speculative replay)
    must re-issue as separate steps or use the XLA path."""
    T = k_new.shape[0]
    Hkv, B, D = k_cache.shape[2], k_cache.shape[3], k_cache.shape[4]
    if _pallas_kv_write_ok(B, D):
        # narrow KV caches (fp8): convert outside the kernel, the page
        # RMW itself is dtype-agnostic byte traffic
        k_new = k_new.astype(k_cache.dtype)
        v_new = v_new.astype(v_cache.dtype)

        if T <= 32:
            from vllm_omni_tpu.ops.attention.pallas_kv_write import (
                write_kv_pages,
            )

            return write_kv_pages(
                k_cache, v_cache, layer, k_new, v_new, slot_mapping)
        if uses_grouped_kv_write(T, Hkv, B, D, k_cache.dtype.itemsize):
            from vllm_omni_tpu.ops.attention.pallas_kv_write import (
                write_kv_pages_grouped,
            )

            return write_kv_pages_grouped(
                k_cache, v_cache, layer, k_new, v_new, slot_mapping,
                groups=groups)
    return write_kv_layer(
        k_cache, v_cache, layer, k_new, v_new, slot_mapping)


def commit_kv_all_layers(
    k_cache: jax.Array,  # [L, N, Hkv, B, D]
    v_cache: jax.Array,
    k_all: jax.Array,  # [L, T, Hkv, D] from a deferred-write forward
    v_all: jax.Array,
    slot_mapping: jax.Array,  # [T]
) -> tuple[jax.Array, jax.Array]:
    """Commit a deferred-write step's per-layer K/V in one shot."""
    from vllm_omni_tpu import envs

    B, D = k_cache.shape[3], k_cache.shape[4]
    T = k_all.shape[1]
    # T bound: the all-layer kernel stages k_all/v_all [L, T, Hkv, D]
    # in VMEM — fine for decode windows, not for CP-prefill-sized
    # commits (thousands of tokens), which keep the XLA scatter
    if (envs.is_tpu_platform() and T <= 64 and D % 128 == 0 and B % 8 == 0
            and envs.kv_write_backend() != "xla"):
        from vllm_omni_tpu.ops.attention.pallas_kv_write import (
            write_kv_pages_all_layers,
        )

        k_all = k_all.astype(k_cache.dtype)
        v_all = v_all.astype(v_cache.dtype)

        return write_kv_pages_all_layers(
            k_cache, v_cache, k_all, v_all, slot_mapping)
    blk = slot_mapping // B
    off = slot_mapping % B
    # advanced indices at axes (1, 3) around the Hkv slice -> update
    # shape [T, L, Hkv, D]
    k_cache = k_cache.at[:, blk, :, off].set(
        jnp.swapaxes(k_all, 0, 1).astype(k_cache.dtype))
    v_cache = v_cache.at[:, blk, :, off].set(
        jnp.swapaxes(v_all, 0, 1).astype(v_cache.dtype))
    return k_cache, v_cache


@partial(
    jax.jit,
    static_argnames=("scale", "logit_cap", "sliding_window"),
)
def ragged_paged_attention_ref(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    q_starts: jax.Array,
    q_lens: jax.Array,
    seq_lens: jax.Array,
    block_tables: jax.Array,
    positions: jax.Array,
    token_rows: jax.Array,
    scale: float,
    logit_cap: float = 0.0,
    sliding_window: int = 0,
) -> jax.Array:
    T, Hq, D = q.shape
    S, MAXB = block_tables.shape
    _, Hkv, B, _ = k_cache.shape
    G = Hq // Hkv
    L = MAXB * B  # max kv length (static)

    qf = q.astype(jnp.float32)

    def per_row(carry, s):
        out = carry
        # gather this row's pages -> [Hkv, L, D]
        blocks = block_tables[s]  # [MAXB]
        k_s = jnp.swapaxes(k_cache[blocks], 0, 1).reshape(
            Hkv, L, D).astype(jnp.float32)
        v_s = jnp.swapaxes(v_cache[blocks], 0, 1).reshape(
            Hkv, L, D).astype(jnp.float32)
        # scores for ALL query tokens vs this row's KV: [T, Hkv, G, L]
        qg = qf.reshape(T, Hkv, G, D)
        scores = jnp.einsum("thgd,hld->thgl", qg, k_s) * scale
        if logit_cap > 0.0:
            scores = logit_cap * jnp.tanh(scores / logit_cap)
        kv_pos = jnp.arange(L, dtype=jnp.int32)
        row_mask = (token_rows == s)[:, None]  # [T, 1]
        causal = kv_pos[None, :] <= positions[:, None]  # [T, L]
        valid_kv = kv_pos[None, :] < seq_lens[s]
        mask = row_mask & causal & valid_kv
        if sliding_window > 0:
            mask &= kv_pos[None, :] > positions[:, None] - sliding_window
        scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        # rows with no valid kv produce uniform garbage; zero them via mask
        any_valid = mask.any(axis=-1)[:, None, None, None]
        probs = jnp.where(any_valid, probs, 0.0)
        o_s = jnp.einsum("thgl,hld->thgd", probs, v_s).reshape(T, Hq, D)
        out = out + jnp.where(row_mask[:, :, None].reshape(T, 1, 1), o_s, 0.0)
        return out, None

    init = jnp.zeros((T, Hq, D), jnp.float32)
    out, _ = jax.lax.scan(per_row, init, jnp.arange(S))
    return out.astype(q.dtype)


@partial(
    jax.jit,
    static_argnames=("scale", "logit_cap", "sliding_window"),
)
def ragged_paged_attention_gather(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    q_starts: jax.Array,
    q_lens: jax.Array,
    seq_lens: jax.Array,
    block_tables: jax.Array,
    positions: jax.Array,
    token_rows: jax.Array,
    scale: float,
    logit_cap: float = 0.0,
    sliding_window: int = 0,
    k_self: Optional[jax.Array] = None,  # [T, Hkv, D] in-flight token KV
    v_self: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode-fast path: one batched page gather + einsum per layer.

    Rationale (profiled on v5e-1, 0.9B/batch-16 decode): the Pallas
    kernel is DMA-latency bound at q tiles of one token — ~0.5 ms/layer
    vs ~0.03 ms for a single [T, MAXB*B] gather that XLA pipelines at
    full HBM bandwidth. Per-token page gather keyed by token_rows keeps
    the math correct for ANY ragged batch (each token masks kv by its
    own `positions` contract), but memory scales with T * MAXB * B so
    dispatch restricts it to small-T (decode/mixed) batches."""
    T, Hq, D = q.shape
    S, MAXB = block_tables.shape
    _, Hkv, B, _ = k_cache.shape
    G = Hq // Hkv
    L = MAXB * B

    import os as _os
    if _os.environ.get("OMNI_TPU_ATTN_ABLATE") == "1":
        # perf-ceiling ablation ONLY (wrong numerics): skip the KV read
        return (q * 0.01).astype(q.dtype)

    rows = jnp.clip(token_rows, 0, S - 1)
    tables = block_tables[rows]  # [T, MAXB]
    # gather each token's pages: [T, MAXB, Hkv, B, D] -> [T, Hkv, L, D]
    k_t = jnp.transpose(k_cache[tables], (0, 2, 1, 3, 4)).reshape(
        T, Hkv, L, D)
    v_t = jnp.transpose(v_cache[tables], (0, 2, 1, 3, 4)).reshape(
        T, Hkv, L, D)

    qg = q.astype(jnp.float32).reshape(T, Hkv, G, D)
    scores = jnp.einsum(
        "thgd,thld->thgl", qg, k_t.astype(jnp.float32)) * scale
    if logit_cap > 0.0:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    kv_pos = jnp.arange(L, dtype=jnp.int32)
    if k_self is not None:
        # deferred write: the slot at kv_pos == position is stale (this
        # token is not committed yet) — strict causal; the self column
        # supplies the diagonal term
        mask = kv_pos[None, :] < positions[:, None]  # [T, L]
    else:
        mask = kv_pos[None, :] <= positions[:, None]  # causal [T, L]
    mask &= kv_pos[None, :] < seq_lens[rows][:, None]
    mask &= (token_rows < S)[:, None]  # padding tokens contribute nothing
    if sliding_window > 0:
        mask &= kv_pos[None, :] > positions[:, None] - sliding_window
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    if k_self is not None:
        # deferred-write decode: the current token's K/V are not in the
        # cache yet — append an explicit self column (always valid:
        # kv_pos == position satisfies causal + window)
        s_self = jnp.einsum(
            "thgd,thd->thg", qg, k_self.astype(jnp.float32))[..., None]
        s_self = s_self * scale
        if logit_cap > 0.0:
            s_self = logit_cap * jnp.tanh(s_self / logit_cap)
        scores = jnp.concatenate([scores, s_self], axis=-1)
        v_t = jnp.concatenate(
            [v_t, v_self[:, :, None, :].astype(v_t.dtype)], axis=2)
    probs = jax.nn.softmax(scores, axis=-1)
    if k_self is None:
        any_valid = mask.any(axis=-1)[:, None, None, None]
        probs = jnp.where(any_valid, probs, 0.0)
    out = jnp.einsum("thgl,thld->thgd", probs, v_t.astype(jnp.float32))
    return out.reshape(T, Hq, D).astype(q.dtype)


# gather path engages when the token axis is at most this (decode and
# small mixed batches); tunable via OMNI_TPU_GATHER_ATTN_MAX_T
_GATHER_MAX_T_DEFAULT = 32


def _pallas_supported(q, k_cache) -> bool:
    """Mosaic tiling constraints for the pallas kernel; anything else
    falls back to the XLA reference (e.g. tiny test models with
    head_dim < 128)."""
    D = q.shape[-1]
    B = k_cache.shape[-2]
    # narrow-dtype caches (fp8 KV) read through the XLA/gather paths,
    # which upcast on load; the pallas kernel dots VMEM tiles directly
    return D % 128 == 0 and B % 8 == 0 and k_cache.dtype == q.dtype


def _dequantize_pages(k_cache, v_cache, k_scale, v_scale, dtype):
    """int8 pages [..., Hkv, B, D] * per-slot scales [..., B, Hkv] ->
    `dtype` pages (XLA fallback for paths without native int8 support;
    materializes the slice it is given, so callers pass per-layer
    slices, never the stack). Scale layout is B-major so the decode
    kernel's page DMAs stay sublane-tile-aligned."""
    ks = jnp.swapaxes(k_scale, -1, -2)[..., None]  # [..., Hkv, B, 1]
    vs = jnp.swapaxes(v_scale, -1, -2)[..., None]
    k = (k_cache.astype(jnp.float32) * ks.astype(jnp.float32)).astype(dtype)
    v = (v_cache.astype(jnp.float32) * vs.astype(jnp.float32)).astype(dtype)
    return k, v


def ragged_paged_attention(
    q,
    k_cache,
    v_cache,
    q_starts,
    q_lens,
    seq_lens,
    block_tables,
    positions,
    token_rows,
    scale: float,
    logit_cap: float = 0.0,
    sliding_window: int = 0,
    backend: Optional[str] = None,
    k_self: Optional[jax.Array] = None,
    v_self: Optional[jax.Array] = None,
    layer=None,
    k_scale: Optional[jax.Array] = None,  # [(L,) N, B, Hkv] f32 —
    v_scale: Optional[jax.Array] = None,  # int8 KV cache scales
):
    """Backend-dispatching entry point. k_self/v_self (deferred-write
    decode) route to the decode-shaped paths (pallas page streaming on
    TPU, gather otherwise).

    `k_cache`/`v_cache` may be the FULL [L, N, Hkv, B, D] stack with
    `layer` the current layer index: the pallas decode kernel indexes
    [layer, block] itself, so a layer scan never slices the stack —
    slicing with a traced index makes XLA materialize a per-layer COPY
    of the multi-hundred-MB slice (measured dominating long-context
    decode). Other backends fall back to slicing here.

    int8 KV (`k_scale`/`v_scale` given): the decode kernel streams the
    int8 pages + scale pages and folds the scales into the score /
    probability rows (ops/quant.py quantize_kv); non-decode paths
    dequantize the gathered/sliced pages via XLA."""
    import os

    from vllm_omni_tpu import envs

    stacked = k_cache.ndim == 5
    quantized = k_scale is not None

    def _decode_pallas_ok():
        # KV-chunked (flash-decoding) kernel: constant VMEM in context
        # length, so there is no context cap (round-3; formerly gated at
        # MAXB * B <= 1024)
        D = q.shape[-1]
        B = k_cache.shape[-2]
        # fp8 (e4m3) KV: pages stream as raw fp8 bytes (half the HBM
        # traffic) and upcast inside the kernel; int8 KV streams pages +
        # per-slot scales (VPU-native convert — the fast capacity path)
        dtype_ok = (k_cache.dtype == q.dtype
                    or k_cache.dtype == jnp.float8_e4m3fn
                    or (k_cache.dtype == jnp.int8 and quantized))
        return (
            envs.is_tpu_platform()
            and os.environ.get("OMNI_TPU_DECODE_ATTN", "pallas") == "pallas"
            and D % 128 == 0 and B % 8 == 0
            and dtype_ok
            and logit_cap == 0.0
        )

    if k_self is not None:
        if _decode_pallas_ok():
            from vllm_omni_tpu.ops.attention.pallas_decode import (
                decode_paged_attention,
            )

            return decode_paged_attention(
                q, k_cache, v_cache, seq_lens, block_tables, positions,
                token_rows, scale=scale, k_self=k_self, v_self=v_self,
                sliding_window=sliding_window, has_self=True,
                layer=(layer if layer is not None else 0),
                k_scale=k_scale, v_scale=v_scale,
            )
        if stacked:
            k_cache, v_cache = k_cache[layer], v_cache[layer]
            if quantized:
                k_scale, v_scale = k_scale[layer], v_scale[layer]
        if quantized:
            k_cache, v_cache = _dequantize_pages(
                k_cache, v_cache, k_scale, v_scale, q.dtype)
        return ragged_paged_attention_gather(
            q, k_cache, v_cache, q_starts, q_lens, seq_lens, block_tables,
            positions, token_rows, scale=scale, logit_cap=logit_cap,
            sliding_window=sliding_window, k_self=k_self, v_self=v_self,
        )
    if backend is None:
        backend = envs.attention_backend()
    if backend == "auto":
        backend = "pallas" if envs.is_tpu_platform() else "xla"
    if backend in ("pallas", "xla"):
        import os

        max_t = int(os.environ.get(
            "OMNI_TPU_GATHER_ATTN_MAX_T", _GATHER_MAX_T_DEFAULT))
        if q.shape[0] <= max_t:
            backend = "gather"
    if backend == "pallas" and (not _pallas_supported(q, k_cache)
                                or quantized):
        # int8 KV prefill reads dequantize via XLA (the prefill kernel
        # dots VMEM tiles directly); prefill is compute-bound so the
        # dequant pass is off the critical path
        backend = "xla"
    if backend == "pallas":
        # the pallas prefill kernel also takes the stack + layer scalar
        # directly (no slice copy under the layer scan)
        from vllm_omni_tpu.ops.attention.pallas_ragged import (
            ragged_paged_attention_pallas,
        )

        return ragged_paged_attention_pallas(
            q, k_cache, v_cache, q_starts, q_lens, seq_lens, block_tables,
            positions, token_rows, scale=scale, logit_cap=logit_cap,
            sliding_window=sliding_window,
            layer=(layer if layer is not None else 0),
        )
    if stacked:
        k_cache, v_cache = k_cache[layer], v_cache[layer]
        if quantized:
            k_scale, v_scale = k_scale[layer], v_scale[layer]
    if quantized:
        k_cache, v_cache = _dequantize_pages(
            k_cache, v_cache, k_scale, v_scale, q.dtype)
    if backend == "gather":
        return ragged_paged_attention_gather(
            q, k_cache, v_cache, q_starts, q_lens, seq_lens, block_tables,
            positions, token_rows, scale=scale, logit_cap=logit_cap,
            sliding_window=sliding_window,
        )
    return ragged_paged_attention_ref(
        q, k_cache, v_cache, q_starts, q_lens, seq_lens, block_tables,
        positions, token_rows, scale=scale, logit_cap=logit_cap,
        sliding_window=sliding_window,
    )

