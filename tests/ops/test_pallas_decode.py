"""Decode-shaped Pallas paged attention vs the gather reference
(interpret mode on CPU; exact per-token semantics parity with
ragged_paged_attention_gather incl. the deferred-write self column)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_tpu.ops.attention.pallas_decode import decode_paged_attention
from vllm_omni_tpu.ops.attention.ragged_paged import (
    ragged_paged_attention_gather,
)


def _setup(seed, T, S, Hq, Hkv, D, B, MAXB, max_pos):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(T, Hq, D)).astype(np.float32))
    N = S * MAXB + 1
    k_cache = jnp.asarray(
        rng.normal(size=(N, Hkv, B, D)).astype(np.float32))
    v_cache = jnp.asarray(
        rng.normal(size=(N, Hkv, B, D)).astype(np.float32))
    # distinct random pages per row
    tables = rng.permutation(np.arange(1, N))[: S * MAXB].reshape(S, MAXB)
    seq_lens = rng.integers(1, max_pos, S)
    return q, k_cache, v_cache, jnp.asarray(tables, jnp.int32), jnp.asarray(
        seq_lens, jnp.int32), rng


def _check(has_self, T=6, S=6, Hq=4, Hkv=2, D=64, B=8, MAXB=5,
           sliding_window=0, with_padding=True, seed=0):
    q, kc, vc, tables, seq_lens, rng = _setup(
        seed, T, S, Hq, Hkv, D, B, MAXB, B * MAXB)
    rows = np.arange(T) % S
    if with_padding:
        rows[-1] = S  # padded token
    positions = np.asarray([int(seq_lens[r % S]) - 1 if r < S else 0
                            for r in rows], np.int32)
    token_rows = jnp.asarray(rows, jnp.int32)
    positions = jnp.asarray(positions)
    k_self = v_self = None
    if has_self:
        k_self = jnp.asarray(
            rng.normal(size=(T, Hkv, D)).astype(np.float32))
        v_self = jnp.asarray(
            rng.normal(size=(T, Hkv, D)).astype(np.float32))
    ref = ragged_paged_attention_gather(
        q, kc, vc, None, None, seq_lens, tables, positions, token_rows,
        scale=D**-0.5, sliding_window=sliding_window,
        k_self=k_self, v_self=v_self)
    got = decode_paged_attention(
        q, kc, vc, seq_lens, tables, positions, token_rows,
        scale=D**-0.5, k_self=k_self, v_self=v_self,
        sliding_window=sliding_window, has_self=has_self, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_with_self_column():
    _check(has_self=True)


def test_decode_without_self_column():
    _check(has_self=False, with_padding=False, seed=1)


def test_decode_sliding_window():
    _check(has_self=True, sliding_window=9, seed=2)


def test_decode_many_pages_ring_wraparound():
    # > RING pages per row exercises the semaphore ring reuse
    _check(has_self=True, T=4, S=4, MAXB=12, B=8, seed=3)


def test_decode_first_token_empty_cache():
    """position 0 with deferred write: only the self column attends."""
    T, S, Hq, Hkv, D, B, MAXB = 2, 2, 4, 2, 64, 8, 2
    q, kc, vc, tables, seq_lens, rng = _setup(4, T, S, Hq, Hkv, D, B,
                                              MAXB, B * MAXB)
    seq_lens = jnp.asarray([1, 1], jnp.int32)
    positions = jnp.asarray([0, 0], jnp.int32)
    token_rows = jnp.asarray([0, 1], jnp.int32)
    k_self = jnp.asarray(rng.normal(size=(T, Hkv, D)).astype(np.float32))
    v_self = jnp.asarray(rng.normal(size=(T, Hkv, D)).astype(np.float32))
    got = decode_paged_attention(
        q, kc, vc, seq_lens, tables, positions, token_rows,
        scale=D**-0.5, k_self=k_self, v_self=v_self, has_self=True,
        interpret=True)
    # softmax over one column == v_self
    expect = np.repeat(np.asarray(v_self), Hq // Hkv, axis=1)
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5)


def test_decode_multi_chunk_long_context():
    """4k-token contexts span many KV chunks (forced CT=128): the
    online-softmax combine across chunks must match the gather path
    exactly (round-3: the former MAXB*B<=1024 kernel cap is gone)."""
    T, S, Hq, Hkv, D, B, MAXB = 4, 4, 4, 2, 64, 16, 256  # 4096 tokens max
    q, kc, vc, tables, seq_lens, rng = _setup(7, T, S, Hq, Hkv, D, B,
                                              MAXB, B * MAXB)
    # force long contexts (poorly covered by the uniform draw)
    seq_lens = jnp.asarray([4096, 3999, 130, 1], jnp.int32)
    rows = np.arange(T)
    positions = jnp.asarray([int(s) - 1 for s in np.asarray(seq_lens)],
                            jnp.int32)
    token_rows = jnp.asarray(rows, jnp.int32)
    k_self = jnp.asarray(rng.normal(size=(T, Hkv, D)).astype(np.float32))
    v_self = jnp.asarray(rng.normal(size=(T, Hkv, D)).astype(np.float32))
    ref = ragged_paged_attention_gather(
        q, kc, vc, None, None, seq_lens, tables, positions, token_rows,
        scale=D**-0.5, k_self=k_self, v_self=v_self)
    got = decode_paged_attention(
        q, kc, vc, seq_lens, tables, positions, token_rows,
        scale=D**-0.5, k_self=k_self, v_self=v_self, has_self=True,
        interpret=True, chunk_tokens=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_multi_chunk_sliding_window():
    """Sliding window across chunk boundaries: whole chunks below the
    window are skipped (never DMA'd) yet the result matches gather."""
    T, S, Hq, Hkv, D, B, MAXB = 2, 2, 4, 2, 64, 16, 64  # 1024 tokens max
    q, kc, vc, tables, seq_lens, rng = _setup(8, T, S, Hq, Hkv, D, B,
                                              MAXB, B * MAXB)
    seq_lens = jnp.asarray([1000, 700], jnp.int32)
    positions = jnp.asarray([999, 699], jnp.int32)
    token_rows = jnp.asarray([0, 1], jnp.int32)
    k_self = jnp.asarray(rng.normal(size=(T, Hkv, D)).astype(np.float32))
    v_self = jnp.asarray(rng.normal(size=(T, Hkv, D)).astype(np.float32))
    ref = ragged_paged_attention_gather(
        q, kc, vc, None, None, seq_lens, tables, positions, token_rows,
        scale=D**-0.5, sliding_window=300, k_self=k_self, v_self=v_self)
    got = decode_paged_attention(
        q, kc, vc, seq_lens, tables, positions, token_rows,
        scale=D**-0.5, k_self=k_self, v_self=v_self, sliding_window=300,
        has_self=True, interpret=True, chunk_tokens=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_decode_stacked_cache_layer_index():
    """Full [L, N, Hkv, B, D] stack + layer scalar == slicing the stack
    outside (the kernel indexes [layer, block] itself so a layer scan
    never copies the per-layer slice)."""
    T, S, Hq, Hkv, D, B, MAXB, L = 4, 4, 4, 2, 64, 8, 5, 3
    q, kc, vc, tables, seq_lens, rng = _setup(9, T, S, Hq, Hkv, D, B,
                                              MAXB, B * MAXB)
    kcs = jnp.stack([kc, kc * 0.5, kc + 1.0])
    vcs = jnp.stack([vc + 2.0, vc, vc * -1.0])
    rows = np.arange(T)
    positions = jnp.asarray([int(seq_lens[r]) - 1 for r in rows], jnp.int32)
    token_rows = jnp.asarray(rows, jnp.int32)
    k_self = jnp.asarray(rng.normal(size=(T, Hkv, D)).astype(np.float32))
    v_self = jnp.asarray(rng.normal(size=(T, Hkv, D)).astype(np.float32))
    for li in range(L):
        ref = decode_paged_attention(
            q, kcs[li], vcs[li], seq_lens, tables, positions, token_rows,
            scale=D**-0.5, k_self=k_self, v_self=v_self, has_self=True,
            interpret=True)
        got = decode_paged_attention(
            q, kcs, vcs, seq_lens, tables, positions, token_rows,
            scale=D**-0.5, k_self=k_self, v_self=v_self, has_self=True,
            interpret=True, layer=li)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6)


def test_decode_fp8_kv_cache():
    """fp8 (e4m3) KV pages stream as raw bytes and upcast in VMEM; the
    result matches the gather path reading the same fp8 cache."""
    T, S, Hq, Hkv, D, B, MAXB = 4, 4, 4, 2, 64, 8, 5
    q, kc, vc, tables, seq_lens, rng = _setup(11, T, S, Hq, Hkv, D, B,
                                              MAXB, B * MAXB)
    q = q.astype(jnp.bfloat16)
    kc8 = kc.astype(jnp.float8_e4m3fn)
    vc8 = vc.astype(jnp.float8_e4m3fn)
    rows = np.arange(T)
    positions = jnp.asarray([int(seq_lens[r]) - 1 for r in rows], jnp.int32)
    token_rows = jnp.asarray(rows, jnp.int32)
    k_self = jnp.asarray(rng.normal(size=(T, Hkv, D)),
                         jnp.bfloat16)
    v_self = jnp.asarray(rng.normal(size=(T, Hkv, D)),
                         jnp.bfloat16)
    ref = ragged_paged_attention_gather(
        q, kc8, vc8, None, None, seq_lens, tables, positions, token_rows,
        scale=D**-0.5, k_self=k_self, v_self=v_self)
    got = decode_paged_attention(
        q, kc8, vc8, seq_lens, tables, positions, token_rows,
        scale=D**-0.5, k_self=k_self, v_self=v_self, has_self=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=4e-2, rtol=4e-2)
