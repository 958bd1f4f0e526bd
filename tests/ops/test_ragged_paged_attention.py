"""Ragged paged attention reference impl vs a naive dense oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.ops.attention.ragged_paged import (
    ragged_paged_attention_ref,
    write_kv,
)


def naive_attention(q_seq, k_seq, v_seq, scale, start_pos):
    """Dense causal attention oracle for one sequence.

    q_seq: [n, Hq, D] queries at positions start_pos..start_pos+n-1
    k_seq/v_seq: [L, Hkv, D] full context including the new tokens.
    """
    n, Hq, D = q_seq.shape
    L, Hkv, _ = k_seq.shape
    G = Hq // Hkv
    out = np.zeros((n, Hq, D), np.float32)
    for i in range(n):
        pos = start_pos + i
        for h in range(Hq):
            kh = h // G
            scores = (k_seq[: pos + 1, kh] @ q_seq[i, h]) * scale
            p = np.exp(scores - scores.max())
            p /= p.sum()
            out[i, h] = p @ v_seq[: pos + 1, kh]
    return out


def build_case(rng, seqs, Hq=4, Hkv=2, D=16, block_size=8, max_blocks=8, T_pad=None):
    """seqs: list of (ctx_len, new_len). Returns inputs + oracle output."""
    S = len(seqs)
    num_blocks = 1 + S * max_blocks
    k_cache = np.zeros((num_blocks, Hkv, block_size, D), np.float32)
    v_cache = np.zeros_like(k_cache)
    T = sum(n for _, n in seqs)
    T_pad = T_pad or T
    q = np.zeros((T_pad, Hq, D), np.float32)
    positions = np.zeros(T_pad, np.int32)
    token_rows = np.full(T_pad, S, np.int32)
    q_starts = np.zeros(S, np.int32)
    q_lens = np.zeros(S, np.int32)
    seq_lens = np.zeros(S, np.int32)
    block_tables = np.zeros((S, max_blocks), np.int32)
    expected = np.zeros((T_pad, Hq, D), np.float32)

    next_block = 1
    t = 0
    for s, (ctx, new) in enumerate(seqs):
        L = ctx + new
        nb = -(-L // block_size)
        blocks = list(range(next_block, next_block + nb))
        next_block += nb
        block_tables[s, :nb] = blocks
        k_seq = rng.normal(size=(L, Hkv, D)).astype(np.float32)
        v_seq = rng.normal(size=(L, Hkv, D)).astype(np.float32)
        for pos in range(L):
            b, off = blocks[pos // block_size], pos % block_size
            k_cache[b, :, off] = k_seq[pos]
            v_cache[b, :, off] = v_seq[pos]
        q_seq = rng.normal(size=(new, Hq, D)).astype(np.float32)
        q[t : t + new] = q_seq
        positions[t : t + new] = np.arange(ctx, L)
        token_rows[t : t + new] = s
        q_starts[s] = t
        q_lens[s] = new
        seq_lens[s] = L
        scale = 1.0 / np.sqrt(D)
        expected[t : t + new] = naive_attention(q_seq, k_seq, v_seq, scale, ctx)
        t += new
    return dict(
        q=q, k_cache=k_cache, v_cache=v_cache, q_starts=q_starts,
        q_lens=q_lens, seq_lens=seq_lens, block_tables=block_tables,
        positions=positions, token_rows=token_rows,
    ), expected, T


@pytest.mark.parametrize(
    "seqs",
    [
        [(0, 12)],                      # pure prefill
        [(12, 1)],                      # pure decode
        [(0, 7), (20, 1), (5, 3)],      # mixed: prefill + decode + chunk
        [(31, 1), (0, 1)],              # decode + empty-ctx single token
    ],
)
def test_ragged_vs_naive(seqs):
    rng = np.random.default_rng(0)
    inputs, expected, T = build_case(rng, seqs, T_pad=32)
    out = ragged_paged_attention_ref(**{k: jnp.asarray(v) for k, v in inputs.items()}, scale=1.0 / np.sqrt(16))
    np.testing.assert_allclose(np.asarray(out)[:T], expected[:T], rtol=2e-4, atol=2e-4)


def test_write_kv_scatter():
    # [Nblk=4, Hkv=2, B=8, D=16] page-major
    k_cache = jnp.zeros((4, 2, 8, 16))
    v_cache = jnp.zeros((4, 2, 8, 16))
    k_new = jnp.ones((3, 2, 16))
    v_new = jnp.full((3, 2, 16), 2.0)
    slots = jnp.array([8, 9, 17], jnp.int32)  # block1 off0, off1; block2 off1
    k2, v2 = write_kv(k_cache, v_cache, k_new, v_new, slots)
    assert float(k2[1, 0, 0, 0]) == 1.0
    assert float(k2[1, 1, 1, 0]) == 1.0
    assert float(v2[2, 1, 1, 5]) == 2.0
    assert float(k2[0, 0, 0, 0]) == 0.0


def test_sliding_window():
    rng = np.random.default_rng(1)
    inputs, _, T = build_case(rng, [(16, 1)])
    args = {k: jnp.asarray(v) for k, v in inputs.items()}
    full = ragged_paged_attention_ref(**args, scale=0.25)
    windowed = ragged_paged_attention_ref(**args, scale=0.25, sliding_window=4)
    # token at pos 16, window 4 → kv pos 13..16 only
    assert not np.allclose(np.asarray(full)[0], np.asarray(windowed)[0])


@pytest.mark.parametrize(
    "seqs",
    [
        [(12, 1)],                      # pure decode
        [(31, 1), (7, 1), (0, 1)],      # decode batch
        [(0, 7), (20, 1), (5, 3)],      # mixed: prefill + decode + chunk
        [(0, 12)],                      # pure prefill (small T still ok)
    ],
)
def test_gather_path_vs_naive(seqs):
    from vllm_omni_tpu.ops.attention.ragged_paged import (
        ragged_paged_attention_gather,
    )

    rng = np.random.default_rng(3)
    inputs, expected, T = build_case(rng, seqs, T_pad=16)
    out = ragged_paged_attention_gather(
        **{k: jnp.asarray(v) for k, v in inputs.items()},
        scale=1.0 / np.sqrt(16))
    np.testing.assert_allclose(np.asarray(out)[:T], expected[:T],
                               rtol=2e-4, atol=2e-4)


def test_gather_path_sliding_window():
    from vllm_omni_tpu.ops.attention.ragged_paged import (
        ragged_paged_attention_gather,
        ragged_paged_attention_ref,
    )

    rng = np.random.default_rng(4)
    inputs, _, T = build_case(rng, [(16, 1), (9, 2)])
    args = {k: jnp.asarray(v) for k, v in inputs.items()}
    ref = ragged_paged_attention_ref(**args, scale=0.25, sliding_window=8)
    got = ragged_paged_attention_gather(
        **args, scale=0.25, sliding_window=8)
    np.testing.assert_allclose(np.asarray(got)[:T], np.asarray(ref)[:T],
                               rtol=2e-4, atol=2e-4)
