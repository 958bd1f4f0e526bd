"""Pallas in-place KV-write kernels (interpret mode) vs XLA scatter, and
the deferred-write attention self-column vs write-first reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_tpu.ops.attention.pallas_kv_write import (
    write_kv_pages,
    write_kv_pages_all_layers,
)
from vllm_omni_tpu.ops.attention.ragged_paged import (
    ragged_paged_attention_gather,
    write_kv_layer,
)

L, Hkv, N, B, D = 4, 8, 24, 16, 128


def _slots(T, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.choice(N * B - B, size=T, replace=False) + B, jnp.int32)


def test_write_kv_pages_matches_scatter():
    rng = np.random.default_rng(1)
    k0 = jnp.asarray(rng.normal(size=(L, N, Hkv, B, D)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(L, N, Hkv, B, D)), jnp.float32)
    T = 16
    k_new = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
    slots = _slots(T)

    k_ref, v_ref = write_kv_layer(k0, v0, 2, k_new, v_new, slots)
    k_got, v_got = write_kv_pages(
        k0.copy(), v0.copy(), 2, k_new, v_new, slots, interpret=True)
    np.testing.assert_array_equal(np.asarray(k_got), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))


def test_write_kv_pages_all_layers_matches_scatter():
    rng = np.random.default_rng(2)
    k0 = jnp.asarray(rng.normal(size=(L, N, Hkv, B, D)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(L, N, Hkv, B, D)), jnp.float32)
    T = 8
    k_all = jnp.asarray(rng.normal(size=(L, T, Hkv, D)), jnp.float32)
    v_all = jnp.asarray(rng.normal(size=(L, T, Hkv, D)), jnp.float32)
    slots = _slots(T, seed=3)

    k_ref, v_ref = k0, v0
    for li in range(L):
        k_ref, v_ref = write_kv_layer(
            k_ref, v_ref, li, k_all[li], v_all[li], slots)
    k_got, v_got = write_kv_pages_all_layers(
        k0.copy(), v0.copy(), k_all, v_all, slots, interpret=True)
    np.testing.assert_array_equal(np.asarray(k_got), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))


def test_same_page_multiple_tokens():
    """Two tokens landing in the same page must both persist (sequential
    grid read-modify-write)."""
    k0 = jnp.zeros((L, N, Hkv, B, D), jnp.float32)
    v0 = jnp.zeros((L, N, Hkv, B, D), jnp.float32)
    T = 4
    slots = jnp.asarray([5 * B + 1, 5 * B + 9, 7 * B, 5 * B + 2], jnp.int32)
    rng = np.random.default_rng(4)
    k_new = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
    k_got, v_got = write_kv_pages(
        k0, v0, 1, k_new, v_new, slots, interpret=True)
    for t, s in enumerate(np.asarray(slots)):
        np.testing.assert_array_equal(
            np.asarray(k_got[1, s // B, :, s % B]), np.asarray(k_new[t]))


def test_deferred_self_column_matches_write_first():
    """gather attention with k_self/v_self (cache NOT containing the
    current tokens) must equal write-first gather attention."""
    rng = np.random.default_rng(5)
    S, MAXB = 4, 3
    T = S
    k_c = jnp.asarray(rng.normal(size=(N, Hkv, B, D)), jnp.float32)
    v_c = jnp.asarray(rng.normal(size=(N, Hkv, B, D)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(T, 2 * Hkv, D)), jnp.float32)
    k_self = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
    v_self = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)

    # each row r owns blocks [3r, 3r+1, 3r+2]; current token at pos 17
    block_tables = jnp.asarray(
        [[3 * r, 3 * r + 1, 3 * r + 2] for r in range(S)], jnp.int32)
    pos = 17
    positions = jnp.full((T,), pos, jnp.int32)
    token_rows = jnp.arange(T, dtype=jnp.int32)
    seq_lens = jnp.full((S,), pos + 1, jnp.int32)
    q_lens = jnp.ones((S,), jnp.int32)
    q_starts = jnp.arange(S, dtype=jnp.int32)
    slots = jnp.asarray(
        [3 * r * B + (pos % B) + B for r in range(S)], jnp.int32)
    # (slot layout: put the token at its row's second block, offset pos%B)
    slots = block_tables[:, 1] * B + (pos % B)

    args = dict(q_starts=q_starts, q_lens=q_lens, seq_lens=seq_lens,
                block_tables=block_tables, positions=positions,
                token_rows=token_rows, scale=0.11)

    # reference: write first, then attend
    kl = k_c[None]
    vl = v_c[None]
    kl, vl = write_kv_layer(kl, vl, 0, k_self, v_self, slots)
    ref = ragged_paged_attention_gather(q, kl[0], vl[0], **args)

    got = ragged_paged_attention_gather(
        q, k_c, v_c, k_self=k_self, v_self=v_self, **args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("pattern", ["prefill", "chunked", "random"])
def test_write_kv_pages_grouped_matches_scatter(pattern):
    """Prefill-shaped page-grouped writes (full pages staged in VMEM,
    partial pages RMW) vs the XLA scatter reference, including pad
    tokens on the reserved block 0 and multi-request segments."""
    rng = np.random.default_rng(6)
    k0 = jnp.asarray(rng.normal(size=(L, N, Hkv, B, D)), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(L, N, Hkv, B, D)), jnp.float32)
    T = 64
    if pattern == "prefill":
        # two requests with contiguous slots in scattered blocks + pads
        blocks_a, blocks_b = [5, 2, 9], [11, 3]
        slots = (
            [b * B + o for b in blocks_a for o in range(B)][:40]
            + [b * B + o for b in blocks_b for o in range(B)][:19]
            + [0] * 5  # pad tokens
        )
    elif pattern == "chunked":
        # continuation chunk starting mid-block
        slots = [7 * B + o for o in range(5, B)] + \
                [4 * B + o for o in range(B)] + \
                [8 * B + o for o in range(B)]
        slots += [0] * (T - len(slots))
    else:
        slots = list(np.asarray(_slots(T, seed=7)))
    slots = jnp.asarray(np.asarray(slots, np.int32))
    k_new = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.float32)

    k_ref, v_ref = write_kv_layer(k0, v0, 2, k_new, v_new, slots)
    from vllm_omni_tpu.ops.attention.pallas_kv_write import (
        write_kv_pages_grouped,
    )

    k_got, v_got = write_kv_pages_grouped(
        k0.copy(), v0.copy(), 2, k_new, v_new, slots, interpret=True)
    # the reserved pad block 0 may legitimately hold garbage rows where
    # pad tokens fully covered it without a read — compare real blocks
    np.testing.assert_array_equal(
        np.asarray(k_got[:, 1:]), np.asarray(k_ref[:, 1:]))
    np.testing.assert_array_equal(
        np.asarray(v_got[:, 1:]), np.asarray(v_ref[:, 1:]))
    # and the pad-token rows themselves are never read, but every REAL
    # slot on block 0 (none here) would be covered by the 1: slice
