"""Pallas ragged paged attention (interpret mode) vs the XLA reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_omni_tpu.ops.attention.pallas_ragged import ragged_paged_attention_pallas
from vllm_omni_tpu.ops.attention.ragged_paged import ragged_paged_attention_ref

from tests.ops.test_ragged_paged_attention import build_case


@pytest.mark.parametrize(
    "seqs,T_pad",
    [
        ([(0, 12)], 16),                      # pure prefill, one tile
        ([(12, 1)], 16),                      # pure decode
        ([(0, 7), (20, 1), (5, 3)], 16),      # mixed in one tile
        ([(0, 20), (33, 1), (8, 10)], 32),    # segments spanning tiles
    ],
)
def test_pallas_matches_reference(seqs, T_pad):
    rng = np.random.default_rng(0)
    inputs, expected, T = build_case(
        rng, seqs, Hq=4, Hkv=2, D=128, block_size=8, max_blocks=8, T_pad=T_pad
    )
    args = {k: jnp.asarray(v) for k, v in inputs.items()}
    scale = 1.0 / np.sqrt(128)
    ref = ragged_paged_attention_ref(**args, scale=scale)
    out = ragged_paged_attention_pallas(
        **args, scale=scale, q_tile=16, interpret=True
    )
    got = np.asarray(out)[:T]
    np.testing.assert_allclose(got, np.asarray(ref)[:T], rtol=2e-3, atol=2e-3)


def test_pallas_sliding_window_matches():
    rng = np.random.default_rng(2)
    inputs, _, T = build_case(
        rng, [(30, 2)], Hq=2, Hkv=2, D=128, block_size=8, max_blocks=8, T_pad=16
    )
    args = {k: jnp.asarray(v) for k, v in inputs.items()}
    ref = ragged_paged_attention_ref(**args, scale=0.1, sliding_window=9)
    out = ragged_paged_attention_pallas(
        **args, scale=0.1, sliding_window=9, q_tile=16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[:T], np.asarray(ref)[:T], rtol=2e-3, atol=2e-3
    )


def test_pallas_idle_row_gap():
    """Rows freed mid-batch leave idle gaps: the scheduler lays tokens out
    sorted by row (ADVICE r1 #1), so the kernel sees non-decreasing
    token_rows with q_len==0 holes it must skip without corrupting
    neighbours."""
    rng = np.random.default_rng(3)
    inputs, _, T = build_case(
        rng, [(0, 6), (10, 0), (14, 1), (3, 0), (5, 9)],
        Hq=4, Hkv=2, D=128, block_size=8, max_blocks=8, T_pad=16,
    )
    args = {k: jnp.asarray(v) for k, v in inputs.items()}
    scale = 1.0 / np.sqrt(128)
    ref = ragged_paged_attention_ref(**args, scale=scale)
    out = ragged_paged_attention_pallas(
        **args, scale=scale, q_tile=16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[:T], np.asarray(ref)[:T], rtol=2e-3, atol=2e-3
    )
