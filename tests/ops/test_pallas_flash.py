"""Pallas flash attention vs the dense reference (interpret mode on CPU).

Mirrors the reference's flash-backend equivalence expectation (reference
diffusion/attention/backends/flash_attn.py is numerically interchangeable
with the sdpa default): exact-tolerance parity against
dense_attention_base across masks, padding tails, head dims, and causal.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_tpu.diffusion.layers import dense_attention_base
from vllm_omni_tpu.ops.attention.pallas_flash import flash_attention


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def _check(q, k, v, kv_mask=None, causal=False, **kw):
    ref_mask = None
    if kv_mask is not None:
        ref_mask = kv_mask[:, None, :]
    if causal:
        L, Lk = q.shape[1], k.shape[1]
        tri = jnp.tril(jnp.ones((L, Lk), bool))
        ref_mask = tri[None] if ref_mask is None else (ref_mask & tri[None])
    ref = dense_attention_base(q, k, v, mask=ref_mask)
    out = flash_attention(q, k, v, kv_mask=kv_mask, causal=causal,
                          interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_unmasked_unaligned_lengths():
    # L=200, Lk=200 exercises both q and k padding tails
    q = _rand((2, 200, 3, 64), 0)
    k = _rand((2, 200, 3, 64), 1)
    v = _rand((2, 200, 3, 64), 2)
    _check(q, k, v, block_q=128, block_k=128)


def test_key_mask_and_cross_lengths():
    q = _rand((2, 130, 2, 128), 3)
    k = _rand((2, 300, 2, 128), 4)
    v = _rand((2, 300, 2, 128), 5)
    lens = np.array([300, 17])
    kv_mask = jnp.asarray(np.arange(300)[None, :] < lens[:, None])
    _check(q, k, v, kv_mask=kv_mask, block_q=128, block_k=128)


def test_causal():
    q = _rand((1, 260, 2, 64), 6)
    k = _rand((1, 260, 2, 64), 7)
    v = _rand((1, 260, 2, 64), 8)
    _check(q, k, v, causal=True, block_q=128, block_k=128)


def test_causal_with_key_mask():
    q = _rand((1, 140, 1, 64), 9)
    k = _rand((1, 140, 1, 64), 10)
    v = _rand((1, 140, 1, 64), 11)
    kv_mask = jnp.asarray(np.arange(140)[None, :] < 100)
    _check(q, k, v, kv_mask=kv_mask, causal=True, block_q=128, block_k=128)


def test_bf16_matches_dense_bf16():
    q = _rand((1, 256, 2, 128), 12).astype(jnp.bfloat16)
    k = _rand((1, 256, 2, 128), 13).astype(jnp.bfloat16)
    v = _rand((1, 256, 2, 128), 14).astype(jnp.bfloat16)
    ref = dense_attention_base(q, k, v)
    out = flash_attention(q, k, v, interpret=True,
                          block_q=128, block_k=128)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_bf16_softmax_mode():
    """softmax_dtype="bf16" (score/exp passes in bfloat16, f32 m/l
    bookkeeping + widened row sum) stays within bf16-grade tolerance of
    the dense reference — incl. a padded tail and a kv mask."""
    q = _rand((2, 200, 2, 128), 21).astype(jnp.bfloat16)
    k = _rand((2, 200, 2, 128), 22).astype(jnp.bfloat16)
    v = _rand((2, 200, 2, 128), 23).astype(jnp.bfloat16)
    mask = jnp.asarray(np.arange(200)[None, :] < 170)
    mask = jnp.broadcast_to(mask, (2, 200))
    ref = dense_attention_base(q, k, v, mask=mask[:, None, :])
    out = flash_attention(q, k, v, kv_mask=mask, interpret=True,
                          block_q=128, block_k=128, softmax_dtype="bf16")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_dispatch_threshold(monkeypatch):
    """dense_attention routes long sequences to the flash kernel."""
    import vllm_omni_tpu.diffusion.layers as layers

    monkeypatch.setenv("OMNI_TPU_FLASH_MIN_SEQ", "128")
    q = _rand((1, 200, 2, 64), 15)
    k = _rand((1, 200, 2, 64), 16)
    v = _rand((1, 200, 2, 64), 17)
    mask = jnp.asarray(np.arange(200)[None, None, :] < 150)
    out = layers.dense_attention(q, k, v, mask=jnp.broadcast_to(
        mask, (1, 1, 200)))
    ref = dense_attention_base(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
