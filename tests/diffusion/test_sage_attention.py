"""SageAttention-style int8 DiT attention backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_tpu.diffusion.attention_backends import (
    sage_attention,
    select_attention_backend,
)
from vllm_omni_tpu.diffusion.layers import (
    dense_attention,
    dense_attention_base,
    get_attention_impl,
    set_attention_impl,
)


def _qkv(key, B=2, L=24, H=4, D=32, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, L, H, D), dtype)
    k = jax.random.normal(k2, (B, L, H, D), dtype) + 0.7  # biased K:
    v = jax.random.normal(k3, (B, L, H, D), dtype)  # smoothing matters
    return q, k, v


def test_sage_close_to_dense():
    q, k, v = _qkv(jax.random.key(0))
    ref = dense_attention_base(q, k, v)
    out = sage_attention(q, k, v)
    # int8 quantization error: probs shift slightly; outputs stay close
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 0.05, err
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.01, rel


def test_sage_smoothing_beats_naive_quant():
    """K mean-smoothing must reduce error vs quantizing raw K."""
    from vllm_omni_tpu.diffusion.attention_backends import _quant_i8

    q, k, v = _qkv(jax.random.key(1))
    ref = dense_attention_base(q, k, v)

    def naive(q, k, v):
        scale = q.shape[-1] ** -0.5
        qi, qs = _quant_i8(q)
        ki, ks = _quant_i8(k)  # no smoothing
        s = (jnp.einsum("blhd,bmhd->bhlm", qi, ki,
                        preferred_element_type=jnp.int32).astype(jnp.float32)
             * qs.transpose(0, 2, 1)[:, :, :, None]
             * ks.transpose(0, 2, 1)[:, :, None, :]) * scale
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhlm,bmhd->blhd", p, v)

    e_sage = float(jnp.linalg.norm(sage_attention(q, k, v) - ref))
    e_naive = float(jnp.linalg.norm(naive(q, k, v) - ref))
    assert e_sage < e_naive


def test_sage_respects_mask():
    q, k, v = _qkv(jax.random.key(2), L=8)
    mask = jnp.tril(jnp.ones((8, 8), bool))[None].repeat(2, 0)
    ref = dense_attention_base(q, k, v, mask=mask)
    out = sage_attention(q, k, v, mask=mask)
    assert float(jnp.max(jnp.abs(out - ref))) < 0.06


def test_selector_installs_and_restores():
    try:
        select_attention_backend("sage_attn")
        assert get_attention_impl() is sage_attention
        q, k, v = _qkv(jax.random.key(3), L=8)
        out = dense_attention(q, k, v)  # dispatches through the impl
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(sage_attention(q, k, v)))
        select_attention_backend("dense")
        assert get_attention_impl() is None
        with pytest.raises(ValueError):
            select_attention_backend("nope")
    finally:
        set_attention_impl(None)


def test_selector_env_override(monkeypatch):
    try:
        monkeypatch.setenv("DIFFUSION_ATTENTION_BACKEND", "sage")
        select_attention_backend()
        assert get_attention_impl() is sage_attention
    finally:
        set_attention_impl(None)
