"""Ring attention: exactness vs dense on a virtual mesh (bidirectional
and causal), plus the attention-impl hookup."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vllm_omni_tpu.diffusion.layers import dense_attention_base
from vllm_omni_tpu.parallel.ring import ring_attention


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("seq",))


def _qkv(L, H=4, D=16, B=2, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(jax.random.normal(k, (B, L, H, D), jnp.float32)
                 for k in ks)


def test_ring_matches_dense():
    n = 4
    mesh = _mesh(n)
    q, k, v = _qkv(32)
    ref = dense_attention_base(q, k, v)
    fn = jax.jit(jax.shard_map(
        lambda a, b, c: ring_attention(a, b, c, axis="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
    ))
    got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_causal_matches_dense():
    n = 4
    mesh = _mesh(n)
    q, k, v = _qkv(32, seed=1)
    L = 32
    pos = jnp.arange(L)
    mask = (pos[None, :] <= pos[:, None])[None]  # [1, L, L]
    ref = dense_attention_base(q, k, v, mask=mask)
    fn = jax.jit(jax.shard_map(
        lambda a, b, c: ring_attention(a, b, c, axis="seq", causal=True),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    ))
    got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_as_attention_impl():
    """ring installs through the DiT attention selector like ulysses."""
    from vllm_omni_tpu.diffusion.layers import (
        dense_attention,
        set_attention_impl,
    )

    n = 2
    mesh = _mesh(n)
    q, k, v = _qkv(16, seed=2)
    ref = dense_attention_base(q, k, v)

    def sharded(a, b, c):
        set_attention_impl(
            lambda q, k, v, scale, mask: ring_attention(
                q, k, v, axis="seq", scale=scale))
        try:
            return dense_attention(a, b, c)
        finally:
            set_attention_impl(None)

    fn = jax.jit(jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
    ))
    got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
