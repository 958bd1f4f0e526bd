import numpy as np
import jax.numpy as jnp

from vllm_omni_tpu.ops.rope import apply_rope, rope_table


def hf_rope_oracle(x, positions, theta, head_dim):
    """HF rotate-half RoPE for [T, H, D]."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    freqs = np.outer(positions, inv)  # [T, D/2]
    cos = np.cos(freqs)
    sin = np.sin(freqs)
    cos = np.concatenate([cos, cos], -1)[:, None, :]
    sin = np.concatenate([sin, sin], -1)[:, None, :]
    x1, x2 = np.split(x, 2, axis=-1)
    rot = np.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


def test_rope_matches_oracle():
    T, H, D = 5, 2, 16
    rng = np.random.default_rng(0)
    q = rng.normal(size=(T, H, D)).astype(np.float32)
    k = rng.normal(size=(T, 1, D)).astype(np.float32)
    pos = np.array([0, 3, 7, 2, 11], np.int32)
    cos_t, sin_t = rope_table(D, 32, theta=10000.0)
    qr, kr = apply_rope(jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos), cos_t, sin_t)
    np.testing.assert_allclose(np.asarray(qr), hf_rope_oracle(q, pos, 10000.0, D), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kr), hf_rope_oracle(k, pos, 10000.0, D), atol=1e-5)


def test_rope_preserves_inner_products_shift():
    # RoPE property: <q(m), k(n)> depends only on m - n
    D = 32
    rng = np.random.default_rng(1)
    q = rng.normal(size=(1, 1, D)).astype(np.float32)
    k = rng.normal(size=(1, 1, D)).astype(np.float32)
    cos_t, sin_t = rope_table(D, 64)

    def dot_at(m, n):
        qr, kr = apply_rope(
            jnp.asarray(q), jnp.asarray(k),
            jnp.asarray([m], np.int32), cos_t, sin_t)
        qr2, kr2 = apply_rope(
            jnp.asarray(q), jnp.asarray(k),
            jnp.asarray([n], np.int32), cos_t, sin_t)
        return float(jnp.sum(qr[0, 0] * kr2[0, 0]))

    assert abs(dot_at(5, 2) - dot_at(13, 10)) < 1e-4


def test_mrope_sections():
    T, D = 4, 16
    rng = np.random.default_rng(2)
    q = rng.normal(size=(T, 1, D)).astype(np.float32)
    k = rng.normal(size=(T, 1, D)).astype(np.float32)
    cos_t, sin_t = rope_table(D, 64)
    # all three streams equal → must match plain rope
    pos1 = np.array([1, 2, 3, 4], np.int32)
    pos3 = np.stack([pos1] * 3)
    qr_a, _ = apply_rope(jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos1), cos_t, sin_t)
    qr_b, _ = apply_rope(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos3), cos_t, sin_t,
        mrope_section=[3, 3, 2])
    np.testing.assert_allclose(np.asarray(qr_a), np.asarray(qr_b), atol=1e-6)
    # differing streams → different result
    pos3b = pos3.copy()
    pos3b[1] += 5
    qr_c, _ = apply_rope(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos3b), cos_t, sin_t,
        mrope_section=[3, 3, 2])
    assert not np.allclose(np.asarray(qr_b), np.asarray(qr_c))
