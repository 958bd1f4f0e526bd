"""EPLB: balanced placement quality and output invariance of the
expert permutation."""

import numpy as np

import jax
import jax.numpy as jnp

from vllm_omni_tpu.ops.moe import moe_mlp
from vllm_omni_tpu.parallel.eplb import (
    ExpertLoadTracker,
    balanced_expert_map,
    permute_expert_params,
    shard_loads,
)


def test_balanced_map_reduces_imbalance():
    rng = np.random.default_rng(0)
    counts = rng.zipf(1.5, size=16).astype(np.float64)
    perm = balanced_expert_map(counts, 4)
    assert sorted(perm) == list(range(16))
    skew_before = shard_loads(counts, np.arange(16), 4)
    skew_after = shard_loads(counts, perm, 4)
    assert skew_after.max() <= skew_before.max()
    # LPT guarantee: max shard load < mean + max single expert
    assert skew_after.max() <= counts.sum() / 4 + counts.max()


def test_permutation_output_invariance():
    """Permuting router columns + expert stacks together leaves moe_mlp
    outputs unchanged."""
    rng = jax.random.key(1)
    L, H, E, I, T, K = 2, 16, 8, 32, 6, 2
    ks = jax.random.split(rng, 5)
    layers = {
        "router": jax.random.normal(ks[0], (L, H, E), jnp.float32) * 0.3,
        "experts_gate": jax.random.normal(ks[1], (L, E, H, I)) * 0.1,
        "experts_up": jax.random.normal(ks[2], (L, E, H, I)) * 0.1,
        "experts_down": jax.random.normal(ks[3], (L, E, I, H)) * 0.1,
    }
    x = jax.random.normal(ks[4], (T, H), jnp.float32)

    def run(lp):
        return np.asarray(moe_mlp(
            x, lp["router"][0], lp["experts_gate"][0], lp["experts_up"][0],
            lp["experts_down"][0], top_k=K, norm_topk_prob=True))

    base = run(layers)
    perm = balanced_expert_map(np.arange(E, 0, -1, dtype=np.float64), 4)
    permuted = permute_expert_params(layers, perm)
    np.testing.assert_allclose(run(permuted), base, atol=1e-5, rtol=1e-5)


def test_tracker_rebalance():
    tr = ExpertLoadTracker(num_experts=8, num_shards=2)
    # all load on experts 0 and 1 (same shard under identity)
    tr.observe(np.array([0, 0, 0, 1, 1, 1, 2]))
    assert tr.imbalance() > 1.5
    layers = {
        "router": jnp.zeros((1, 4, 8)),
        "experts_gate": jnp.zeros((1, 8, 4, 8)),
        "experts_up": jnp.zeros((1, 8, 4, 8)),
        "experts_down": jnp.zeros((1, 8, 8, 4)),
    }
    _, perm = tr.rebalance(layers)
    # hot experts 0 and 1 land on different shards
    s0 = set(perm[:4])
    assert (0 in s0) != (1 in s0)
    assert tr.counts.sum() == 0
