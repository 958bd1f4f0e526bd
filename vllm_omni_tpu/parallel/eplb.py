"""Expert-parallel load balancing (EPLB).

Parity role: the reference's EPLB hooks (reference
worker/gpu_ar_model_runner.py:374-375 `eplb_step`, via vLLM's MoE
layers). TPU-native form: with experts stacked along a mesh-sharded
axis, rebalancing is a PERMUTATION of the expert axis applied jointly
to the router's output columns and the expert weight stacks — routing
follows automatically, so the hot path costs nothing; the permutation
itself is an occasional device-side gather.

Physical expert e lives on shard e // (E / num_shards); a balanced
permutation packs hot experts onto different shards (greedy LPT).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax.numpy as jnp


def balanced_expert_map(counts: np.ndarray, num_shards: int) -> np.ndarray:
    """counts [E] (per-logical-expert token loads) -> perm [E] where
    perm[physical_slot] = logical_expert. Greedy longest-processing-time
    packing: heaviest experts spread across shards first."""
    E = len(counts)
    if E % num_shards:
        raise ValueError(f"E={E} not divisible by shards={num_shards}")
    per = E // num_shards
    order = np.argsort(-np.asarray(counts, np.float64))  # heavy first
    shard_load = np.zeros(num_shards, np.float64)
    shard_fill = np.zeros(num_shards, np.int64)
    perm = np.zeros(E, np.int64)
    for e in order:
        # lightest shard with a free slot
        cand = np.where(shard_fill < per)[0]
        s = cand[np.argmin(shard_load[cand])]
        perm[s * per + shard_fill[s]] = e
        shard_fill[s] += 1
        shard_load[s] += counts[e]
    return perm


def shard_loads(counts: np.ndarray, perm: np.ndarray,
                num_shards: int) -> np.ndarray:
    """Per-shard load under a placement (for balance metrics/tests)."""
    E = len(perm)
    per = E // num_shards
    c = np.asarray(counts, np.float64)
    return np.asarray([c[perm[s * per:(s + 1) * per]].sum()
                       for s in range(num_shards)])


def permute_expert_params(layers: dict[str, Any],
                          perm: np.ndarray) -> dict[str, Any]:
    """Apply an expert permutation to a scanned MoE layer stack
    (router [L, H, E] columns + experts_* [L, E, ...] rows move
    together, so `moe_mlp` outputs are bit-identical)."""
    idx = jnp.asarray(perm)
    out = dict(layers)
    out["router"] = layers["router"][..., idx]
    for k in ("experts_gate", "experts_up", "experts_down"):
        out[k] = layers[k][:, idx]
    return out


class ExpertLoadTracker:
    """Host-side accumulator for per-expert token counts; call
    `rebalance(params)` periodically to get permuted params + the map."""

    def __init__(self, num_experts: int, num_shards: int):
        self.counts = np.zeros(num_experts, np.int64)
        self.num_shards = num_shards

    def observe(self, expert_ids: np.ndarray) -> None:
        """expert_ids: any int array of routed expert ids."""
        binc = np.bincount(np.asarray(expert_ids).reshape(-1),
                           minlength=len(self.counts))
        self.counts += binc[: len(self.counts)]

    def imbalance(self) -> float:
        """max/mean shard load under the identity placement."""
        loads = shard_loads(self.counts, np.arange(len(self.counts)),
                            self.num_shards)
        mean = loads.mean()
        return float(loads.max() / mean) if mean > 0 else 1.0

    def rebalance(self, layers: dict[str, Any]):
        perm = balanced_expert_map(self.counts, self.num_shards)
        new_layers = permute_expert_params(layers, perm)
        self.counts[:] = 0
        return new_layers, perm
