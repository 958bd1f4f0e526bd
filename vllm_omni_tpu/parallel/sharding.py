"""Parameter/cache partition specs + collective helpers for TP.

Replaces the reference's GroupCoordinator/NCCL process groups
(reference diffusion/distributed/group_coordinator.py:74-550) with named
mesh axes and explicit XLA collectives inside shard_map — the
scaling-book recipe: pick a mesh, annotate shardings, let XLA ride ICI.

TP layout (Megatron-style, one psum per block):
  qkv projections   column-sharded on the head dim     -> local heads
  attention + KV    local per shard (Hkv % tp == 0)
  o_proj            row-sharded + psum
  gate/up           column-sharded
  down              row-sharded + psum
  embed/norms       replicated
  lm_head           column-sharded on vocab + all_gather for sampling
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vllm_omni_tpu.config.parallel import AXIS_EXPERT, AXIS_MODEL

REPLICATED = P()


def qwen_param_specs(params: dict[str, Any], axis: str = AXIS_MODEL) -> dict[str, Any]:
    """PartitionSpec pytree matching a Qwen2/Qwen3(-MoE) param pytree."""
    col = {  # shard last dim
        "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
        "q_bias", "k_bias", "v_bias",
    }
    row = {"o_proj", "down_proj"}  # shard dim 1 (input dim of [L, in, out])
    # MoE expert weights [L, E, in, out]: experts over the expert axis,
    # expert hidden dim over the model axis (EP x TP)
    moe_col = {"experts_gate", "experts_up"}
    moe_row = {"experts_down"}

    def spec_for(path: str, arr) -> P:
        parts = path.split("/")
        name = parts[-1]
        nd = arr.ndim
        if name in ("q", "s") and len(parts) >= 2:
            # weight-only quantized projection (ops/quant.py): "q" shards
            # exactly like the weight it replaces; the per-out-channel
            # scale "s" follows the OUT dim (sharded for column-parallel
            # weights, replicated for row-parallel)
            parent = parts[-2]
            if name == "q":
                name = parent
            else:
                if parent in col:
                    return P(*([None] * (nd - 1)), axis)
                return REPLICATED
        if name in moe_col:
            return P(None, AXIS_EXPERT, None, axis)
        if name in moe_row:
            return P(None, AXIS_EXPERT, axis, None)
        if name in col:
            return P(*([None] * (nd - 1)), axis)
        if name in row:
            return P(*([None] * (nd - 2)), axis, None)
        if name == "lm_head":
            return P(None, axis)
        return REPLICATED

    def walk(node, path=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            # e.g. per-level deepstack projections in the omni thinker
            return type(node)(
                walk(v, f"{path}/{i}") for i, v in enumerate(node))
        return spec_for(path, node)

    return walk(params)


def kv_cache_specs(axis: str = AXIS_MODEL,
                   quantized: bool = False) -> dict[str, P]:
    # [L, Nblk, Hkv, B, D] sharded over kv heads; int8 caches carry
    # [L, Nblk, B, Hkv] scale arrays sharded over their Hkv axis
    specs = {"k": P(None, None, axis), "v": P(None, None, axis)}
    if quantized:
        specs["k_scale"] = P(None, None, None, axis)
        specs["v_scale"] = P(None, None, None, axis)
    return specs


def place(tree, specs, mesh: Mesh):
    """device_put a pytree according to a matching spec pytree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def psum_if(x, axis: Optional[str]):
    return jax.lax.psum(x, axis) if axis else x


def all_gather_if(x, axis: Optional[str], gather_axis: int = -1):
    if not axis:
        return x
    return jax.lax.all_gather(x, axis, axis=gather_axis, tiled=True)
