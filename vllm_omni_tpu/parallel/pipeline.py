"""Intra-model pipeline parallelism: GPipe schedule under shard_map.

Parity target: the reference's PipeFusion-style intra-model pipeline
for diffusion transformers (reference vllm_omni/diffusion/distributed/
group_coordinator.py:552-908 `PipelineGroupCoordinator` — buffered
async isend/irecv between layer groups, `data.py:26-91`
`pipeline_parallel_size`). The reference negotiates shapes and moves
activations with NCCL point-to-points between worker processes; here
the whole schedule is ONE jitted SPMD program: the stacked block
params shard over a "pipe" mesh axis (each device holds L/P
contiguous blocks), microbatches rotate stage-to-stage with
`lax.ppermute` over ICI, and XLA overlaps the permute with the next
microbatch's compute. Exact (no PipeFusion staleness): outputs are
bit-comparable to the single-device `lax.scan` over the same blocks.

Bubble fraction is (P-1)/(M+P-1) for M microbatches over P stages —
callers split the (CFG-doubled) batch axis into M microbatches.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

PIPE_AXIS = "pipe"


def _mb_split(tree: Any, m: int) -> Any:
    """[B, ...] -> [M, B//M, ...] on every array leaf."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape(m, x.shape[0] // m, *x.shape[1:]), tree)


def _mb_merge(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]), tree)


def _take(tree: Any, i) -> Any:
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def pipeline_blocks(
    block_fn: Callable[[Any, Any], Any],
    blocks: Any,
    carry: Any,
    mesh: Mesh,
    num_microbatches: int,
) -> Any:
    """Run `carry -> block_fn(carry, blocks[l])` for all L blocks,
    layer-sharded over mesh axis "pipe", GPipe-scheduled over
    `num_microbatches` splits of the leading (batch) axis.

    `block_fn(carry, p) -> carry` must be shape-polymorphic in the
    batch axis (use x.shape[0], not a closed-over B). `carry` is a
    pytree of [B, ...] arrays; any per-example conditioning the block
    needs must ride inside `carry` (returned unchanged). `blocks` is
    the scanned param pytree with leading layer axis L; L % P == 0 and
    B % num_microbatches == 0.
    """
    P = mesh.shape[PIPE_AXIS]
    M = num_microbatches
    L = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    B = jax.tree_util.tree_leaves(carry)[0].shape[0]
    if L % P or B % M:
        raise ValueError(f"pipeline: L={L} % P={P} or B={B} % M={M} != 0")
    perm = [(i, (i + 1) % P) for i in range(P)]

    def stage(local_blocks: Any, mb: Any) -> Any:
        def body(c, p):
            return block_fn(c, p), None

        out, _ = jax.lax.scan(body, mb, local_blocks)
        return out

    def pp_body(local_blocks: Any, carry_rep: Any) -> Any:
        idx = jax.lax.axis_index(PIPE_AXIS)
        mbs = _mb_split(carry_rep, M)
        state = _take(mbs, 0)
        outs = jax.tree_util.tree_map(jnp.zeros_like, mbs)
        for t in range(M + P - 1):
            feed = _take(mbs, min(t, M - 1))
            cur = jax.tree_util.tree_map(
                lambda f, s: jnp.where(idx == 0, f, s), feed, state)
            y = stage(local_blocks, cur)
            oi = t - (P - 1)
            if oi >= 0:
                outs = jax.tree_util.tree_map(
                    lambda o, yy: o.at[oi].set(
                        jnp.where(idx == P - 1, yy, o[oi])), outs, y)
            if t < M + P - 2:
                state = jax.tree_util.tree_map(
                    lambda yy: jax.lax.ppermute(yy, PIPE_AXIS, perm), y)
        # replicate the last stage's outputs to every device
        outs = jax.tree_util.tree_map(
            lambda o: jax.lax.psum(
                jnp.where(idx == P - 1, o, jnp.zeros_like(o)), PIPE_AXIS),
            outs)
        return _mb_merge(outs)

    blocks_spec = jax.tree_util.tree_map(
        lambda _: PartitionSpec(PIPE_AXIS), blocks)
    carry_spec = jax.tree_util.tree_map(lambda _: PartitionSpec(), carry)
    fn = jax.shard_map(
        pp_body, mesh=mesh,
        in_specs=(blocks_spec, carry_spec), out_specs=carry_spec,
        check_vma=False)
    return fn(blocks, carry)


def shard_blocks_for_pipeline(params: Any, blocks_key: str,
                              mesh: Mesh) -> Any:
    """Place a transformer param tree for pipeline execution: the
    stacked `params[blocks_key]` layer axis shards over "pipe"; every
    other param is replicated over the pipe mesh."""
    out = {}
    for k, v in params.items():
        if k == blocks_key:
            out[k] = jax.device_put(
                v, NamedSharding(mesh, PartitionSpec(PIPE_AXIS)))
        else:
            out[k] = jax.device_put(
                v, NamedSharding(mesh, PartitionSpec()))
    return out


def make_pipe_mesh(devices: list, pp: int) -> Mesh:
    import numpy as np

    return Mesh(np.asarray(devices[:pp]), (PIPE_AXIS,))
