from typing import NamedTuple

import jax


class AttentionMetadata(NamedTuple):
    """Device-side attention descriptor (see core/sched/output.py)."""

    q_starts: jax.Array  # [S] int32
    q_lens: jax.Array  # [S] int32
    seq_lens: jax.Array  # [S] int32
    block_tables: jax.Array  # [S, MAXB] int32
    positions: jax.Array  # [T] or [3, T] int32
    token_rows: jax.Array  # [T] int32
    slot_mapping: jax.Array  # [T] int32


from vllm_omni_tpu.ops.attention.ragged_paged import (  # noqa: E402
    ragged_paged_attention,
    ragged_paged_attention_ref,
    write_kv,
)

__all__ = [
    "AttentionMetadata",
    "ragged_paged_attention",
    "ragged_paged_attention_ref",
    "write_kv",
]
