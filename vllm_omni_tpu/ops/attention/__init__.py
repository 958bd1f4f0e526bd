from typing import NamedTuple

import jax


class AttentionMetadata(NamedTuple):
    """Device-side attention descriptor (see core/sched/output.py).

    `positions` are sequence indices (causal masking / KV placement);
    `rope_positions` feed rotary embeddings and may be [3, T] M-RoPE
    streams (multimodal position ids differ from sequence indices —
    reference mrope.py:415-587)."""

    q_starts: jax.Array  # [S] int32
    q_lens: jax.Array  # [S] int32
    seq_lens: jax.Array  # [S] int32
    block_tables: jax.Array  # [S, MAXB] int32
    positions: jax.Array  # [T] int32 sequence indices
    token_rows: jax.Array  # [T] int32
    slot_mapping: jax.Array  # [T] int32
    rope_positions: jax.Array = None  # [T] or [3, T] int32 (None -> positions)

    @property
    def rope_pos(self) -> jax.Array:
        return self.positions if self.rope_positions is None else self.rope_positions


from vllm_omni_tpu.ops.attention.ragged_paged import (  # noqa: E402
    ragged_paged_attention,
    ragged_paged_attention_ref,
    write_kv,
    write_kv_auto,
    write_kv_layer,
)

__all__ = [
    "AttentionMetadata",
    "ragged_paged_attention",
    "ragged_paged_attention_ref",
    "write_kv",
    "write_kv_auto",
    "write_kv_layer",
]
