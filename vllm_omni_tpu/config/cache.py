"""KV-cache configuration.

TPU-native replacement for vLLM's CacheConfig consumed by the reference's
AR stages. Block (page) geometry is chosen for TPU tiling: the
(block_size, head_dim) tail dims of the cache layout map onto (sublane,
lane) tiles, so head_dim should be a multiple of 128 and block_size a
multiple of 8 for fp32 / 16 for bf16 (pallas_guide.md "Tiling Constraints").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax.numpy as jnp

from vllm_omni_tpu.config.model import resolve_dtype


@dataclass
class CacheConfig:
    block_size: int = 16
    # Either an explicit block count or a fraction of HBM to fill.
    num_blocks: Optional[int] = None
    hbm_memory_utilization: float = 0.9
    cache_dtype: Any = "bfloat16"
    # Prefix caching (reference surfaces reset_prefix_cache on the engine
    # client protocol, async_omni.py:1105-1237). Off by default in round 1.
    enable_prefix_caching: bool = False

    def __post_init__(self) -> None:
        self.cache_dtype = resolve_dtype(self.cache_dtype)
        if self.block_size % 8 != 0:
            raise ValueError(
                f"block_size must be a multiple of 8 for TPU tiling, got {self.block_size}"
            )

    def bytes_per_block(self, num_kv_heads: int, head_dim: int, num_layers: int) -> int:
        itemsize = jnp.dtype(self.cache_dtype).itemsize
        # K and V
        return 2 * self.block_size * num_kv_heads * head_dim * num_layers * itemsize
