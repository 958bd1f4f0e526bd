"""Host-side paged KV-cache block management.

TPU-native replacement for the vLLM KVCacheManager the reference's AR
stages lean on (SURVEY.md §2.10): a free-list block pool plus per-request
block tables. The device side is a set of fixed HBM cache arrays indexed by
these tables (see ops/attention). All bookkeeping here is plain Python/numpy
— it runs on host between jitted steps, so it must be allocation-cheap.
"""

from __future__ import annotations

from typing import Optional

from vllm_omni_tpu.utils import cdiv


class BlockPool:
    """LIFO free list over block ids [0, num_blocks).

    Block 0 is reserved as the padding block so that padded rows of the
    device block tables always point at valid memory.
    """

    def __init__(self, num_blocks: int) -> None:
        if num_blocks < 2:
            raise ValueError("need at least 2 blocks (one is the pad block)")
        self.num_blocks = num_blocks
        self._free: list[int] = list(range(num_blocks - 1, 0, -1))

    @property
    def num_free(self) -> int:
        return len(self._free)

    def allocate(self, n: int) -> list[int]:
        if n > len(self._free):
            raise NoFreeBlocksError(f"requested {n}, free {len(self._free)}")
        out = self._free[-n:][::-1]
        del self._free[len(self._free) - n :]
        return out

    def free(self, blocks: list[int]) -> None:
        self._free.extend(reversed(blocks))


class NoFreeBlocksError(RuntimeError):
    pass


class KVCacheManager:
    """Per-request block tables over a shared BlockPool."""

    def __init__(self, num_blocks: int, block_size: int) -> None:
        self.block_size = block_size
        self.pool = BlockPool(num_blocks)
        self.req_blocks: dict[str, list[int]] = {}

    def num_blocks_needed(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.block_size)

    def can_allocate(self, request_id: str, total_tokens: int) -> bool:
        have = len(self.req_blocks.get(request_id, ()))
        need = self.num_blocks_needed(total_tokens) - have
        return need <= self.pool.num_free

    def allocate(self, request_id: str, total_tokens: int) -> Optional[list[int]]:
        """Ensure the request's table covers total_tokens; returns the full
        table, or None if out of blocks (caller should preempt/queue)."""
        blocks = self.req_blocks.setdefault(request_id, [])
        need = self.num_blocks_needed(total_tokens) - len(blocks)
        if need > 0:
            if need > self.pool.num_free:
                return None
            blocks.extend(self.pool.allocate(need))
        return blocks

    def free(self, request_id: str) -> None:
        blocks = self.req_blocks.pop(request_id, None)
        if blocks:
            self.pool.free(blocks)

    def get_blocks(self, request_id: str) -> list[int]:
        return self.req_blocks.get(request_id, [])

    @property
    def num_free_blocks(self) -> int:
        return self.pool.num_free
