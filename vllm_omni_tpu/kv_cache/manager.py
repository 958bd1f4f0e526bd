"""Host-side paged KV-cache block management with prefix caching.

TPU-native replacement for the vLLM KVCacheManager the reference's AR
stages lean on (SURVEY.md §2.10): a free-list block pool plus per-request
block tables, and vLLM-style automatic prefix caching — full prompt
blocks are content-addressed by a rolling hash chain, shared across
requests by refcount, and kept in an LRU evictable pool after release.
All bookkeeping is plain Python — it runs on host between jitted steps.

Safety on device: shared prefix blocks are only ever READ by followers
(their slot_mapping starts past the cached prefix), and device execution
follows dispatch order, so a follower's reads always land after the
owner's prefill writes even under async pipelined scheduling.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

from vllm_omni_tpu.utils import cdiv


class NoFreeBlocksError(RuntimeError):
    pass


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


class KVCacheManager:
    """Per-request block tables over a shared BlockPool."""

    def __init__(self, num_blocks: int, block_size: int,
                 enable_prefix_caching: bool = False) -> None:
        self.block_size = block_size
        self.pool = BlockPool(num_blocks)
        self.req_blocks: dict[str, list[int]] = {}
        self.enable_prefix_caching = enable_prefix_caching
        # content addressing (only full PROMPT blocks are registered)
        self._refs: dict[int, int] = {}  # block -> refcount
        self._hash_of: dict[int, int] = {}  # block -> content hash
        self._cached: dict[int, int] = {}  # hash -> block
        # ref==0 cached blocks, LRU order (reusable until evicted)
        self._evictable: "OrderedDict[int, int]" = OrderedDict()  # blk->hash
        self.cache_hits = 0
        self.cache_queries = 0

    # ----------------------------------------------------------- hashing
    def _block_hashes(self, token_ids) -> list[int]:
        hashes = []
        h = 0
        bs = self.block_size
        for i in range(len(token_ids) // bs):
            h = hash((h, tuple(token_ids[i * bs:(i + 1) * bs])))
            hashes.append(h)
        return hashes

    # --------------------------------------------------------- low level
    def _take_blocks(self, n: int) -> Optional[list[int]]:
        """Allocate n fresh blocks, evicting LRU cached blocks on demand."""
        short = n - self.pool.num_free
        while short > 0 and self._evictable:
            blk, h = self._evictable.popitem(last=False)
            self._cached.pop(h, None)
            self._hash_of.pop(blk, None)
            self.pool.free([blk])
            short -= 1
        if n > self.pool.num_free:
            return None
        blocks = self.pool.allocate(n)
        for b in blocks:
            self._refs[b] = 1
        return blocks

    def _release_block(self, b: int) -> None:
        self._refs[b] = self._refs.get(b, 1) - 1
        if self._refs[b] > 0:
            return
        del self._refs[b]
        h = self._hash_of.get(b)
        if h is not None and self.enable_prefix_caching:
            self._evictable[b] = h  # stays addressable until evicted
        else:
            self._hash_of.pop(b, None)
            self.pool.free([b])

    # --------------------------------------------------------------- API
    def num_blocks_needed(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.block_size)

    def can_allocate(self, request_id: str, total_tokens: int) -> bool:
        have = len(self.req_blocks.get(request_id, ()))
        need = self.num_blocks_needed(total_tokens) - have
        return need <= self.pool.num_free + len(self._evictable)

    def allocate(self, request_id: str, total_tokens: int) -> Optional[list[int]]:
        """Ensure the request's table covers total_tokens; returns the full
        table, or None if out of blocks (caller should preempt/queue)."""
        blocks = self.req_blocks.setdefault(request_id, [])
        need = self.num_blocks_needed(total_tokens) - len(blocks)
        if need > 0:
            new = self._take_blocks(need)
            if new is None:
                return None
            blocks.extend(new)
        return blocks

    def match_prefix(self, request_id: str, prompt_token_ids) -> int:
        """Prefix-cache lookup at admission: shares every leading full
        prompt block already resident; returns the number of cached
        TOKENS (the scheduler skips computing them). The request must
        not hold blocks yet."""
        if not self.enable_prefix_caching or request_id in self.req_blocks:
            return 0
        self.cache_queries += 1
        blocks = self.req_blocks.setdefault(request_id, [])
        n = 0
        for h in self._block_hashes(prompt_token_ids):
            blk = self._cached.get(h)
            if blk is None:
                break
            if blk in self._evictable:
                del self._evictable[blk]
                self._refs[blk] = 0
            self._refs[blk] = self._refs.get(blk, 0) + 1
            blocks.append(blk)
            n += self.block_size
        if n:
            self.cache_hits += 1
        return n

    def register_prompt(self, request_id: str, prompt_token_ids) -> None:
        """Content-address the request's full prompt blocks so later
        requests can share them (no-op for already-registered hashes)."""
        if not self.enable_prefix_caching:
            return
        blocks = self.req_blocks.get(request_id, ())
        for i, h in enumerate(self._block_hashes(prompt_token_ids)):
            if i >= len(blocks):
                break
            if h not in self._cached:
                self._cached[h] = blocks[i]
                self._hash_of[blocks[i]] = h

    def free(self, request_id: str) -> None:
        blocks = self.req_blocks.pop(request_id, None)
        if not blocks:
            return
        for b in blocks:
            self._release_block(b)

    def get_blocks(self, request_id: str) -> list[int]:
        return self.req_blocks.get(request_id, [])

    @property
    def num_free_blocks(self) -> int:
        return self.pool.num_free
