"""Block-table KV cache management with prefix caching.

Behavioral model: vLLM v1's KVCacheManager/BlockPool, whose semantics the
reference pins via vendored tests (tests/v1/core/test_kv_cache_utils.py,
test_prefix_caching.py). TPU note: this is pure host-side bookkeeping — the
device only ever sees block_tables / slot_mapping integer arrays.

Prefix caching: full blocks are content-hashed (chained over the prefix) and
kept in an LRU of freed-but-intact blocks; a new request reuses any leading
chain of matching blocks without recompute.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from vllm_metax_tpu.core.request import Request
from vllm_metax_tpu.utils import cdiv


@dataclass
class KVCacheBlock:
    block_id: int
    ref_cnt: int = 0
    block_hash: Optional[int] = None


def mm_hash_seed(request) -> int:
    """Root parent hash for a request's block-hash chain. Multimodal
    requests seed it with a digest of their pixel content so prompts whose
    PLACEHOLDER TOKENS are identical but whose images differ never alias
    (conservative: same-image same-prompt requests still share fully).
    Cached on the request (pixel arrays can be MBs)."""
    mmd = getattr(request, "multi_modal_data", None)
    if not mmd:
        return 0
    seed = getattr(request, "_mm_hash_seed", None)
    if seed is None:
        h = hashlib.blake2b(digest_size=8)
        for key in sorted(mmd):
            val = mmd[key]
            h.update(key.encode())
            if isinstance(val, np.ndarray):
                h.update(np.ascontiguousarray(val).tobytes())
            else:
                h.update(repr(val).encode())
        seed = int.from_bytes(h.digest(), "little")
        try:
            request._mm_hash_seed = seed
        except AttributeError:
            pass
    return seed


def hash_block_tokens(parent_hash: int, tokens: tuple[int, ...]) -> int:
    """Stable content hash (not Python hash(), which is salted per process):
    PD disaggregation / multi-process prefix reuse must agree on block keys."""
    h = hashlib.blake2b(digest_size=8)
    h.update(parent_hash.to_bytes(8, "little", signed=False))
    h.update(np.asarray(tokens, dtype=np.int64).tobytes())
    return int.from_bytes(h.digest(), "little")


class BlockPool:
    """Free-list + content-hash index over the physical blocks.

    start_id offsets the block ids (DCP partitions: partition d of a
    dcp-sharded cache owns ids [d*NBl, (d+1)*NBl), parallel/dcp.py)."""

    def __init__(
        self, num_blocks: int, enable_caching: bool = True, start_id: int = 0
    ):
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching
        self.start_id = start_id
        # (block_hash, block_id) of cached blocks whose slot was reused —
        # drained by KVCacheManager.take_evictions for the host offload
        # tier (core/host_kv_tier.py) before the rows are overwritten.
        # Logged only when a tier is attached (engine sets log_evictions).
        self.log_evictions = False
        self.evicted_log: list[tuple[int, int]] = []
        self.blocks = [KVCacheBlock(start_id + i) for i in range(num_blocks)]
        # LRU: freed blocks stay here (evictable, content intact) until reused.
        self.free_queue: OrderedDict[int, KVCacheBlock] = OrderedDict(
            (b.block_id, b) for b in self.blocks
        )
        self.cached: dict[int, KVCacheBlock] = {}  # block_hash → block

    def get_num_free_blocks(self) -> int:
        return len(self.free_queue)

    def get_cached_block(self, block_hash: int) -> Optional[KVCacheBlock]:
        return self.cached.get(block_hash) if self.enable_caching else None

    def touch(self, block: KVCacheBlock) -> None:
        """Re-reference a block (possibly pulling it out of the free LRU)."""
        if block.ref_cnt == 0:
            self.free_queue.pop(block.block_id, None)
        block.ref_cnt += 1

    def allocate(self, n: int) -> list[KVCacheBlock]:
        if n > len(self.free_queue):
            raise RuntimeError("out of KV blocks")
        out = []
        for _ in range(n):
            _, block = self.free_queue.popitem(last=False)  # LRU eviction
            if block.block_hash is not None:
                # evicting a cached block: drop its prefix-cache entry
                if self.cached.get(block.block_hash) is block:
                    del self.cached[block.block_hash]
                    if self.log_evictions:
                        self.evicted_log.append(
                            (block.block_hash, block.block_id)
                        )
                block.block_hash = None
            block.ref_cnt = 1
            out.append(block)
        return out

    def cache_block(self, block: KVCacheBlock, block_hash: int) -> None:
        if not self.enable_caching:
            return
        block.block_hash = block_hash
        self.cached[block_hash] = block

    def free(self, block: KVCacheBlock) -> None:
        block.ref_cnt -= 1
        if block.ref_cnt == 0:
            self.free_queue[block.block_id] = block  # MRU end
            self.free_queue.move_to_end(block.block_id)

    def reset_prefix_cache(self) -> bool:
        if any(b.ref_cnt > 0 for b in self.blocks):
            return False
        self.cached.clear()
        for b in self.blocks:
            b.block_hash = None
        return True


@dataclass
class KVCacheBlocks:
    blocks: list[KVCacheBlock] = field(default_factory=list)

    @property
    def block_ids(self) -> list[int]:
        return [b.block_id for b in self.blocks]


class KVCacheManager:
    def __init__(
        self,
        num_blocks: int,
        block_size: int,
        enable_caching: bool = True,
        dcp_size: int = 1,
    ):
        """dcp_size > 1 partitions the block-id space into dcp ranges; the
        j-th block of every sequence draws from partition j % dcp so KV pages
        interleave round-robin over the DCP ranks (parallel/dcp.py; reference
        analog: the round-robin CP layout behind cp_gather_cache,
        csrc/cache_kernels.cu:1075)."""
        if num_blocks % dcp_size:
            raise ValueError(
                f"num_blocks={num_blocks} must divide dcp_size={dcp_size}"
            )
        self.block_size = block_size
        self.dcp_size = dcp_size
        self.nbl = num_blocks // dcp_size
        self.pools = [
            BlockPool(self.nbl, enable_caching, start_id=d * self.nbl)
            for d in range(dcp_size)
        ]
        self.block_pool = self.pools[0]  # dcp=1 compat alias
        self.enable_caching = enable_caching
        self.req_blocks: dict[str, list[KVCacheBlock]] = {}
        # per-request chained hashes of its full blocks (parallel to req_blocks)
        self.req_hashes: dict[str, list[int]] = {}

    def _pool_at(self, seq_block_idx: int) -> BlockPool:
        """Pool owning the seq_block_idx-th block of any sequence."""
        return self.pools[seq_block_idx % self.dcp_size]

    def take_evictions(self) -> list[tuple[int, int]]:
        """Drain (block_hash, block_id) of cached blocks evicted since the
        last call (host offload tier spill feed)."""
        out: list[tuple[int, int]] = []
        for p in self.pools:
            out.extend(p.evicted_log)
            p.evicted_log.clear()
        return out

    def _pool_of(self, block: KVCacheBlock) -> BlockPool:
        return self.pools[block.block_id // self.nbl]

    @property
    def usage(self) -> float:
        free = sum(p.get_num_free_blocks() for p in self.pools)
        total = sum(p.num_blocks for p in self.pools)
        return 1.0 - free / total

    def get_computed_blocks(self, request: Request) -> tuple[KVCacheBlocks, int]:
        """Longest cached prefix for a new request. Never returns the full
        prompt (the last token must be recomputed to produce logits)."""
        if not self.enable_caching:
            return KVCacheBlocks([]), 0
        tokens = request.prompt_token_ids
        # only blocks strictly before the last token are usable
        max_cache_hit = (len(tokens) - 1) // self.block_size
        blocks = []
        parent = mm_hash_seed(request)
        for i in range(max_cache_hit):
            chunk = tuple(tokens[i * self.block_size : (i + 1) * self.block_size])
            parent = hash_block_tokens(parent, chunk)
            cached = self._pool_at(i).get_cached_block(parent)
            if cached is None:
                break
            blocks.append(cached)
        return KVCacheBlocks(blocks), len(blocks) * self.block_size

    def allocate_slots(
        self,
        request: Request,
        num_new_tokens: int,
        new_computed_blocks: Optional[KVCacheBlocks] = None,
    ) -> Optional[KVCacheBlocks]:
        """Ensure the request has blocks covering
        num_computed_tokens + num_new_tokens. Returns newly-allocated blocks,
        or None if the pool can't satisfy it (caller preempts)."""
        computed = new_computed_blocks.blocks if new_computed_blocks else []
        cur = self.req_blocks.get(request.req_id, [])
        # inflight_computed: KV positions an unresolved async-scheduled step
        # will write occupy slots too (scheduler.preapply_window/prefill)
        total_tokens = (
            request.num_computed_tokens
            + request.inflight_computed
            + num_new_tokens
        )
        needed_blocks = cdiv(total_tokens, self.block_size)
        num_new_blocks = needed_blocks - len(cur) - len(computed)
        # per-partition availability (round-robin over sequence positions)
        first_new = len(cur) + len(computed)
        need_per_pool = [0] * self.dcp_size
        for pos in range(first_new, needed_blocks):
            need_per_pool[pos % self.dcp_size] += 1
        if any(
            need > self.pools[d].get_num_free_blocks()
            for d, need in enumerate(need_per_pool)
        ):
            return None

        if computed:  # first allocation with a prefix-cache hit
            for b in computed:
                self._pool_of(b).touch(b)
            self.req_blocks[request.req_id] = cur = list(computed)
            # seed the hash chain with the reused prefix
            hashes = []
            parent = mm_hash_seed(request)
            tokens = request.prompt_token_ids
            for i, _ in enumerate(computed):
                chunk = tuple(tokens[i * self.block_size : (i + 1) * self.block_size])
                parent = hash_block_tokens(parent, chunk)
                hashes.append(parent)
            self.req_hashes[request.req_id] = hashes
        elif request.req_id not in self.req_blocks:
            self.req_blocks[request.req_id] = cur = []
            self.req_hashes[request.req_id] = []

        new_blocks = [
            self._pool_at(pos).allocate(1)[0]
            for pos in range(len(cur), needed_blocks)
        ]
        cur.extend(new_blocks)
        return KVCacheBlocks(new_blocks)

    def cache_full_blocks(self, request: Request, num_computed_tokens: int) -> None:
        """Register content hashes for blocks that became full (called after
        a step advances num_computed_tokens)."""
        if not self.enable_caching:
            return
        blocks = self.req_blocks.get(request.req_id, [])
        hashes = self.req_hashes[request.req_id]
        tokens = request.all_token_ids
        num_full = num_computed_tokens // self.block_size
        parent = hashes[-1] if hashes else mm_hash_seed(request)
        for i in range(len(hashes), min(num_full, len(blocks))):
            chunk = tuple(tokens[i * self.block_size : (i + 1) * self.block_size])
            parent = hash_block_tokens(parent, chunk)
            hashes.append(parent)
            pool = self._pool_at(i)
            if pool.get_cached_block(parent) is None:
                pool.cache_block(blocks[i], parent)

    def free(self, request: Request) -> None:
        # free in reverse so the LRU evicts tail blocks (least reusable) first
        for b in reversed(self.req_blocks.pop(request.req_id, [])):
            self._pool_of(b).free(b)
        self.req_hashes.pop(request.req_id, None)

    def get_block_ids(self, req_id: str) -> list[int]:
        return [b.block_id for b in self.req_blocks.get(req_id, [])]

    def get_num_free_blocks(self) -> int:
        # conservative under DCP: capacity is gated by the fullest partition
        return min(p.get_num_free_blocks() for p in self.pools) * self.dcp_size

    def reset_prefix_cache(self) -> bool:
        return all([p.reset_prefix_cache() for p in self.pools])
