"""Host-RAM KV offload tier: LRU spill of evicted prefix-cache pages.

Reference analog: device↔host block swap (`swap_blocks`,
csrc/cache_kernels.cu:18) and the LMCache offloading flow the reference
exercises (tests/kv_transfer/test_lmcache_offloading.py). TPU-native form:

- SPILL: when the device prefix cache evicts a content-hashed block (its
  LRU slot gets reused), the page rows of all layers are gathered
  device→host in ONE batched transfer and stored keyed by the chained
  content hash (same keys the device cache and PD handoff use,
  kv_cache_manager.hash_block_tokens).
- RESTORE: at add_request, the prompt's hash chain is walked past the
  device-cached prefix; a contiguous run of host-tier hits is scattered
  back into freshly allocated blocks and registered in the device prefix
  cache, so the scheduler's get_computed_blocks sees them and prefill only
  computes the tail — recompute becomes one host→device transfer.

Capacity: `CacheConfig.host_swap_blocks` pages, LRU. Spills are skipped
while an async-scheduled window is in flight (its writes may already be
racing the evicted rows); the tier is a best-effort cache, never a
correctness dependency.
"""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

from vllm_metax_tpu.core.kv_cache_manager import (
    hash_block_tokens,
    mm_hash_seed,
)
from vllm_metax_tpu.logger import init_logger

logger = init_logger(__name__)


class HostKVTier:
    def __init__(self, max_blocks: int):
        self.max_blocks = max_blocks
        # hash → {"partition": int, "pages": {name: np (L, H, BS, ...)}}
        self.store: OrderedDict[int, dict] = OrderedDict()
        self.spilled = 0
        self.restored = 0

    def __contains__(self, h: int) -> bool:
        return h in self.store

    def put(self, h: int, partition: int, pages: dict) -> None:
        if h in self.store:
            self.store.move_to_end(h)
            return
        while len(self.store) >= self.max_blocks:
            self.store.popitem(last=False)
        self.store[h] = {"partition": partition, "pages": pages}
        self.spilled += 1

    def get(self, h: int):
        entry = self.store.get(h)
        if entry is not None:
            self.store.move_to_end(h)
        return entry


def _pool_geometry(engine):
    kv = engine.runner.kv_cache
    nb_total = engine.config.cache_config.num_blocks
    num_layers = kv.k.shape[0] // nb_total
    return kv, nb_total, num_layers


def spill_evictions(engine, evictions: list[tuple[int, int]]) -> int:
    """Gather the evicted blocks' page rows (all layers) device→host in one
    transfer and store them in the tier. evictions: (block_hash, block_id).
    Must run BEFORE the step that overwrites the evicted rows."""
    tier = engine.host_tier
    if not evictions:
        return 0
    kv, nb_total, num_layers = _pool_geometry(engine)
    nbl = engine.scheduler.kv_manager.nbl
    bids = np.asarray([b for _, b in evictions], np.int32)
    rows = (
        np.arange(num_layers, dtype=np.int32)[None, :] * nb_total
        + bids[:, None]
    )  # (n, L)
    fetched = {}
    for name in ("k", "v", "k_scale", "v_scale"):
        arr = getattr(kv, name)
        if arr is None or arr.size == 0:
            continue
        fetched[name] = np.asarray(jnp.take(arr, jnp.asarray(rows), axis=0))
    for j, (h, bid) in enumerate(evictions):
        tier.put(
            h, bid // nbl, {name: v[j] for name, v in fetched.items()}
        )
    return len(evictions)


def try_restore(engine, request) -> int:
    """Walk `request`'s block-hash chain past the device-cached prefix; if
    the host tier continues it, scatter those pages into newly allocated
    blocks and register them as cached. Returns blocks restored."""
    tier = engine.host_tier
    manager = engine.scheduler.kv_manager
    cc = engine.config.cache_config
    tokens = request.prompt_token_ids
    n_full = (len(tokens) - 1) // cc.block_size
    if n_full == 0:
        return 0
    parent = mm_hash_seed(request)
    chain: list[tuple[int, int, dict]] = []  # (seq_idx, hash, pages)
    pinned = []  # device-cached prefix blocks — pin them so the restore's
    # own allocations can't evict this very chain's head
    for i in range(n_full):
        chunk = tuple(tokens[i * cc.block_size : (i + 1) * cc.block_size])
        parent = hash_block_tokens(parent, chunk)
        pool = manager._pool_at(i)
        dev = pool.get_cached_block(parent)
        if dev is not None:
            if chain:
                break  # contiguous run only
            pool.touch(dev)
            pinned.append((pool, dev))
            continue  # device-cached prefix; keep walking
        entry = tier.get(parent)
        if entry is None:
            break
        if manager.pools[entry["partition"]] is not manager._pool_at(i):
            break  # spilled from a different dcp partition than needed
        chain.append((i, parent, entry["pages"]))

    def unpin():
        for pool, blk in pinned:
            pool.free(blk)

    if not chain:
        unpin()
        return 0

    kv, nb_total, num_layers = _pool_geometry(engine)
    blocks = []
    for i, h, _ in chain:
        pool = manager._pool_at(i)
        if pool.get_num_free_blocks() == 0:
            break  # best effort: restore the prefix we can afford
        blocks.append((pool, pool.allocate(1)[0], h))
    chain = chain[: len(blocks)]
    if not blocks:
        unpin()
        return 0
    # the allocations above may themselves have evicted cached blocks —
    # spill them NOW, before the scatter below overwrites their rows
    spill_evictions(engine, manager.take_evictions())

    tgt = np.asarray([b.block_id for _, b, _ in blocks], np.int32)
    rows = (
        np.arange(num_layers, dtype=np.int32)[None, :] * nb_total
        + tgt[:, None]
    ).reshape(-1)
    updates = {}
    for name in ("k", "v", "k_scale", "v_scale"):
        arr = getattr(kv, name)
        if arr is None or arr.size == 0:
            continue
        vals = np.stack([pages[name] for _, _, pages in chain])  # (n, L, ...)
        updates[name] = arr.at[jnp.asarray(rows)].set(
            jnp.asarray(vals.reshape((-1,) + vals.shape[2:]), arr.dtype)
        )
    engine.runner.kv_cache = kv._replace(**updates)

    for pool, blk, h in blocks:
        pool.cache_block(blk, h)
        pool.free(blk)  # park in the cached LRU, evictable again
    unpin()
    tier.restored += len(blocks)
    logger.debug("host-tier restored %d blocks", len(blocks))
    return len(blocks)
