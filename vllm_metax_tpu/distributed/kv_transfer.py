"""Prefill/decode disaggregation: KV handoff between engines.

Reference analog: the KV-connector transfer path exercised by
tests/v1/kv_connector/nixl_integration/toy_proxy_server.py and the
disaggregated_serving_p2p_nccl_xpyd example — a PREFILL engine computes a
prompt's KV once and ships the pages to a DECODE engine, which continues
generation without recomputing the prompt.

TPU-native design: the handoff rides the content-addressed prefix cache.

- Export: walk the prompt's chained block hashes (hash_block_tokens — a
  stable blake2b, shared across processes by construction) through the
  source engine's prefix cache, gather those pages from the flat
  (L*NB, H, BS, D) pool in ONE device gather + ONE device→host fetch.
- Import: allocate blocks in the target engine's pool (round-robin
  partition-aware under DCP), scatter the pages in (one host→device
  transfer), register the same hashes, and release the blocks into the
  cached-LRU. A subsequent add_request(prompt) on the decode engine hits
  the imported prefix and only computes the tail partial block — at most
  block_size-1 tokens — before decoding.

The handoff payload is a plain dict of numpy arrays + hashes: serialize it
with np.save/pickle over any transport (file, socket, RPC proxy). Within
one process the arrays pass by reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from vllm_metax_tpu.core.kv_cache_manager import hash_block_tokens


@dataclass
class KVHandoff:
    """One prompt's exportable KV state."""

    block_size: int
    num_layers: int
    hashes: list[int]  # chained content hash per FULL block
    # (num_full_blocks, L, H, BS, D) pages, k then optionally v/scales
    k: np.ndarray
    v: Optional[np.ndarray] = None
    k_scale: Optional[np.ndarray] = None
    v_scale: Optional[np.ndarray] = None
    meta: dict = field(default_factory=dict)

    @property
    def num_blocks(self) -> int:
        return len(self.hashes)


def _pool_geometry(engine):
    runner = engine.runner
    kv = runner.kv_cache
    nb_total = engine.config.cache_config.num_blocks
    num_layers = kv.k.shape[0] // nb_total
    return kv, nb_total, num_layers


def prompt_block_hashes(prompt_token_ids, block_size: int) -> list[int]:
    """Chained hashes of the prompt's FULL blocks (the last, partial block —
    and the final token even when aligned — is never transferred; the decode
    engine recomputes it to produce logits)."""
    n_full = (len(prompt_token_ids) - 1) // block_size
    hashes, parent = [], 0
    for i in range(n_full):
        chunk = tuple(prompt_token_ids[i * block_size : (i + 1) * block_size])
        parent = hash_block_tokens(parent, chunk)
        hashes.append(parent)
    return hashes


def export_prompt_kv(engine, prompt_token_ids) -> Optional[KVHandoff]:
    """Gather the prompt's full-block KV pages from `engine` (which must
    have prefilled the prompt — e.g. served it with max_tokens=1).

    Returns None if any block is missing from the prefix cache (evicted or
    never computed)."""
    cc = engine.config.cache_config
    manager = engine.scheduler.kv_manager
    hashes = prompt_block_hashes(prompt_token_ids, cc.block_size)
    if not hashes:
        return None
    block_ids = []
    for i, h in enumerate(hashes):
        blk = manager._pool_at(i).get_cached_block(h)
        if blk is None:
            return None
        block_ids.append(blk.block_id)

    kv, nb_total, num_layers = _pool_geometry(engine)
    rows = (
        np.arange(num_layers, dtype=np.int32)[None, :] * nb_total
        + np.asarray(block_ids, np.int32)[:, None]
    )  # (nfull, L)
    out = {}
    for name in ("k", "v", "k_scale", "v_scale"):
        arr = getattr(kv, name)
        if arr is None or arr.size == 0:
            out[name] = None
            continue
        out[name] = np.asarray(jnp.take(arr, jnp.asarray(rows), axis=0))
    return KVHandoff(
        block_size=cc.block_size,
        num_layers=num_layers,
        hashes=hashes,
        k=out["k"],
        v=out["v"],
        k_scale=out["k_scale"],
        v_scale=out["v_scale"],
    )


def import_prompt_kv(engine, handoff: KVHandoff) -> int:
    """Install a handoff into `engine`'s pool + prefix cache. Returns the
    number of blocks imported (blocks already cached are skipped)."""
    cc = engine.config.cache_config
    if handoff.block_size != cc.block_size:
        raise ValueError(
            f"block_size mismatch: handoff {handoff.block_size} vs engine "
            f"{cc.block_size} (PD pairs must agree, like the reference's "
            "connector contract)"
        )
    kv, nb_total, num_layers = _pool_geometry(engine)
    if handoff.num_layers != num_layers:
        raise ValueError("layer-count mismatch between PD engines")
    manager = engine.scheduler.kv_manager

    todo: list[tuple[int, int]] = []  # (handoff idx, target block id)
    blocks = []
    for i, h in enumerate(handoff.hashes):
        pool = manager._pool_at(i)
        if pool.get_cached_block(h) is not None:
            continue
        blk = pool.allocate(1)[0]
        blocks.append((pool, blk, h))
        todo.append((i, blk.block_id))
    if not todo:
        return 0

    idx = np.asarray([i for i, _ in todo], np.int32)
    tgt = np.asarray([b for _, b in todo], np.int32)
    rows = (
        np.arange(num_layers, dtype=np.int32)[None, :] * nb_total
        + tgt[:, None]
    ).reshape(-1)
    updates = {}
    for name in ("k", "v", "k_scale", "v_scale"):
        src = getattr(handoff, name)
        arr = getattr(kv, name)
        if src is None or arr is None or arr.size == 0:
            continue
        vals = src[idx].reshape((-1,) + src.shape[2:])  # (n*L, H, BS, ...)
        updates[name] = arr.at[jnp.asarray(rows)].set(
            jnp.asarray(vals, arr.dtype)
        )
    engine.runner.kv_cache = kv._replace(**updates)

    # register + park in the cached LRU (reusable, evictable)
    for pool, blk, h in blocks:
        pool.cache_block(blk, h)
        pool.free(blk)
    return len(todo)
