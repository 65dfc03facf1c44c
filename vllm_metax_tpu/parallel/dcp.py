"""Decode-context parallelism (DCP): KV pages sharded over a mesh axis.

TPU-native analog of the reference's DCP path
(vllm_metax/v1/attention/backends/flash_attn.py:794-830 `_forward_with_dcp`,
csrc/cache_kernels.cu:1075 `cp_gather_cache`): long sequences' KV blocks are
distributed round-robin over the "dcp" mesh ranks, each rank computes partial
attention over the blocks it owns, and the partials combine with an
LSE-weighted merge. Where the reference gathers remote KV with a custom
kernel and merges explicitly, the SPMD form does a distributed softmax —
pmax of the row maxima + psum of the weighted numerator/denominator over the
"dcp" axis (ops/attention.py) — so the combine is two small collectives and
no KV ever moves between ranks.

Layout contract (built in core/runner.py):

- The flat page pool (L*NB, H, BS, D) is ordered (pp, dcp, local layers,
  local pages) and sharded P(("pp","dcp"), ...) on axis 0, so rank d's shard
  is a layer-major (L_local * NBl) pool of its OWN pages.
- The host-side block allocator (core/kv_cache_manager.py) assigns the j-th
  block of every sequence to rank j % dcp, drawing from that rank's id range
  [d*NBl, (d+1)*NBl).
- Inside the sharded step, `localize_metadata` converts global block ids and
  slot indices to rank-local ones; blocks owned by other ranks become
  DCP_SENTINEL (attention masks those columns; the slot scatter's mode="drop"
  discards non-local writes).

Weights are replicated over "dcp" (the specs simply don't mention the axis):
the axis buys KV capacity + attention bandwidth for long-context decode, the
same trade the reference makes inside its TP group when num_kv_heads < tp.
Co-sharding q heads over ("dcp","tp") is future work.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vllm_metax_tpu.ops.attention import AttentionMetadata

DCP_AXIS = "dcp"

# Non-local block id. Survives layer_view's `+ layer * nb_layer` rebase
# without overflowing int32, and always fails `block < num_local_rows`.
# Python int (NOT a jnp scalar): module-level device constants get hoisted
# as hidden executable arguments and break cached-executable reuse.
DCP_SENTINEL = 2**28


def localize_metadata(
    md: AttentionMetadata, nbl: int, block_size: int
) -> AttentionMetadata:
    """Rebase global block ids / slot indices onto this rank's local pool.

    nbl: blocks per rank per layer (global num_blocks // dcp). Must be called
    inside shard_map on the "dcp" axis, before any layer_view rebase."""
    d = jax.lax.axis_index(DCP_AXIS)
    lo = d * nbl

    b = md.block_tables
    local_b = b - lo
    block_tables = jnp.where(
        (local_b >= 0) & (local_b < nbl), local_b, DCP_SENTINEL
    )

    sb = md.slot_mapping // block_size
    so = md.slot_mapping % block_size
    local_sb = sb - lo
    # sentinel is NOT scaled by block_size (2**28 * bs would overflow int32
    # once layer_view adds its offset); 2**28 already exceeds any local slot
    # count, so the scatter's mode="drop" discards it
    slot_mapping = jnp.where(
        (local_sb >= 0) & (local_sb < nbl),
        local_sb * block_size + so,
        DCP_SENTINEL,
    )
    return dataclasses.replace(
        md,
        block_tables=block_tables,
        slot_mapping=slot_mapping,
        dcp_axis=DCP_AXIS,
    )
