"""Shared test helpers (pattern of the reference's tests/v1/attention/utils.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vllm_metax_tpu.ops.attention import AttentionMetadata
from vllm_metax_tpu.ops.kv_cache import new_kv_cache
from vllm_metax_tpu.utils import cdiv


def make_single_seq_metadata(
    context_len: int,
    num_new_tokens: int,
    block_size: int,
    max_blocks: int,
    num_pad_tokens: int = 0,
) -> AttentionMetadata:
    """Metadata for one request with `context_len` tokens already cached and
    `num_new_tokens` new tokens appended (blocks allocated contiguously 0..)."""
    total = context_len + num_new_tokens
    assert cdiv(total, block_size) <= max_blocks
    positions = np.arange(context_len, total, dtype=np.int32)
    slots = positions.copy()
    t = num_new_tokens + num_pad_tokens
    pad_slot = max_blocks * block_size
    return AttentionMetadata(
        slot_mapping=jnp.asarray(
            np.pad(slots, (0, num_pad_tokens), constant_values=pad_slot)
        ),
        block_tables=jnp.arange(max_blocks, dtype=jnp.int32)[None, :],
        seq_lens=jnp.asarray([total], dtype=jnp.int32),
        query_start_loc=jnp.asarray([0, num_new_tokens], dtype=jnp.int32),
        req_idx=jnp.zeros((t,), dtype=jnp.int32),
        positions=jnp.asarray(np.pad(positions, (0, num_pad_tokens))),
        num_seqs=jnp.asarray(1, dtype=jnp.int32),
    )


def make_kv_cache_stack(num_layers, num_blocks, block_size, num_kv_heads, head_dim,
                        dtype=jnp.float32):
    """Flat all-layer page pool (layer l owns pages [l*NB, (l+1)*NB))."""
    return new_kv_cache(
        num_layers * num_blocks, block_size, num_kv_heads, head_dim, dtype
    )
