"""Vertical-slash sparse attention (MInference-style sparse prefill).

Reference: csrc/attention/vertical_slash_index.cu
(convert_vertical_slash_indexes) — a serial per-(head, q-block) merge of
sorted vertical-column and slash-diagonal indices into block/column index
LISTS for a sparse kernel. Index lists are a GPU-ism (warp-serial pointer
chasing); the TPU-native form is DENSE BLOCK MASKS computed vectorized in
XLA with static shapes:

  block_mask[h, qb, kb] — q-row-block qb attends kv block kb because some
      selected slash diagonal crosses it (diagonals are snapped to
      block_n-wide kv blocks over the block_m-tall q block, exactly the
      reference's save_blocks range semantics)
  col_mask[h, k]        — kv position k is a selected vertical column

The sparse attention mask is then `causal & (block | column)`, and a
block-sparse kernel can skip kv blocks where block_mask is False and no
column lands (the unified kernel's page-gated DMA shape). The XLA consumer
below is the exact reference implementation used by the tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_vertical_slash_masks(
    v_idx: jnp.ndarray,  # (H, NNZ_V) i32 vertical kv positions (pad >= kv)
    s_idx: jnp.ndarray,  # (H, NNZ_S) i32 slash offsets (pad >= kv + q)
    q_len: int,
    kv_len: int,
    block_m: int = 64,
    block_n: int = 64,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (block_mask (H, NQB, NKB) bool, col_mask (H, KV) bool).

    Slash semantics follow the reference's causal path
    (vertical_slash_index.cu:64-77): slash offset s selects the diagonal
    q + (kv_len - q_len) - k == s; for q block [m0, m0+block_m) that is the
    kv range [delta + m0 - s, delta + m0 + block_m - s), clamped to
    [0, kv_len), then snapped to block_n blocks."""
    h = v_idx.shape[0]
    nqb = (q_len + block_m - 1) // block_m
    nkb = (kv_len + block_n - 1) // block_n
    delta = kv_len - q_len

    # vertical columns: dense membership over kv positions
    kv_pos = jnp.arange(kv_len, dtype=jnp.int32)
    col_mask = jnp.any(
        kv_pos[None, None, :] == v_idx[:, :, None], axis=1
    )  # (H, KV)

    # slash bands per q block: kv interval [lo, hi) per (h, s, qb)
    m0 = (jnp.arange(nqb, dtype=jnp.int32) * block_m)[None, None, :]
    s = s_idx[:, :, None]  # (H, NNZ_S, 1)
    lo = delta + m0 - s  # inclusive
    hi = delta + m0 + block_m - s  # exclusive
    kb = jnp.arange(nkb, dtype=jnp.int32)[None, None, None, :] * block_n
    kb_end = kb + block_n
    # block kb intersects [lo, hi) ∩ [0, kv_len)
    lo_c = jnp.maximum(lo, 0)[..., None]
    hi_c = jnp.minimum(hi, kv_len)[..., None]
    hit = (kb < hi_c) & (kb_end > lo_c) & (hi_c > lo_c)
    block_mask = jnp.any(hit, axis=1)  # (H, NQB, NKB)
    return block_mask, col_mask


def vertical_slash_attention(
    q: jnp.ndarray,  # (Q, H, D)
    k: jnp.ndarray,  # (KV, H, D)
    v: jnp.ndarray,  # (KV, H, D)
    v_idx: jnp.ndarray,  # (H, NNZ_V)
    s_idx: jnp.ndarray,  # (H, NNZ_S)
    sm_scale: float,
    block_m: int = 64,
    block_n: int = 64,
) -> jnp.ndarray:
    """Exact sparse prefill attention over the vertical-slash pattern (the
    XLA reference consumer of build_vertical_slash_masks)."""
    ql, h, d = q.shape
    kv_len = k.shape[0]
    block_mask, col_mask = build_vertical_slash_masks(
        v_idx, s_idx, ql, kv_len, block_m, block_n
    )
    q_pos = jnp.arange(ql, dtype=jnp.int32)
    kv_pos = jnp.arange(kv_len, dtype=jnp.int32)
    causal = (q_pos[:, None] + (kv_len - ql)) >= kv_pos[None, :]  # (Q, KV)
    blk = block_mask[:, q_pos // block_m][:, :, kv_pos // block_n]  # (H,Q,KV)
    allow = causal[None] & (blk | col_mask[:, None, :])
    scores = (
        jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32), k.astype(jnp.float32))
        * sm_scale
    )
    scores = jnp.where(allow, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    p = jnp.where(allow, p, 0.0)  # fully-masked rows stay 0
    out = jnp.einsum("hqk,khd->qhd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)
