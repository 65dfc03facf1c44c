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
    seq=None,  # dynamic true context length (<= kv_len array extent)
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
    if seq is None:
        seq = kv_len
    delta = seq - q_len

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
    hi_c = jnp.minimum(hi, seq)[..., None]
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


# --------------------------------------------------------------------------
# serving path: estimation + block-skipping sparse prefill
# --------------------------------------------------------------------------

def estimate_vertical_slash(
    q: jnp.ndarray,  # (QL, H, D) chunk queries (context tail)
    k: jnp.ndarray,  # (KV, H, D) full-context keys, head-expanded
    sm_scale: float,
    nnz_v: int,
    nnz_s: int,
    last_w: int = 64,
    seq=None,  # dynamic true context length (<= KV array extent)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MInference-style pattern estimation: attention mass of the LAST
    `last_w` queries picks the top vertical columns and slash diagonals.
    The chunk is assumed to END the context (prefill), so query row i sits
    at global position KV - QL + i. Returns (v_idx (H, nnz_v),
    s_idx (H, nnz_s)) in build_vertical_slash_masks conventions."""
    ql, h, d = q.shape
    kv = k.shape[0]
    if seq is None:
        seq = kv
    w = min(last_w, ql)
    qt = q[ql - w :].astype(jnp.float32)  # (W, H, D)
    scores = jnp.einsum("whd,khd->hwk", qt, k.astype(jnp.float32)) * sm_scale
    kv_pos = jnp.arange(kv, dtype=jnp.int32)
    tail_pos = seq - w + jnp.arange(w, dtype=jnp.int32)  # global positions
    causal = (kv_pos[None, :] <= tail_pos[:, None]) & (
        kv_pos[None, :] < seq
    )  # (W, KV)
    scores = jnp.where(causal[None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)  # (H, W, KV)
    p = jnp.where(causal[None], p, 0.0)

    # estimation is a heuristic ranking — bf16 mass + approximate top-k
    # halve its HBM traffic at 32k+ contexts with no measurable pattern
    # drift (the kept sets overlap ~99% with exact top-k)
    p_bf = p.astype(jnp.bfloat16)  # (H, W, KV)
    vert = jnp.sum(p_bf, axis=1, dtype=jnp.float32)  # (H, KV)
    _, v_idx = jax.lax.approx_max_k(vert, min(nnz_v, kv))

    # slash mass by diagonal offset o = q_global - k (0 = self/diagonal).
    # Scatter-add over W·KV indices is ruinous on TPU (per-row scatter
    # cost); instead each tail row is flipped and rotated so index o reads
    # p[i, tail_pos_i - o] — entries wrapped past the row's own position
    # land on causally-masked (zero) probabilities, so a plain row sum is
    # exactly the histogram.
    pf = jnp.flip(p_bf, axis=-1)  # (H, W, KV)
    shifts = tail_pos - (kv - 1)  # (W,)
    rolled = jax.vmap(
        lambda row, s: jnp.roll(row, s, axis=-1),
        in_axes=(1, 0),
        out_axes=1,
    )(pf, shifts)  # (H, W, KV): rolled[., i, o] = p[., i, (tail_i - o) % kv]
    diag = jnp.sum(rolled, axis=1, dtype=jnp.float32)  # (H, KV)
    _, s_idx = jax.lax.approx_max_k(diag, min(nnz_s, kv))
    return v_idx.astype(jnp.int32), s_idx.astype(jnp.int32)


def _estimate_and_select(
    q, k, sm_scale, nnz_v, nnz_s, block_m, block_n, block_budget, last_w, seq
):
    """Shared front half of the sparse serving path: pattern estimation +
    mask build + static-budget block selection. Returns
    (v_idx (HQ, NNZ_V), col_mask (HQ, KV), sel (HQ, NQB, B) kv-block ids,
    sel_valid (HQ, NQB, B) bool)."""
    ql, hq, _ = q.shape
    kv, hkv, _ = k.shape
    g = hq // hkv
    nqb = -(-ql // block_m)
    nkb = -(-kv // block_n)
    budget = block_budget or nkb
    budget = min(budget, nkb)

    # head-expanded keys for estimation (einsum broadcast, no materialize)
    k_hq = jnp.repeat(k, g, axis=1)  # (KV, HQ, D)
    v_idx, s_idx = estimate_vertical_slash(
        q, k_hq, sm_scale, nnz_v, nnz_s, last_w, seq=seq
    )
    block_mask, col_mask = build_vertical_slash_masks(
        v_idx, s_idx, ql, kv, block_m, block_n, seq=seq
    )  # (HQ, NQB, NKB), (HQ, KV)

    # every q block must keep its own diagonal blocks (causal self-range)
    qb = jnp.arange(nqb, dtype=jnp.int32)
    diag_lo = jnp.maximum(seq - ql + qb * block_m, 0) // block_n
    diag_hi = jnp.clip(
        (seq - ql + jnp.minimum((qb + 1) * block_m, ql) - 1) // block_n,
        0,
        nkb - 1,
    )
    kb = jnp.arange(nkb, dtype=jnp.int32)
    diag_blocks = (kb[None, :] >= diag_lo[:, None]) & (
        kb[None, :] <= diag_hi[:, None]
    )  # (NQB, NKB)
    block_mask = block_mask | diag_blocks[None]

    # static-budget block selection: keep the HIGHEST-index masked blocks
    # (recency bias — slash bands cluster near the diagonal)
    rank = jnp.where(block_mask, kb[None, None, :] + 1, 0)
    _, sel = jax.lax.top_k(rank, budget)  # (HQ, NQB, B) kv-block ids
    sel_valid = jnp.take_along_axis(block_mask, sel, axis=2)  # (HQ,NQB,B)
    return v_idx, col_mask, sel, sel_valid


def sparse_prefill_attention(
    q: jnp.ndarray,  # (QL, HQ, D) — the chunk ENDS the context
    k: jnp.ndarray,  # (KV, HKV, D)
    v: jnp.ndarray,  # (KV, HKV, D)
    sm_scale: float,
    nnz_v: int = 64,
    nnz_s: int = 32,
    block_m: int = 64,
    block_n: int = 64,
    block_budget: int = 0,  # kv blocks kept per (head, q-block); 0 = all
    last_w: int = 64,
    seq=None,  # dynamic true context length (<= KV array extent)
) -> jnp.ndarray:
    """Block-SKIPPING vertical-slash prefill: per (q-head, q-block) only the
    top `block_budget` slash-hit kv blocks plus the vertical columns are
    gathered and attended, so compute drops from QL·KV to
    QL·(budget·block_n + nnz_v) per head — the TPU-native (static-budget
    gather) form of the reference's index-list sparse kernel
    (csrc/attention/vertical_slash_index.cu:64-77). Exact equal to the
    masked-dense oracle whenever the budget covers every hit block."""
    ql, hq, d = q.shape
    kv, hkv, _ = k.shape
    if seq is None:
        seq = kv
    g = hq // hkv
    nqb = -(-ql // block_m)
    nkb = -(-kv // block_n)
    budget = min(block_budget or nkb, nkb)
    qb = jnp.arange(nqb, dtype=jnp.int32)

    v_idx, col_mask, sel, sel_valid = _estimate_and_select(
        q, k, sm_scale, nnz_v, nnz_s, block_m, block_n, budget, last_w, seq
    )

    # gather selected kv blocks per (head, q-block)
    pad_kv = nkb * block_n - kv
    kp = jnp.pad(k, ((0, pad_kv), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, pad_kv), (0, 0), (0, 0)))
    k_blk = kp.reshape(nkb, block_n, hkv, d)
    v_blk = vp.reshape(nkb, block_n, hkv, d)

    def per_head(h):
        kvh = h // g
        ksel = k_blk[sel[h], :, kvh, :]  # (NQB, B, bn, D)
        vsel = v_blk[sel[h], :, kvh, :]
        kcol = kp[v_idx[h], kvh, :]  # (NNZ_V, D)
        vcol = vp[v_idx[h], kvh, :]

        qh = jnp.pad(
            q[:, h, :], ((0, nqb * block_m - ql), (0, 0))
        ).reshape(nqb, block_m, d).astype(jnp.float32)

        s_blk = jnp.einsum(
            "qmd,qbnd->qmbn", qh, ksel.astype(jnp.float32)
        ) * sm_scale  # (NQB, bm, B, bn)
        s_col = jnp.einsum(
            "qmd,nd->qmn", qh, kcol.astype(jnp.float32)
        ) * sm_scale  # (NQB, bm, NNZ_V)

        # causal + validity masks (global positions; chunk ends context)
        q_pos = (
            seq - ql + qb[:, None] * block_m
            + jnp.arange(block_m, dtype=jnp.int32)[None, :]
        )  # (NQB, bm)
        blk_pos = (
            sel[h][:, :, None] * block_n
            + jnp.arange(block_n, dtype=jnp.int32)[None, None, :]
        )  # (NQB, B, bn)
        m_blk = (
            (blk_pos[:, None] <= q_pos[:, :, None, None])
            & (blk_pos[:, None] < seq)
            & sel_valid[h][:, None, :, None]
        )
        col_pos = v_idx[h][None, None, :]
        # dedup: drop columns that already arrived via a selected block
        col_blk = v_idx[h] // block_n  # (NNZ_V,)
        in_sel = jnp.any(
            col_blk[None, :, None] == sel[h][:, None, :], axis=2
        )  # (NQB, NNZ_V)
        m_col = (
            (col_pos <= q_pos[:, :, None])
            & (col_pos < seq)
            & col_mask[h][v_idx[h]][None, None, :]
            & ~in_sel[:, None, :]
        )

        s_all = jnp.concatenate(
            [
                jnp.where(m_blk, s_blk, -1e30).reshape(
                    nqb, block_m, budget * block_n
                ),
                jnp.where(m_col, s_col, -1e30),
            ],
            axis=2,
        )
        m = jnp.max(s_all, axis=2, keepdims=True)
        p = jnp.exp(s_all - jnp.maximum(m, -1e30))
        p = jnp.where(s_all > -1e30, p, 0.0)
        den = jnp.maximum(jnp.sum(p, axis=2, keepdims=True), 1e-30)
        p = p / den
        vals = jnp.concatenate(
            [
                vsel.reshape(nqb, budget * block_n, d),
                jnp.broadcast_to(vcol[None], (nqb, vcol.shape[0], d)),
            ],
            axis=1,
        ).astype(jnp.float32)
        out = jnp.einsum("qmc,qcd->qmd", p, vals)
        return out.reshape(nqb * block_m, d)[:ql]

    out = jax.vmap(per_head)(jnp.arange(hq))  # (HQ, QL, D)
    return out.transpose(1, 0, 2).astype(q.dtype)


def sparse_prefill_attention_pallas(
    q: jnp.ndarray,  # (QL, HQ, D) — the chunk ENDS the context
    k: jnp.ndarray,  # (KV, HKV, D)
    v: jnp.ndarray,  # (KV, HKV, D)
    sm_scale: float,
    nnz_v: int = 64,
    nnz_s: int = 32,
    block_m: int = 128,
    block_n: int = 128,
    block_budget: int = 0,
    last_w: int = 64,
    seq=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas form of sparse_prefill_attention: same estimation/selection,
    but the block phase runs in a block-sparse kernel that DMAs each
    selected kv block once (no gather materialization,
    ops/pallas/sparse_prefill.py), and the tiny vertical-column phase
    (QL × NNZ_V per head) stays in XLA; the two are LSE-merged. Numerics
    match sparse_prefill_attention at equal block geometry."""
    from vllm_metax_tpu.ops.pallas.sparse_prefill import (
        sparse_block_attention_pallas,
    )

    ql, hq, d = q.shape
    kv, hkv, _ = k.shape
    if seq is None:
        seq = kv
    g = hq // hkv
    nkb = -(-kv // block_n)
    budget = min(block_budget or nkb, nkb)
    assert ql % block_m == 0, "chunk length must fill whole q blocks"

    v_idx, col_mask, sel, sel_valid = _estimate_and_select(
        q, k, sm_scale, nnz_v, nnz_s, block_m, block_n, budget, last_w, seq
    )

    out_b, lse_b = sparse_block_attention_pallas(
        q, k, v, sel, sel_valid, seq, sm_scale,
        block_m=block_m, block_n=block_n, interpret=interpret,
    )  # (QL, HQ, D) , (QL, HQ)

    # ---- column phase (XLA): per-head vertical columns not already
    # covered by a selected block (same dedup as the gather path) ----
    kvh = jnp.arange(hq, dtype=jnp.int32) // g  # (HQ,)
    kcol = k[v_idx, kvh[:, None], :].astype(jnp.float32)  # (HQ, NNZ_V, D)
    vcol = v[v_idx, kvh[:, None], :].astype(jnp.float32)
    s_col = (
        jnp.einsum("qhd,hnd->hqn", q.astype(jnp.float32), kcol) * sm_scale
    )  # (HQ, QL, NNZ_V)

    q_pos = seq - ql + jnp.arange(ql, dtype=jnp.int32)  # (QL,)
    col_pos = v_idx  # (HQ, NNZ_V)
    in_sel = jnp.any(
        (v_idx[:, None, None, :] // block_n == sel[:, :, :, None])
        & sel_valid[:, :, :, None],
        axis=2,
    )  # (HQ, NQB, NNZ_V)
    row_qb = jnp.arange(ql, dtype=jnp.int32) // block_m  # (QL,)
    m_col = (
        (col_pos[:, None, :] <= q_pos[None, :, None])
        & (col_pos[:, None, :] < seq)
        & jnp.take_along_axis(col_mask, v_idx, axis=1)[:, None, :]
        & ~in_sel[:, row_qb, :]
    )  # (HQ, QL, NNZ_V)
    s_col = jnp.where(m_col, s_col, -1e30)
    m_c = jnp.max(s_col, axis=2, keepdims=True)
    p_c = jnp.where(m_col, jnp.exp(s_col - m_c), 0.0)
    l_c = jnp.sum(p_c, axis=2)  # (HQ, QL)
    out_c = jnp.einsum("hqn,hnd->hqd", p_c, vcol)  # unnormalized
    lse_c = jnp.where(
        l_c > 0.0, m_c[..., 0] + jnp.log(jnp.maximum(l_c, 1e-30)), -1e30
    )  # (HQ, QL)
    out_c = (
        out_c / jnp.maximum(l_c, 1e-30)[..., None]
    ).transpose(1, 0, 2)  # (QL, HQ, D)
    lse_c = lse_c.T  # (QL, HQ)

    # ---- LSE merge (merge_attn_states algebra) ----
    m = jnp.maximum(lse_b, lse_c)
    wb = jnp.where(lse_b > -1e30, jnp.exp(lse_b - m), 0.0)
    wc = jnp.where(lse_c > -1e30, jnp.exp(lse_c - m), 0.0)
    den = jnp.maximum(wb + wc, 1e-30)
    out = (
        out_b.astype(jnp.float32) * (wb / den)[..., None]
        + out_c * (wc / den)[..., None]
    )
    return out.astype(q.dtype)
