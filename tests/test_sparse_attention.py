"""Vertical-slash sparse attention (MInference pattern): the dense
block/column masks must reproduce the reference's serial index-merge
semantics (csrc/attention/vertical_slash_index.cu), checked against an
independent per-element oracle."""

import numpy as np
import jax.numpy as jnp

from vllm_metax_tpu.ops.sparse_attention import (
    build_vertical_slash_masks,
    vertical_slash_attention,
)


def _oracle_allow(v_idx, s_idx, q_len, kv_len, block_m, block_n):
    """Brute-force per-element allow mask: causal & (vertical column |
    slash diagonal band snapped to (block_m, block_n) granularity)."""
    h = v_idx.shape[0]
    delta = kv_len - q_len
    allow = np.zeros((h, q_len, kv_len), bool)
    for hh in range(h):
        for qq in range(q_len):
            qb0 = (qq // block_m) * block_m
            for kk in range(kv_len):
                if qq + delta < kk:
                    continue  # causal
                if kk in set(int(x) for x in v_idx[hh] if x < kv_len):
                    allow[hh, qq, kk] = True
                    continue
                kb0 = (kk // block_n) * block_n
                # does any slash band of this q block hit kk's kv block?
                for s in s_idx[hh]:
                    lo = delta + qb0 - int(s)
                    hi = lo + block_m
                    lo_c, hi_c = max(lo, 0), min(hi, kv_len)
                    if lo_c < hi_c and kb0 < hi_c and kb0 + block_n > lo_c:
                        allow[hh, qq, kk] = True
                        break
    return allow


def test_masks_match_oracle():
    rng = np.random.default_rng(0)
    h, q_len, kv_len, bm, bn = 2, 48, 80, 16, 16
    v_idx = np.sort(rng.choice(kv_len, size=(h, 4), replace=False), axis=1)
    s_idx = np.sort(rng.choice(kv_len + q_len, size=(h, 3)), axis=1)
    blk, col = build_vertical_slash_masks(
        jnp.asarray(v_idx, jnp.int32), jnp.asarray(s_idx, jnp.int32),
        q_len, kv_len, bm, bn,
    )
    blk, col = np.asarray(blk), np.asarray(col)
    oracle = _oracle_allow(v_idx, s_idx, q_len, kv_len, bm, bn)
    got = np.zeros_like(oracle)
    for qq in range(q_len):
        for kk in range(kv_len):
            causal = qq + (kv_len - q_len) >= kk
            got[:, qq, kk] = causal & (
                blk[:, qq // bm, kk // bn] | col[:, kk]
            )
    assert np.array_equal(got, oracle)


def test_sparse_attention_matches_masked_dense():
    rng = np.random.default_rng(1)
    h, q_len, kv_len, d, bm, bn = 2, 32, 64, 64, 16, 16
    q = jnp.asarray(rng.standard_normal((q_len, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv_len, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv_len, h, d)), jnp.float32)
    v_idx = np.sort(rng.choice(kv_len, size=(h, 5), replace=False), axis=1)
    s_idx = np.sort(rng.choice(kv_len + q_len, size=(h, 4)), axis=1)
    out = np.asarray(
        vertical_slash_attention(
            q, k, v, jnp.asarray(v_idx, jnp.int32),
            jnp.asarray(s_idx, jnp.int32), sm_scale=0.125,
            block_m=bm, block_n=bn,
        )
    )
    allow = _oracle_allow(v_idx, s_idx, q_len, kv_len, bm, bn)
    scores = np.einsum("qhd,khd->hqk", np.asarray(q), np.asarray(k)) * 0.125
    scores = np.where(allow, scores, -1e30)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    e = np.where(allow, e, 0.0)
    p = e / np.maximum(e.sum(-1, keepdims=True), 1e-30)
    ref = np.einsum("hqk,khd->qhd", p, np.asarray(v))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_full_coverage_reduces_to_dense():
    """Enough slashes to cover every diagonal == plain causal attention."""
    rng = np.random.default_rng(2)
    h, q_len, kv_len, d = 1, 16, 16, 32
    q = jnp.asarray(rng.standard_normal((q_len, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv_len, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv_len, h, d)), jnp.float32)
    s_idx = np.arange(kv_len)[None, :]  # every slash
    v_idx = np.zeros((1, 1), np.int32) + kv_len  # none
    out = np.asarray(
        vertical_slash_attention(
            q, k, v, jnp.asarray(v_idx, jnp.int32),
            jnp.asarray(s_idx, jnp.int32), sm_scale=0.18,
            block_m=8, block_n=8,
        )
    )
    causal = np.tril(np.ones((q_len, kv_len), bool))
    scores = np.einsum("qhd,khd->hqk", np.asarray(q), np.asarray(k)) * 0.18
    scores = np.where(causal[None], scores, -1e30)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = np.einsum("hqk,khd->qhd", p, np.asarray(v))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
