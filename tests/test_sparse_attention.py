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


# -------------------------------------- serving path: block-skipping prefill

def test_sparse_prefill_matches_oracle_with_full_budget():
    """With budget covering every hit block, the block-skipping kernel must
    equal a masked-dense oracle built from the same estimated pattern."""
    import jax
    import numpy as np

    from vllm_metax_tpu.ops.sparse_attention import (
        build_vertical_slash_masks,
        estimate_vertical_slash,
        sparse_prefill_attention,
    )

    rng = np.random.default_rng(0)
    ql, kv, hq, hkv, d = 128, 384, 4, 2, 32
    bm = bn = 64
    q = jnp.asarray(rng.standard_normal((ql, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv, hkv, d)), jnp.float32)
    scale = d**-0.5
    nnz_v, nnz_s = 16, 8

    out = sparse_prefill_attention(
        q, k, v, scale, nnz_v=nnz_v, nnz_s=nnz_s, block_m=bm, block_n=bn,
        block_budget=0,
    )

    # oracle: same estimate -> same masks -> dense masked softmax
    g = hq // hkv
    k_hq = jnp.repeat(k, g, axis=1)
    v_hq = jnp.repeat(v, g, axis=1)
    v_idx, s_idx = estimate_vertical_slash(q, k_hq, scale, nnz_v, nnz_s)
    block_mask, col_mask = build_vertical_slash_masks(
        v_idx, s_idx, ql, kv, bm, bn
    )
    # forced diagonal blocks (the serving path always keeps them)
    qb = np.arange(-(-ql // bm))
    kb = np.arange(-(-kv // bn))
    diag_lo = (kv - ql + qb * bm) // bn
    diag_hi = np.minimum((kv - ql + np.minimum((qb + 1) * bm, ql) - 1) // bn,
                         len(kb) - 1)
    diag = (kb[None, :] >= diag_lo[:, None]) & (kb[None, :] <= diag_hi[:, None])
    block_mask = jnp.asarray(np.asarray(block_mask) | diag[None])

    q_pos = np.arange(ql) + (kv - ql)
    kv_pos = np.arange(kv)
    causal = q_pos[:, None] >= kv_pos[None, :]
    blk = np.asarray(block_mask)[:, np.arange(ql) // bm][:, :, kv_pos // bn]
    allow = causal[None] & (blk | np.asarray(col_mask)[:, None, :])
    scores = np.einsum(
        "qhd,khd->hqk", np.asarray(q), np.asarray(k_hq)
    ) * scale
    scores = np.where(allow, scores, -1e30)
    p = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    p = jnp.where(jnp.asarray(allow), p, 0.0)
    ref = jnp.einsum("hqk,khd->qhd", p, jnp.asarray(v_hq))

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_sparse_prefill_high_coverage_fidelity():
    """With the pattern wide enough to cover (nearly) everything, sparse
    output approaches FULL dense attention — the token-fidelity bar for
    serving with sparsity on."""
    import numpy as np

    from vllm_metax_tpu.ops.sparse_attention import sparse_prefill_attention

    rng = np.random.default_rng(1)
    ql, kv, h, d = 128, 256, 2, 32
    q = jnp.asarray(rng.standard_normal((ql, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv, h, d)), jnp.float32)
    scale = d**-0.5
    out = sparse_prefill_attention(
        q, k, v, scale, nnz_v=kv, nnz_s=kv, block_budget=0
    )
    q_pos = np.arange(ql) + (kv - ql)
    causal = q_pos[:, None] >= np.arange(kv)[None, :]
    scores = np.einsum("qhd,khd->hqk", np.asarray(q), np.asarray(k)) * scale
    scores = np.where(causal[None], scores, -1e30)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    e = np.where(causal[None], e, 0.0)
    ref = np.einsum(
        "hqk,khd->qhd", e / e.sum(-1, keepdims=True), np.asarray(v)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_sparse_prefill_dynamic_seq_matches_exact_extent():
    """Padded KV extent + dynamic seq must equal the tight-extent result."""
    import numpy as np

    from vllm_metax_tpu.ops.sparse_attention import sparse_prefill_attention

    rng = np.random.default_rng(2)
    ql, seq, pad_kv, h, d = 64, 192, 320, 2, 32
    q = jnp.asarray(rng.standard_normal((ql, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((pad_kv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((pad_kv, h, d)), jnp.float32)
    scale = d**-0.5
    tight = sparse_prefill_attention(
        q, k[:seq], v[:seq], scale, nnz_v=12, nnz_s=6, block_budget=0
    )
    padded = sparse_prefill_attention(
        q, k, v, scale, nnz_v=12, nnz_s=6, block_budget=0,
        seq=jnp.int32(seq),
    )
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(tight), rtol=2e-4, atol=2e-4
    )


def test_sparse_prefill_serving_e2e(monkeypatch):
    """Engine-level: a long single-request prefill routes through the
    sparse path and generation quality holds (greedy tokens match dense
    for a wide pattern). Done-bar of VERDICT item 9: servable end-to-end."""
    import dataclasses

    import numpy as np

    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    mc = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=1024,
        max_model_len=1024,
        dtype="float32",
    )

    def run(mc_run):
        eng = EngineCore(EngineConfig(
            model_config=mc_run,
            cache_config=CacheConfig(block_size=16, num_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_seqs=2, max_num_batched_tokens=256
            ),
            load_config=LoadConfig(load_format="dummy", seed=0),
        ))
        rng = np.random.default_rng(3)
        prompt = rng.integers(1, 256, size=250).tolist()
        eng.add_request(
            "r", prompt, SamplingParams(max_tokens=6, temperature=0.0)
        )
        toks = []
        while eng.has_unfinished_requests():
            for o in eng.step():
                toks.extend(o.new_token_ids)
        return toks

    dense = run(mc)
    sparse_mc = dataclasses.replace(
        mc,
        sparse_attention="vertical_slash",
        sparse_attention_threshold=256,
        sparse_nnz_v=256,  # wide pattern: fidelity must hold exactly
        sparse_nnz_s=256,
    )
    sparse = run(sparse_mc)
    assert sparse == dense


# ---------------------------------------------------------------------------
# Pallas block-sparse kernel (ops/pallas/sparse_prefill.py)
# ---------------------------------------------------------------------------

def test_pallas_sparse_matches_gather_path():
    """Kernel path == gather path at equal (128-wide) block geometry, both
    with a tight budget and with a dynamic seq shorter than the KV extent."""
    import numpy as np

    from vllm_metax_tpu.ops.sparse_attention import (
        sparse_prefill_attention,
        sparse_prefill_attention_pallas,
    )

    rng = np.random.default_rng(7)
    ql, kv, hq, hkv, d = 256, 640, 4, 2, 128  # GQA g=2; kv % 128 != 0
    q = jnp.asarray(rng.standard_normal((ql, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv, hkv, d)), jnp.float32)
    scale = d**-0.5
    for seq in (kv, 520):
        ref = sparse_prefill_attention(
            q, k, v, scale, nnz_v=32, nnz_s=16, block_m=128, block_n=128,
            block_budget=3, seq=seq,
        )
        got = sparse_prefill_attention_pallas(
            q, k, v, scale, nnz_v=32, nnz_s=16, block_m=128, block_n=128,
            block_budget=3, seq=seq, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_pallas_sparse_full_budget_is_dense():
    """Unlimited block budget must reproduce dense causal attention."""
    import numpy as np

    from vllm_metax_tpu.ops.sparse_attention import (
        sparse_prefill_attention_pallas,
    )

    rng = np.random.default_rng(8)
    ql, kv, hq, hkv, d = 128, 384, 2, 1, 128
    seq = 300
    q = jnp.asarray(rng.standard_normal((ql, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kv, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((kv, hkv, d)), jnp.float32)
    scale = d**-0.5

    kf = jnp.repeat(k, hq // hkv, axis=1).astype(jnp.float32)
    vf = jnp.repeat(v, hq // hkv, axis=1).astype(jnp.float32)
    s = jnp.einsum("qhd,chd->hqc", q.astype(jnp.float32), kf) * scale
    qp = seq - ql + jnp.arange(ql)
    mask = (jnp.arange(kv)[None, :] <= qp[:, None]) & (
        jnp.arange(kv)[None, :] < seq
    )
    s = jnp.where(mask[None], s, -1e30)
    import jax

    dense = jnp.einsum("hqc,chd->qhd", jax.nn.softmax(s, axis=-1), vf)

    got = sparse_prefill_attention_pallas(
        q, k, v, scale, nnz_v=32, nnz_s=16, block_budget=0,
        seq=seq, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(dense), rtol=2e-5, atol=2e-5
    )


def test_pallas_sparse_serving_e2e(monkeypatch):
    """Engine-level with the kernel path FORCED (interpret on CPU): long
    single-request prefill routes through the block-sparse kernel and
    greedy generation matches dense for a wide pattern."""
    import dataclasses

    import numpy as np

    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    monkeypatch.setenv("METAX_TPU_SPARSE_IMPL", "pallas")
    mc = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=2,  # head_dim 128: kernel-route geometry
        num_key_value_heads=1,
        vocab_size=256,
        max_position_embeddings=1024,
        max_model_len=1024,
        dtype="float32",
    )

    def run(mc_run):
        eng = EngineCore(EngineConfig(
            model_config=mc_run,
            cache_config=CacheConfig(block_size=16, num_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_seqs=2, max_num_batched_tokens=256
            ),
            load_config=LoadConfig(load_format="dummy", seed=0),
        ))
        rng = np.random.default_rng(5)
        prompt = rng.integers(1, 256, size=250).tolist()
        eng.add_request(
            "r", prompt, SamplingParams(max_tokens=6, temperature=0.0)
        )
        toks = []
        while eng.has_unfinished_requests():
            for o in eng.step():
                toks.extend(o.new_token_ids)
        return toks

    dense = run(mc)
    sparse_mc = dataclasses.replace(
        mc,
        sparse_attention="vertical_slash",
        sparse_attention_threshold=256,
        sparse_nnz_v=256,
        sparse_nnz_s=256,
    )
    sparse = run(sparse_mc)
    assert sparse == dense
