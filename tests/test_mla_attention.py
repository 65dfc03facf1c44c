"""MLA paged attention: chunked-XLA vs dense math, Pallas decode kernel parity.

The chunked path (models/deepseek.py mla_attention_xla_chunked) is the analog
of the reference's chunked MLA prefill workspace (mla/common.py:507,1620); the
Pallas decode path (ops/pallas/decode_attention.py pv_width) mirrors FlashMLA
decode (mla/flashmla.py:221). Context lengths here exceed one chunk several
times over, proving no (T, MAX_CTX, D) intermediate is required.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metax_tpu.ops.attention import AttentionMetadata
from vllm_metax_tpu.ops.kv_cache import new_kv_cache, write_to_kv_cache

BS = 16
LORA = 128
ROPE = 64
DQ = LORA + ROPE


def _make_mla_case(rng, seq_lens_ctx, qlens, h=4, num_blocks=256,
                   kv_dtype=jnp.float32):
    r = len(qlens)
    t = sum(qlens)
    maxb = max(2, -(-max(s + q for s, q in zip(seq_lens_ctx, qlens)) // BS))
    kv = new_kv_cache(num_blocks, BS, 1, DQ, kv_dtype, store_v=False)

    block_tables = np.zeros((r, maxb), np.int32)
    positions = np.zeros(t, np.int32)
    req_idx = np.zeros(t, np.int32)
    qsl = np.zeros(r + 1, np.int32)
    seq_lens = np.zeros(r, np.int32)
    q = rng.standard_normal((t, h, DQ), dtype=np.float32) * 0.5

    next_block = 0
    lat_rows, slot_rows = [], []
    offset = 0
    for i, (ctx, ql) in enumerate(zip(seq_lens_ctx, qlens)):
        total = ctx + ql
        nb = -(-total // BS)
        bids = np.arange(next_block, next_block + nb)
        next_block += nb
        block_tables[i, :nb] = bids
        lat = rng.standard_normal((total, 1, DQ), dtype=np.float32) * 0.5
        slots = bids[np.arange(total) // BS] * BS + np.arange(total) % BS
        lat_rows.append(lat)
        slot_rows.append(slots)
        positions[offset : offset + ql] = np.arange(ctx, total)
        req_idx[offset : offset + ql] = i
        qsl[i + 1] = qsl[i] + ql
        seq_lens[i] = total
        offset += ql

    lat_all = np.concatenate(lat_rows)
    kv = write_to_kv_cache(
        kv,
        jnp.asarray(lat_all),
        jnp.zeros((lat_all.shape[0], 1, 0), jnp.float32),
        jnp.asarray(np.concatenate(slot_rows), dtype=jnp.int32),
    )
    md = AttentionMetadata(
        slot_mapping=jnp.zeros(t, jnp.int32),
        block_tables=jnp.asarray(block_tables),
        seq_lens=jnp.asarray(seq_lens),
        query_start_loc=jnp.asarray(qsl),
        req_idx=jnp.asarray(req_idx),
        positions=jnp.asarray(positions),
        num_seqs=jnp.asarray(r, jnp.int32),
    )
    return jnp.asarray(q), kv, md, lat_rows


def _dense_reference(q, md, lat_rows, sm_scale):
    """Straightforward per-token masked softmax over the request's latent."""
    t, h, dq = q.shape
    out = np.zeros((t, h, LORA), np.float64)
    qn = np.asarray(q, np.float64)
    for tok in range(t):
        r = int(md.req_idx[tok])
        pos = int(md.positions[tok])
        lat = lat_rows[r][: pos + 1, 0].astype(np.float64)  # (ctx, DQ)
        s = qn[tok] @ lat.T * sm_scale  # (H, ctx)
        s -= s.max(axis=1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(axis=1, keepdims=True)
        out[tok] = p @ lat[:, :LORA]
    return out


def test_mla_chunked_vs_dense(rng):
    from vllm_metax_tpu.models.deepseek import mla_attention_xla_chunked

    q, kv, md, lat_rows = _make_mla_case(
        rng, seq_lens_ctx=[700, 40, 0, 1000], qlens=[3, 1, 17, 1]
    )
    out = mla_attention_xla_chunked(q, kv, md, 0.11, LORA)
    ref = _dense_reference(q, md, lat_rows, 0.11)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-3)


def test_mla_pallas_decode_vs_chunked(rng):
    from vllm_metax_tpu.models.deepseek import mla_attention_xla_chunked
    from vllm_metax_tpu.ops.pallas.decode_attention import (
        decode_attention_supported,
        paged_decode_attention_pallas,
    )

    ctx = [700, 40, 1, 1000, 17, 333, 64, 259]
    q, kv, md, lat_rows = _make_mla_case(rng, seq_lens_ctx=ctx, qlens=[1] * 8)
    assert decode_attention_supported(q, kv, md, mla=True)
    out_p = paged_decode_attention_pallas(
        q, kv, md, 0.11, pv_width=LORA, interpret=True
    )
    out_x = mla_attention_xla_chunked(q, kv, md, 0.11, LORA)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=1e-3, atol=2e-3
    )


def test_mla_pallas_decode_wide_heads(rng):
    """DeepSeek-V2-Lite shape: 16 q heads on the single latent head."""
    from vllm_metax_tpu.models.deepseek import mla_attention_xla_chunked
    from vllm_metax_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_pallas,
    )

    q, kv, md, _ = _make_mla_case(
        rng, seq_lens_ctx=[300, 17, 500, 5, 260, 48, 200, 15], qlens=[1] * 8,
        h=16,
    )
    out_p = paged_decode_attention_pallas(
        q, kv, md, 0.11, pv_width=LORA, interpret=True
    )
    out_x = mla_attention_xla_chunked(q, kv, md, 0.11, LORA)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=1e-3, atol=2e-3
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
