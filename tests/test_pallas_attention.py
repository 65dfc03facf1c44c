"""Pallas ragged paged attention vs the XLA reference math (interpret mode).

Scenario grid mirrors the reference's attention kernel tests
(tests/kernels/attention/test_attention.py parameter lattice): decode, prefill,
mixed batches, GQA/MQA, sliding window, soft cap, multi-chunk contexts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metax_tpu.ops.attention import (
    AttentionMetadata,
    ragged_paged_attention_xla,
)
from vllm_metax_tpu.ops.kv_cache import KVCache, new_kv_cache, write_to_kv_cache
from vllm_metax_tpu.ops.pallas.ragged_attention import ragged_paged_attention_pallas

BS = 16
D = 128


def _make_case(rng, seq_lens_ctx, qlens, hq=4, hkv=2, num_blocks=64, t_bucket=None,
               r_bucket=None):
    """seq_lens_ctx: existing context per request; qlens: new tokens this step."""
    r_actual = len(qlens)
    r = r_bucket or r_actual
    t_actual = sum(qlens)
    t = t_bucket or t_actual
    maxb = max(2, -(-max(s + q for s, q in zip(seq_lens_ctx, qlens)) // BS))

    kv = new_kv_cache(num_blocks, BS, hkv, D, jnp.float32)
    # fill context KV for each request in its blocks
    block_tables = np.zeros((r, maxb), np.int32)
    next_block = 0
    slot_rows = []
    all_k, all_v = [], []
    positions = np.zeros(t, np.int32)
    req_idx = np.zeros(t, np.int32)
    qsl = np.zeros(r + 1, np.int32)
    seq_lens = np.zeros(r, np.int32)
    q = rng.standard_normal((t, hq, D), dtype=np.float32) * 0.5

    offset = 0
    for i, (ctx, ql) in enumerate(zip(seq_lens_ctx, qlens)):
        total = ctx + ql
        nb = -(-total // BS)
        bids = np.arange(next_block, next_block + nb)
        next_block += nb
        block_tables[i, :nb] = bids
        # context tokens
        ctx_k = rng.standard_normal((ctx, hkv, D), dtype=np.float32) * 0.5
        ctx_v = rng.standard_normal((ctx, hkv, D), dtype=np.float32) * 0.5
        ctx_slots = bids[np.arange(ctx) // BS] * BS + np.arange(ctx) % BS
        all_k.append(ctx_k)
        all_v.append(ctx_v)
        slot_rows.append(ctx_slots)
        # new tokens
        new_k = rng.standard_normal((ql, hkv, D), dtype=np.float32) * 0.5
        new_v = rng.standard_normal((ql, hkv, D), dtype=np.float32) * 0.5
        new_pos = np.arange(ctx, total)
        new_slots = bids[new_pos // BS] * BS + new_pos % BS
        all_k.append(new_k)
        all_v.append(new_v)
        slot_rows.append(new_slots)
        positions[offset : offset + ql] = new_pos
        req_idx[offset : offset + ql] = i
        qsl[i + 1] = qsl[i] + ql
        seq_lens[i] = total
        offset += ql
    qsl[r_actual + 1 :] = qsl[r_actual]

    kv = write_to_kv_cache(
        kv,
        jnp.asarray(np.concatenate(all_k)),
        jnp.asarray(np.concatenate(all_v)),
        jnp.asarray(np.concatenate(slot_rows), dtype=jnp.int32),
    )
    md = AttentionMetadata(
        slot_mapping=jnp.zeros(t, jnp.int32),  # unused here
        block_tables=jnp.asarray(block_tables),
        seq_lens=jnp.asarray(seq_lens),
        query_start_loc=jnp.asarray(qsl),
        req_idx=jnp.asarray(req_idx),
        positions=jnp.asarray(positions),
        num_seqs=jnp.asarray(r_actual, jnp.int32),
    )
    return jnp.asarray(q), kv, md


def _compare(q, kv, md, sm_scale=0.125, window=0, cap=0.0, atol=2e-3):
    out_p = ragged_paged_attention_pallas(
        q, kv, md, sm_scale, window, cap, interpret=True
    )
    out_x = ragged_paged_attention_xla(q, kv, md, sm_scale, window, cap)
    t = int(md.query_start_loc[-1])
    np.testing.assert_allclose(
        np.asarray(out_p)[:t], np.asarray(out_x)[:t], rtol=1e-3, atol=atol
    )


def test_pure_decode(rng):
    q, kv, md = _make_case(rng, seq_lens_ctx=[30, 17, 63, 5], qlens=[1, 1, 1, 1])
    _compare(q, kv, md)


def test_pure_prefill(rng):
    q, kv, md = _make_case(rng, seq_lens_ctx=[0, 0], qlens=[33, 7])
    _compare(q, kv, md)


def test_mixed_batch(rng):
    q, kv, md = _make_case(rng, seq_lens_ctx=[50, 0, 12], qlens=[1, 40, 1])
    _compare(q, kv, md)


def test_long_context_multichunk(rng):
    # context > CKV (=256) forces the chunk loop + DMA double buffering
    q, kv, md = _make_case(
        rng, seq_lens_ctx=[700, 300], qlens=[1, 5], num_blocks=80
    )
    _compare(q, kv, md)


def test_chunked_prefill_continuation(rng):
    # second chunk of a chunked prefill: ctx>0, many new tokens
    q, kv, md = _make_case(rng, seq_lens_ctx=[256], qlens=[128], num_blocks=48)
    _compare(q, kv, md)


def test_mqa(rng):
    q, kv, md = _make_case(rng, seq_lens_ctx=[40], qlens=[3], hq=4, hkv=1)
    _compare(q, kv, md)


def test_equal_heads(rng):
    q, kv, md = _make_case(rng, seq_lens_ctx=[25, 10], qlens=[2, 2], hq=2, hkv=2)
    _compare(q, kv, md)


def test_sliding_window(rng):
    q, kv, md = _make_case(rng, seq_lens_ctx=[100, 0], qlens=[1, 50])
    _compare(q, kv, md, window=32)


def test_soft_cap(rng):
    q, kv, md = _make_case(rng, seq_lens_ctx=[60], qlens=[4])
    _compare(q, kv, md, cap=30.0)


def test_padded_buckets(rng):
    # runner-style padding: token and request buckets exceed the real counts
    q, kv, md = _make_case(
        rng, seq_lens_ctx=[20, 5], qlens=[1, 1], t_bucket=16, r_bucket=8
    )
    _compare(q, kv, md)


def test_bf16(rng):
    q, kv, md = _make_case(rng, seq_lens_ctx=[90, 33], qlens=[1, 17])
    q = q.astype(jnp.bfloat16)
    kv = KVCache(kv.k.astype(jnp.bfloat16), kv.v.astype(jnp.bfloat16))
    _compare(q, kv, md, atol=3e-2)


# ------------------------------------------------ request-batched decode kernel

def _compare_decode(q, kv, md, sm_scale=0.125, window=0, cap=0.0, atol=2e-3,
                    check_supported=True):
    from vllm_metax_tpu.ops.pallas.decode_attention import (
        decode_attention_supported,
        paged_decode_attention_pallas,
    )

    if check_supported:
        assert decode_attention_supported(q, kv, md)
    out_p = paged_decode_attention_pallas(
        q, kv, md, sm_scale, window, cap, interpret=True
    )
    out_x = ragged_paged_attention_xla(q, kv, md, sm_scale, window, cap)
    t = int(md.query_start_loc[-1])
    np.testing.assert_allclose(
        np.asarray(out_p)[:t], np.asarray(out_x)[:t], rtol=1e-3, atol=atol
    )


def test_decode_batched_kernel(rng):
    # 8 requests = exactly one NR tile, ragged context lengths
    q, kv, md = _make_case(
        rng, seq_lens_ctx=[30, 17, 63, 5, 1, 48, 32, 15], qlens=[1] * 8
    )
    _compare_decode(q, kv, md)


def test_decode_batched_multi_tile_and_pads(rng):
    # 11 live requests padded to r_bucket=16 (2 tiles, 5 pad rows w/ seq_len 0)
    ctx = [30, 17, 63, 5, 1, 48, 32, 15, 7, 80, 22]
    q, kv, md = _make_case(
        rng, seq_lens_ctx=ctx, qlens=[1] * 11, t_bucket=16, r_bucket=16
    )
    _compare_decode(q, kv, md)


def test_decode_batched_multichunk(rng):
    # contexts spanning multiple CKV chunks (CKV = 16*BS = 256)
    q, kv, md = _make_case(
        rng,
        seq_lens_ctx=[300, 17, 500, 5, 260, 48, 700, 15],
        qlens=[1] * 8,
        num_blocks=256,
    )
    _compare_decode(q, kv, md)


def test_decode_batched_sliding_window_softcap(rng):
    q, kv, md = _make_case(
        rng, seq_lens_ctx=[300, 17, 500, 5, 260, 48, 700, 15],
        qlens=[1] * 8, num_blocks=256,
    )
    _compare_decode(q, kv, md, window=64, cap=30.0)


def test_decode_batched_mqa_and_wide_gqa(rng):
    q, kv, md = _make_case(rng, seq_lens_ctx=[30] * 8, qlens=[1] * 8, hq=8, hkv=1)
    _compare_decode(q, kv, md)
    q, kv, md = _make_case(rng, seq_lens_ctx=[30] * 8, qlens=[1] * 8, hq=8, hkv=8)
    _compare_decode(q, kv, md)


def test_decode_batched_quantized_kv(rng):
    from vllm_metax_tpu.ops.kv_cache import new_kv_cache as _new

    q, kv_f, md = _make_case(rng, seq_lens_ctx=[100, 20, 40, 7, 77, 31, 299, 1],
                             qlens=[1] * 8, num_blocks=128)
    nb = kv_f.k.shape[0]
    kvq = _new(nb, BS, kv_f.num_kv_heads, D, jnp.int8, store_v=True)
    k_tokens = kv_f.k.transpose(0, 2, 1, 3).reshape(nb * BS, kv_f.num_kv_heads, D)
    v_tokens = kv_f.v.transpose(0, 2, 1, 3).reshape(nb * BS, kv_f.num_kv_heads, D)
    slots = jnp.arange(nb * BS, dtype=jnp.int32)
    kvq = write_to_kv_cache(kvq, k_tokens, v_tokens, slots)
    # bs=16 < 128 is fine in interpret mode (the 128 rule is Mosaic tiling)
    _compare_decode(q, kvq, md, atol=0.15, check_supported=False)


@pytest.mark.parametrize("kv_dtype", ["int8", "fp8"])
def test_quantized_kv(rng, kv_dtype):
    """INT8/FP8 KV-cache attention — beyond the reference, whose MACA fp8-KV
    dispatch is stubbed off (csrc/quantization/fp8/metax/quant_utils.cuh:29)."""
    dt = jnp.int8 if kv_dtype == "int8" else jnp.float8_e4m3fn
    # rebuild the case with a quantized cache: re-run writes through the
    # quantizing write path
    from vllm_metax_tpu.ops.kv_cache import new_kv_cache as _new

    import tests.test_pallas_attention as me

    q, kv_f, md = _make_case(rng, seq_lens_ctx=[100, 20], qlens=[1, 9])
    # re-write the dense cache contents into a quantized cache
    nb = kv_f.k.shape[0]
    kvq = _new(nb, BS, kv_f.num_kv_heads, D, dt, store_v=True)
    # walk every slot that holds data: easiest is re-quantizing the full cache
    k_tokens = kv_f.k.transpose(0, 2, 1, 3).reshape(nb * BS, kv_f.num_kv_heads, D)
    v_tokens = kv_f.v.transpose(0, 2, 1, 3).reshape(nb * BS, kv_f.num_kv_heads, D)
    slots = jnp.arange(nb * BS, dtype=jnp.int32)
    kvq = write_to_kv_cache(kvq, k_tokens, v_tokens, slots)
    _compare(q, kvq, md, atol=0.15)  # quantization noise bound
