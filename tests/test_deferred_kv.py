"""Deferred KV-write decode: attention reads the current token's K/V from
k_cur/v_cur while the pool write is batched into ONE all-layer scatter after
the layer scan (ops/kv_cache.py write_all_layers_to_kv_cache).

Parity contract: deferred Pallas decode kernel == deferred XLA reference ==
eager XLA on the fully-written cache (the poisoned current-token slots prove
the deferred paths never read the pool row — NaNs would propagate).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pallas_attention import BS, D, _make_case
from vllm_metax_tpu.ops.attention import ragged_paged_attention_xla
from vllm_metax_tpu.ops.kv_cache import (
    KVCache,
    new_kv_cache,
    write_all_layers_to_kv_cache,
    write_to_kv_cache,
)
from vllm_metax_tpu.ops.pallas.decode_attention import (
    paged_decode_attention_pallas,
)


def _split_current(rng, kv, md):
    """Pull each request's last-token K/V out of the written cache, then
    poison that pool row with NaN so only k_cur/v_cur can supply it."""
    bt = np.asarray(md.block_tables)
    sls = np.asarray(md.seq_lens)
    r = sls.shape[0]
    hkv = kv.num_kv_heads
    k_np = np.asarray(kv.k, np.float32).copy()
    v_np = np.asarray(kv.v, np.float32).copy()
    ksc = None if kv.k_scale is None else np.asarray(kv.k_scale).copy()
    vsc = None if kv.v_scale is None else np.asarray(kv.v_scale).copy()
    k_cur = np.zeros((r, hkv, D), np.float32)
    v_cur = np.zeros((r, hkv, D), np.float32)
    for i in range(r):
        if sls[i] == 0:
            continue
        last = sls[i] - 1
        b, off = bt[i, last // BS], last % BS
        kc, vc = k_np[b, :, off, :], v_np[b, :, off, :]
        if ksc is not None:  # stored values are quantized — dequant to fresh
            kc = kc * ksc[b, :, off][:, None]
            vc = vc * vsc[b, :, off][:, None]
        k_cur[i], v_cur[i] = kc, vc
        k_np[b, :, off, :] = np.nan
        v_np[b, :, off, :] = np.nan
        if ksc is not None:
            ksc[b, :, off] = np.nan
            vsc[b, :, off] = np.nan
    poisoned = KVCache(
        jnp.asarray(k_np).astype(kv.k.dtype),
        jnp.asarray(v_np).astype(kv.v.dtype),
        None if ksc is None else jnp.asarray(ksc),
        None if vsc is None else jnp.asarray(vsc),
    )
    return poisoned, jnp.asarray(k_cur), jnp.asarray(v_cur)


def _check(rng, ctx_lens, atol=2e-3, quantized=False, **kw):
    q, kv, md = _make_case(
        rng, seq_lens_ctx=ctx_lens, qlens=[1] * len(ctx_lens), **kw
    )
    if quantized:
        nb = kv.k.shape[0]
        kvq = new_kv_cache(nb, BS, kv.num_kv_heads, D, jnp.int8)
        k_tok = kv.k.transpose(0, 2, 1, 3).reshape(nb * BS, kv.num_kv_heads, D)
        v_tok = kv.v.transpose(0, 2, 1, 3).reshape(nb * BS, kv.num_kv_heads, D)
        kv = write_to_kv_cache(
            kvq, k_tok, v_tok, jnp.arange(nb * BS, dtype=jnp.int32)
        )
    poisoned, k_cur, v_cur = _split_current(rng, kv, md)
    eager = ragged_paged_attention_xla(q, kv, md, 0.125)
    def_xla = ragged_paged_attention_xla(
        q, poisoned, md, 0.125, k_cur=k_cur, v_cur=v_cur
    )
    def_pal = paged_decode_attention_pallas(
        q, poisoned, md, 0.125, k_cur=k_cur, v_cur=v_cur, interpret=True
    )
    t = int(md.query_start_loc[-1])
    np.testing.assert_allclose(
        np.asarray(def_xla)[:t], np.asarray(eager)[:t], rtol=1e-3, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(def_pal)[:t], np.asarray(eager)[:t], rtol=1e-3, atol=atol
    )


def test_deferred_decode_basic(rng):
    _check(rng, [30, 17, 63, 5, 1, 48, 32, 15])


def test_deferred_decode_block_edges(rng):
    # current token at the first slot of a fresh block (ctx % BS == 0) and at
    # the last slot of a block — the in-kernel store must hit both
    _check(rng, [BS, BS - 1, 2 * BS, 31, 16, 1, 63, 64])


def test_deferred_decode_multichunk_and_pads(rng):
    # contexts beyond one CKV chunk + pad rows (seq_len 0)
    _check(
        rng,
        [300, 17, 500, 5, 260, 48, 700, 15, 7, 80, 22],
        t_bucket=16,
        r_bucket=16,
        num_blocks=256,
    )


def test_deferred_decode_quantized(rng):
    # in-kernel quantization of the fresh row must match the pool write
    # bit-for-bit (same amax/round formula)
    _check(rng, [100, 20, 40, 7, 77, 31, 299, 1], num_blocks=128,
           quantized=True, atol=0.15)


@pytest.mark.parametrize("quantized", [False, True])
def test_write_all_layers_sorted_path(rng, quantized, monkeypatch):
    # full bucket, distinct blocks, NO pads -> the rows form takes the
    # sorted-scatter branch; must still match the per-layer writes
    monkeypatch.setenv("METAX_TPU_KV_COMMIT", "rows")
    n_layers, nb_layer, h, bs, d = 3, 8, 2, 8, 16
    nb = n_layers * nb_layer
    dtype = jnp.int8 if quantized else jnp.float32
    pool_a = new_kv_cache(nb, bs, h, d, dtype)
    pool_b = pool_a
    # unsorted distinct blocks, one token each (decode-step shape)
    slots = jnp.asarray([5 * bs + 3, 2 * bs + 7, 7 * bs, 0, 3 * bs + 1],
                        jnp.int32)
    t = slots.shape[0]
    ks = jnp.asarray(rng.standard_normal((n_layers, t, h, d), np.float32))
    vs = jnp.asarray(rng.standard_normal((n_layers, t, h, d), np.float32))
    for l in range(n_layers):
        pool_a = write_to_kv_cache(pool_a, ks[l], vs[l],
                                   slots + l * nb_layer * bs)
    pool_b = write_all_layers_to_kv_cache(pool_b, ks, vs, slots, nb_layer)
    np.testing.assert_array_equal(np.asarray(pool_a.k), np.asarray(pool_b.k))
    np.testing.assert_array_equal(np.asarray(pool_a.v), np.asarray(pool_b.v))
    if quantized:
        np.testing.assert_array_equal(
            np.asarray(pool_a.k_scale), np.asarray(pool_b.k_scale)
        )


@pytest.mark.parametrize("form", ["dus", "rows", "block"])
@pytest.mark.parametrize("quantized", [False, True])
def test_write_all_layers_matches_per_layer(rng, quantized, form, monkeypatch):
    monkeypatch.setenv("METAX_TPU_KV_COMMIT", form)
    n_layers, nb_layer, h, bs, d = 3, 4, 2, 8, 16
    nb = n_layers * nb_layer
    dtype = jnp.int8 if quantized else jnp.float32
    pool_a = new_kv_cache(nb, bs, h, d, dtype)
    pool_b = pool_a
    t = 5
    slots = jnp.asarray([0, 9, 17, 31, nb_layer * bs], jnp.int32)  # last=pad
    ks = jnp.asarray(rng.standard_normal((n_layers, t, h, d), np.float32))
    vs = jnp.asarray(rng.standard_normal((n_layers, t, h, d), np.float32))
    for l in range(n_layers):
        # per-layer path offsets slots into layer l's range; the pad slot
        # sentinel is the FULL pool size as the runner uses
        sl = jnp.where(
            slots >= nb_layer * bs, nb * bs, slots + l * nb_layer * bs
        )
        pool_a = write_to_kv_cache(pool_a, ks[l], vs[l], sl)
    pool_b = write_all_layers_to_kv_cache(
        pool_b, ks, vs, jnp.where(slots >= nb_layer * bs, nb * bs, slots),
        nb_layer,
    )
    np.testing.assert_array_equal(np.asarray(pool_a.k), np.asarray(pool_b.k))
    np.testing.assert_array_equal(np.asarray(pool_a.v), np.asarray(pool_b.v))
    if quantized:
        np.testing.assert_array_equal(
            np.asarray(pool_a.k_scale), np.asarray(pool_b.k_scale)
        )
        np.testing.assert_array_equal(
            np.asarray(pool_a.v_scale), np.asarray(pool_b.v_scale)
        )
