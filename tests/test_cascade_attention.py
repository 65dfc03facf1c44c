"""Cascade / shared-prefix decode attention: splitting the context into a
batch-shared prefix (computed once) and per-request suffixes must be
token-exact vs the plain paged path (ref: cascade_attention,
v1/attention/backends/flash_attn.py:1013)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metax_tpu.ops.attention import (
    AttentionMetadata,
    ragged_paged_attention,
)
from vllm_metax_tpu.ops.kv_cache import new_kv_cache, write_to_kv_cache


def _build(shared_pages, own_pages, r, hkv, g, d, bs, quantized, seed=0):
    rng = np.random.default_rng(seed)
    nb = 64
    dtype = jnp.int8 if quantized else jnp.float32
    cache = new_kv_cache(
        nb, bs, hkv, d, dtype, model_dtype=jnp.float32,
        fused=quantized,
    )
    # shared prefix pages 0..shared_pages-1; request i's own pages follow
    plen = shared_pages * bs
    shared_k = rng.standard_normal((plen, hkv, d)).astype(np.float32)
    shared_v = rng.standard_normal((plen, hkv, d)).astype(np.float32)
    cache = write_to_kv_cache(
        cache, jnp.asarray(shared_k), jnp.asarray(shared_v),
        jnp.arange(plen, dtype=jnp.int32),
    )
    seq_lens = np.zeros(r, np.int32)
    maxb = shared_pages + own_pages
    bt = np.zeros((r, maxb), np.int32)
    for i in range(r):
        own = shared_pages + i * own_pages
        bt[i, :shared_pages] = np.arange(shared_pages)
        bt[i, shared_pages:] = own + np.arange(own_pages)
        n_own = int(rng.integers(1, own_pages * bs))
        seq_lens[i] = plen + n_own
        kv_own_k = rng.standard_normal((n_own, hkv, d)).astype(np.float32)
        kv_own_v = rng.standard_normal((n_own, hkv, d)).astype(np.float32)
        slots = own * bs + np.arange(n_own, dtype=np.int32)
        cache = write_to_kv_cache(
            cache, jnp.asarray(kv_own_k), jnp.asarray(kv_own_v),
            jnp.asarray(slots),
        )
    q = jnp.asarray(
        rng.standard_normal((r, hkv * g, d)).astype(np.float32)
    )
    md = AttentionMetadata(
        slot_mapping=jnp.full((r,), nb * bs, jnp.int32),
        block_tables=jnp.asarray(bt),
        seq_lens=jnp.asarray(seq_lens),
        query_start_loc=jnp.arange(r + 1, dtype=jnp.int32),
        req_idx=jnp.arange(r, dtype=jnp.int32),
        positions=jnp.asarray(seq_lens - 1),
        num_seqs=jnp.asarray(r, jnp.int32),
        decode_only=True,
    )
    return q, cache, md, shared_pages, bs


@pytest.mark.parametrize("quantized", [False, True])
def test_cascade_matches_plain(quantized):
    q, cache, md, sp, bs = _build(
        shared_pages=3, own_pages=2, r=4, hkv=2, g=2, d=128, bs=16,
        quantized=quantized,
    )
    ref = ragged_paged_attention(q, cache, md, sm_scale=0.088)
    # cascade form: shared pages split out, tables shifted left
    bt = np.asarray(md.block_tables)
    md_c = dataclasses.replace(
        md,
        cascade_blocks=jnp.asarray(bt[0, :sp]),
        cascade_tables=jnp.asarray(
            np.concatenate(
                [bt[:, sp:], np.zeros((bt.shape[0], sp), np.int32)], axis=1
            )
        ),
        cascade_len=jnp.asarray(sp * bs, jnp.int32),
    )
    out = ragged_paged_attention(q, cache, md_c, sm_scale=0.088)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def _engine(small_model_config, steps):
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        QuantizationConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore

    return EngineCore(
        EngineConfig(
            model_config=small_model_config,
            cache_config=CacheConfig(
                block_size=16, num_blocks=64, enable_prefix_caching=True
            ),
            scheduler_config=SchedulerConfig(
                max_num_seqs=4,
                max_num_batched_tokens=128,
                num_decode_steps=steps,
            ),
            load_config=LoadConfig(load_format="dummy", seed=0),
            quant_config=QuantizationConfig(),
        )
    )


def test_cascade_engine_token_exact(small_model_config, monkeypatch):
    """Multi-step decode with a batch-shared prompt prefix: cascade on must
    match cascade off token-for-token, and the cascade path must actually
    engage."""
    from vllm_metax_tpu.sample.params import SamplingParams

    rng = np.random.default_rng(11)
    shared = [int(x) for x in rng.integers(1, 200, size=40)]
    prompts = [
        shared + [int(x) for x in rng.integers(1, 200, size=5 + 3 * i)]
        for i in range(3)
    ]

    def run(cascade_on):
        monkeypatch.setenv("METAX_TPU_CASCADE", "1" if cascade_on else "0")
        engine = _engine(small_model_config, steps=8)
        engaged = []
        orig = engine.runner._compute_cascade

        def spy(*a, **kw):
            out = orig(*a, **kw)
            if out is not None:
                engaged.append(int(np.asarray(out[2])))
            return out

        engine.runner._compute_cascade = spy
        # prime the prefix cache so the batch actually SHARES the prefix
        # blocks (concurrently-prefilling requests each compute their own)
        engine.add_request(
            "prime", list(shared), SamplingParams(max_tokens=1,
                                                  temperature=0.0)
        )
        while engine.has_unfinished_requests():
            engine.step()
        for i, p in enumerate(prompts):
            engine.add_request(
                f"r{i}", p, SamplingParams(max_tokens=12, temperature=0.0)
            )
        acc = {f"r{i}": [] for i in range(len(prompts))}
        while engine.has_unfinished_requests():
            for out in engine.step():
                acc[out.req_id].extend(out.new_token_ids)
        return [acc[f"r{i}"] for i in range(len(prompts))], engaged

    toks_on, engaged_on = run(True)
    toks_off, _ = run(False)
    assert toks_on == toks_off
    # shared 40-token prefix = 2 full 16-token blocks actually detected
    assert engaged_on and max(engaged_on) >= 32


def test_cascade_bucket_padding():
    """cascade_blocks padded beyond cascade_len must not change results."""
    q, cache, md, sp, bs = _build(
        shared_pages=2, own_pages=2, r=4, hkv=2, g=2, d=128, bs=16,
        quantized=False, seed=3,
    )
    ref = ragged_paged_attention(q, cache, md, sm_scale=0.125)
    bt = np.asarray(md.block_tables)
    padded = np.concatenate([bt[0, :sp], np.asarray([5, 5], np.int32)])
    md_c = dataclasses.replace(
        md,
        cascade_blocks=jnp.asarray(padded),
        cascade_tables=jnp.asarray(
            np.concatenate(
                [bt[:, sp:], np.zeros((bt.shape[0], sp), np.int32)], axis=1
            )
        ),
        cascade_len=jnp.asarray(sp * bs, jnp.int32),
    )
    out = ragged_paged_attention(q, cache, md_c, sm_scale=0.125)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
