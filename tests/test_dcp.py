"""Decode-context-parallel tests on the virtual 8-device CPU mesh.

Mirrors the reference's DCP path (vllm_metax/v1/attention/backends/
flash_attn.py:794-830 _forward_with_dcp; csrc/cache_kernels.cu:1075
cp_gather_cache): KV blocks interleave round-robin over dcp ranks and each
rank's partial attention merges via a distributed softmax
(parallel/dcp.py). Output must match single-device token-for-token with
contexts spanning multiple blocks per shard.
"""

import dataclasses

import pytest

from vllm_metax_tpu.config import ParallelConfig, SchedulerConfig
from vllm_metax_tpu.core.kv_cache_manager import KVCacheManager
from vllm_metax_tpu.core.request import Request
from vllm_metax_tpu.parallel.mesh import make_tp_mesh
from vllm_metax_tpu.sample.params import SamplingParams

from tests.test_parallel import _make_config, _run_engine

# block_size=16 (conftest config): 3+ blocks per request so every dcp rank
# owns context of every request
_PROMPTS = [
    [(7 * i + 3) % 100 + 1 for i in range(40)],
    [(5 * i + 11) % 100 + 1 for i in range(37)],
]


def _dcp_config(mc, dcp, tp=1):
    cfg = _make_config(mc, tp)
    cfg.parallel_config = ParallelConfig(
        tensor_parallel_size=tp, decode_context_parallel_size=dcp
    )
    return cfg


def test_dcp2_matches_single_device(small_model_config):
    ref = _run_engine(
        _make_config(small_model_config, 1), prompts=_PROMPTS, max_tokens=24
    )
    out = _run_engine(
        _dcp_config(small_model_config, 2),
        mesh=make_tp_mesh(1, dcp_size=2),
        prompts=_PROMPTS,
        max_tokens=24,
    )
    assert out == ref


def test_dcp2_x_tp2_matches_single_device(small_model_config):
    ref = _run_engine(
        _make_config(small_model_config, 1), prompts=_PROMPTS, max_tokens=16
    )
    out = _run_engine(
        _dcp_config(small_model_config, 2, tp=2),
        mesh=make_tp_mesh(2, dcp_size=2),
        prompts=_PROMPTS,
        max_tokens=16,
    )
    assert out == ref


def test_dcp2_multi_step_decode(small_model_config):
    """Multi-step windows build metadata on device — localization must hold
    across the in-scan block-boundary crossings too."""

    def cfg(dcp):
        c = _dcp_config(small_model_config, dcp) if dcp > 1 else _make_config(
            small_model_config, 1
        )
        return dataclasses.replace(
            c,
            scheduler_config=SchedulerConfig(
                max_num_seqs=8, max_num_batched_tokens=128, num_decode_steps=4
            ),
        )

    ref = _run_engine(cfg(1), prompts=_PROMPTS, max_tokens=20)
    out = _run_engine(
        cfg(2), mesh=make_tp_mesh(1, dcp_size=2), prompts=_PROMPTS,
        max_tokens=20,
    )
    assert out == ref


def test_v32_indexer_dcp2_matches_single_device():
    """DeepSeek-V3.2 sparse indexer under DCP: rank-local indexer logits
    pmax-merge into the exact global top-k, sparse MLA LSE-combines over
    owned rows (models/deepseek.py indexer_topk / mla_sparse_attention_xla;
    ref: cp_gather_indexer_k_quant_cache csrc/cache_kernels.cu:1274 +
    models/deepseek_v2.py:585-727 sparse_attn_indexer)."""
    # index_topk=16 < final context (~60 tokens) → genuinely sparse decode
    ref = _run_engine(
        _v32_engine_config(1), prompts=_PROMPTS, max_tokens=20
    )
    out = _run_engine(
        _v32_engine_config(2),
        mesh=make_tp_mesh(1, dcp_size=2),
        prompts=_PROMPTS,
        max_tokens=20,
    )
    assert out == ref


def _req(req_id, tokens):
    return Request(
        req_id=req_id,
        prompt_token_ids=list(tokens),
        sampling_params=SamplingParams(max_tokens=4),
    )


def test_manager_round_robin_partitions():
    """j-th block of every sequence draws from partition j % dcp; frees
    return to the owning partition."""
    m = KVCacheManager(num_blocks=32, block_size=16, dcp_size=2)
    r = _req("a", range(80))  # 5 blocks
    r.num_computed_tokens = 0
    blocks = m.allocate_slots(r, 80)
    ids = [b.block_id for b in blocks.blocks]
    assert len(ids) == 5
    for j, bid in enumerate(ids):
        assert bid // 16 == j % 2, f"seq block {j} landed in wrong partition"
    free_before = [p.get_num_free_blocks() for p in m.pools]
    m.free(r)
    free_after = [p.get_num_free_blocks() for p in m.pools]
    assert free_after == [f + n for f, n in zip(free_before, [3, 2])]


def test_manager_prefix_cache_hits_across_partitions():
    """A freed 2-block prefix is reused from both partitions."""
    m = KVCacheManager(num_blocks=32, block_size=16, dcp_size=2)
    tokens = list(range(33))  # 2 full blocks + 1 token
    r1 = _req("a", tokens)
    m.allocate_slots(r1, 33)
    m.cache_full_blocks(r1, 32)
    ids1 = m.get_block_ids("a")[:2]
    m.free(r1)
    r2 = _req("b", tokens)
    cached, n = m.get_computed_blocks(r2)
    assert n == 32
    assert [b.block_id for b in cached.blocks] == ids1


def test_manager_partition_exhaustion():
    """Capacity gates on the fullest partition, not the global free count."""
    m = KVCacheManager(num_blocks=4, block_size=16, dcp_size=2,
                       enable_caching=False)
    r1 = _req("a", range(48))  # 3 blocks: partitions get 2 + 1
    assert m.allocate_slots(r1, 48) is not None
    r2 = _req("b", range(48))  # needs 2 from partition 0; only 0 free there
    assert m.allocate_slots(r2, 48) is None


def test_dcp_pallas_decode_kernel_matches_xla(rng):
    """Pallas DCP decode: rank-local partials (sentinel pages masked
    in-kernel) + LSE distributed-softmax combine == single-device XLA."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from tests.test_pallas_attention import BS, _make_case
    from vllm_metax_tpu.ops.attention import ragged_paged_attention_xla
    from vllm_metax_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_pallas,
    )
    from vllm_metax_tpu.parallel.dcp import localize_metadata

    # contexts spanning several blocks so both ranks own pages
    q, kv, md = _make_case(
        rng, seq_lens_ctx=[70, 33, 120, 5, 64, 48, 100, 15], qlens=[1] * 8,
        num_blocks=64,
    )
    ref = ragged_paged_attention_xla(q, kv, md, 0.125)

    dcp = 2
    nbl = kv.k.shape[0] // dcp
    mesh = make_tp_mesh(1, dcp_size=dcp)

    def ranked(q, k, v, md):
        from vllm_metax_tpu.ops.kv_cache import KVCache

        mdl = localize_metadata(md, nbl, BS)
        out_l, lse_l = paged_decode_attention_pallas(
            q, KVCache(k, v), mdl, 0.125, dcp=True, return_lse=True,
            interpret=True,
        )
        lse_max = jnp.maximum(jax.lax.pmax(lse_l, "dcp"), -1e30)
        w = jnp.exp(lse_l - lse_max)
        num = jax.lax.psum(out_l.astype(jnp.float32) * w[..., None], "dcp")
        den = jax.lax.psum(w, "dcp")
        return (num / jnp.maximum(den[..., None], 1e-30)).astype(q.dtype)

    fn = jax.shard_map(
        ranked,
        mesh=mesh,
        in_specs=(P(), P(("pp", "dcp")) if "pp" in mesh.axis_names else P("dcp"), P("dcp"), P()),
        out_specs=P(),
        check_vma=False,
    )
    # pool rows are already globally indexed; shard axis 0 over dcp
    out = fn(q, kv.k, kv.v, md)
    t = int(md.query_start_loc[-1])
    np.testing.assert_allclose(
        np.asarray(out)[:t], np.asarray(ref)[:t], rtol=1e-3, atol=2e-3
    )


# ------------------------------------------------- MLA latent cache x DCP

def _mla_engine_config(dcp, num_decode_steps=1):
    """Dummy-weight DeepSeek (MLA latent cache, store_v=False) under DCP.

    Ref: the reference's DCP-aware MLA path (mla/common.py:563-587,796-883 +
    csrc/cache_kernels.cu:1075 cp_gather_cache) — ours shards latent pages
    round-robin over "dcp" and merges with a distributed softmax
    (models/deepseek.py mla_attention)."""
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        ModelConfig,
    )

    mc = ModelConfig(
        architecture="DeepseekV3ForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        num_experts=4,
        num_experts_per_tok=2,
        num_shared_experts=1,
        first_k_dense_replace=1,
        use_mla=True,
        q_lora_rank=24,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        scoring_func="sigmoid",
        n_group=2,
        topk_group=1,
        dtype="float32",
    )
    return EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            num_decode_steps=num_decode_steps,
        ),
        parallel_config=ParallelConfig(
            tensor_parallel_size=1, decode_context_parallel_size=dcp
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )


def _v32_engine_config(dcp):
    """_mla_engine_config + the V3.2 lightning indexer (sparse MLA)."""
    cfg = _mla_engine_config(dcp)
    cfg.model_config = dataclasses.replace(
        cfg.model_config,
        index_topk=16,
        index_n_heads=4,
        index_head_dim=32,
    )
    return cfg


def test_v32_indexer_dcp2_chunked_query_path():
    """Same as above but with a 100-token prefill chunk so the sparse
    attend takes the query-chunked lax.map branch (>64 rows) — the pmax /
    psum merges must be legal and exact inside the mapped body too."""
    cfgs = []
    for dcp in (1, 2):
        c = _v32_engine_config(dcp)
        c.scheduler_config = SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=128
        )
        cfgs.append(c)
    long_prompt = [(11 * i + 5) % 100 + 1 for i in range(100)]
    ref = _run_engine(cfgs[0], prompts=[long_prompt], max_tokens=8)
    out = _run_engine(
        cfgs[1],
        mesh=make_tp_mesh(1, dcp_size=2),
        prompts=[long_prompt],
        max_tokens=8,
    )
    assert out == ref


def test_mla_dcp2_matches_single_device():
    ref = _run_engine(_mla_engine_config(1), prompts=_PROMPTS, max_tokens=20)
    out = _run_engine(
        _mla_engine_config(2),
        mesh=make_tp_mesh(1, dcp_size=2),
        prompts=_PROMPTS,
        max_tokens=20,
    )
    assert out == ref


def test_mla_dcp2_multi_step():
    ref = _run_engine(
        _mla_engine_config(1, num_decode_steps=4),
        prompts=_PROMPTS, max_tokens=16,
    )
    out = _run_engine(
        _mla_engine_config(2, num_decode_steps=4),
        mesh=make_tp_mesh(1, dcp_size=2),
        prompts=_PROMPTS,
        max_tokens=16,
    )
    assert out == ref
