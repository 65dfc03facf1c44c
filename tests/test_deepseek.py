"""DeepSeek V2/V3 MLA + MoE: greedy parity with transformers DeepseekV3.

Covers both MLA variants (q_lora_rank set / None), grouped sigmoid routing
with e_score_correction_bias, shared experts, first_k_dense_replace, and TP.
Reference analog: the reference's DeepSeek family is its biggest model stack
(models/deepseek_v2.py) with MLA math at v1/attention/backends/mla/common.py.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_ds_config(q_lora):
    from transformers import DeepseekV3Config

    return DeepseekV3Config(
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        n_routed_experts=8,
        n_shared_experts=1,
        num_experts_per_tok=2,
        n_group=2,
        topk_group=1,
        routed_scaling_factor=1.5,
        norm_topk_prob=True,
        scoring_func="sigmoid",
        first_k_dense_replace=1,
        kv_lora_rank=32,
        q_lora_rank=q_lora,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        qk_head_dim=24,
        head_dim=8,
        vocab_size=256,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )


def _save_and_compare(tmp_path, cfg, tp=1):
    from transformers import DeepseekV3ForCausalLM

    torch.manual_seed(0)
    m = DeepseekV3ForCausalLM(cfg).eval()
    path = str(tmp_path / "tiny_ds")
    m.save_pretrained(path, safe_serialization=True)

    prompt = [1, 5, 9, 13, 200, 47]
    with torch.no_grad():
        hf = m.generate(torch.tensor([prompt]), max_new_tokens=8, do_sample=False)[
            0, len(prompt):
        ].tolist()

    from vllm_metax_tpu.entrypoints.llm import LLM
    from vllm_metax_tpu.sample.params import SamplingParams

    llm = LLM(
        model=path, dtype="float32", max_model_len=256, tensor_parallel_size=tp
    )
    out = llm.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(max_tokens=8, temperature=0.0),
    )
    got = out[0].outputs[0].token_ids
    assert got == hf, (got, hf)


def test_deepseek_v3_parity(tmp_path):
    _save_and_compare(tmp_path, _tiny_ds_config(q_lora=24))


def test_deepseek_no_qlora_parity(tmp_path):
    _save_and_compare(tmp_path, _tiny_ds_config(q_lora=None))


def test_deepseek_tp(tmp_path):
    _save_and_compare(tmp_path, _tiny_ds_config(q_lora=24), tp=2)


def test_deepseek_dummy_engine():
    """Dummy-weight DeepSeek engine runs (MLA block-size coercion included)."""
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
    config = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=64, num_blocks=16),
        scheduler_config=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    assert config.cache_config.block_size == 64
    engine = EngineCore(config)
    engine.add_request(
        "r0", [1, 2, 3], SamplingParams(max_tokens=6, temperature=0.0)
    )
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    assert len(toks) == 6


# ------------------------------------------------- V3.2 sparse indexer

def _v32_model_config(index_topk, dtype="float32"):
    from vllm_metax_tpu.config import ModelConfig

    return ModelConfig(
        architecture="DeepseekV32ForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=256,
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
        index_topk=index_topk,
        index_n_heads=4,
        index_head_dim=16,
        dtype=dtype,
    )


def test_v32_sparse_equals_dense_when_topk_covers_context():
    """With index_topk >= context length the indexer selects every causal
    token, so sparse MLA must reproduce dense MLA exactly (same weights)."""
    import dataclasses

    import jax.numpy as jnp

    from vllm_metax_tpu.models import deepseek
    from vllm_metax_tpu.ops.attention import AttentionMetadata
    from vllm_metax_tpu.ops.kv_cache import new_kv_cache

    cfg = _v32_model_config(index_topk=64)
    params = deepseek.init_params(cfg, seed=0)

    t = 10
    bs, nb_layer = 64, 2
    nl = cfg.num_hidden_layers
    ids = jnp.asarray(np.arange(1, t + 1), jnp.int32)
    md = AttentionMetadata(
        slot_mapping=jnp.arange(t, dtype=jnp.int32),
        block_tables=jnp.asarray([[0, 1]], jnp.int32),
        seq_lens=jnp.asarray([t], jnp.int32),
        query_start_loc=jnp.asarray([0, t], jnp.int32),
        req_idx=jnp.zeros((t,), jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32),
        num_seqs=jnp.asarray(1, jnp.int32),
    )
    spec = deepseek.kv_cache_spec(cfg)
    kv_sparse = new_kv_cache(
        nl * nb_layer, bs, 1, spec["head_dim"], jnp.float32,
        model_dtype=jnp.float32, store_v=False, v_dim=spec["v_dim"],
    )
    hidden_sparse, _ = deepseek.forward(params, ids, kv_sparse, md, cfg)

    dense_cfg = dataclasses.replace(cfg, index_topk=0)
    kv_dense = new_kv_cache(
        nl * nb_layer, bs, 1, spec["head_dim"], jnp.float32,
        model_dtype=jnp.float32, store_v=False,
    )
    hidden_dense, _ = deepseek.forward(params, ids, kv_dense, md, dense_cfg)
    np.testing.assert_allclose(
        np.asarray(hidden_sparse), np.asarray(hidden_dense),
        rtol=1e-5, atol=1e-5,
    )


def test_indexer_topk_vs_numpy(rng):
    """indexer_topk == naive numpy Σ_h w·relu(q·k) + causal mask + top-k."""
    import jax.numpy as jnp

    from vllm_metax_tpu.models.deepseek import indexer_topk
    from vllm_metax_tpu.ops.attention import AttentionMetadata
    from vllm_metax_tpu.ops.kv_cache import new_kv_cache, write_to_kv_cache

    t, nh, di, bs, K = 6, 3, 16, 16, 4
    ctx = 40  # > 2 chunks with chunk_tokens=32
    q = rng.standard_normal((t, nh, di)).astype(np.float32)
    w = rng.standard_normal((t, nh)).astype(np.float32)
    k_rows = rng.standard_normal((ctx, di)).astype(np.float32)

    nb = -(-ctx // bs)
    kv = new_kv_cache(nb, bs, 1, 48, jnp.float32, model_dtype=jnp.float32,
                      store_v=False, v_dim=di)
    kv = write_to_kv_cache(
        kv,
        jnp.zeros((ctx, 1, 48), jnp.float32),
        jnp.asarray(k_rows)[:, None, :],
        jnp.arange(ctx, dtype=jnp.int32),
    )
    positions = np.asarray([10, 17, 25, 33, 38, 39], np.int32)
    md = AttentionMetadata(
        slot_mapping=jnp.zeros(t, jnp.int32),
        block_tables=jnp.arange(nb, dtype=jnp.int32)[None, :],
        seq_lens=jnp.asarray([ctx], jnp.int32),
        query_start_loc=jnp.asarray([0, t], jnp.int32),
        req_idx=jnp.zeros((t,), jnp.int32),
        positions=jnp.asarray(positions),
        num_seqs=jnp.asarray(1, jnp.int32),
    )
    got = np.asarray(indexer_topk(jnp.asarray(q), jnp.asarray(w), kv, md, K,
                                  chunk_tokens=32))

    logits = np.einsum("th,thc->tc", w,
                       np.maximum(np.einsum("thd,cd->thc", q, k_rows), 0.0))
    for i in range(t):
        valid = np.arange(ctx) <= positions[i]
        n_sel = min(K, int(valid.sum()))
        masked = np.where(valid, logits[i], -np.inf)
        ref_ids = np.argsort(masked)[::-1][:n_sel]
        got_ids = [int(x) for x in got[i] if x >= 0]
        assert len(got_ids) == n_sel
        assert all(valid[g] for g in got_ids), (i, got_ids)  # causal only
        # float-rounding may swap near-ties between the chunked jax einsum
        # and numpy; require the selected logit MASS to match the true top-k
        np.testing.assert_allclose(
            sorted(masked[got_ids]), sorted(masked[ref_ids]), atol=1e-4
        )


def test_v32_engine_sparse_decode():
    """End-to-end V3.2 engine with index_topk < context: decode runs the
    genuinely sparse path and produces deterministic tokens."""
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    mc = _v32_model_config(index_topk=8)
    config = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=64, num_blocks=16),
        scheduler_config=SchedulerConfig(max_num_seqs=2,
                                         max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    engine = EngineCore(config)
    prompt = list(range(1, 13))  # 12 > index_topk=8 → sparse from step one
    engine.add_request("r0", prompt,
                       SamplingParams(max_tokens=6, temperature=0.0))
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    assert len(toks) == 6


def test_v32_query_chunking_matches_unchunked(tmp_path_factory):
    """The query-chunked sparse path (bounded workspace) must equal the
    single-shot path bit-for-bit."""
    import jax.numpy as jnp

    from vllm_metax_tpu.models import deepseek
    from vllm_metax_tpu.ops.attention import AttentionMetadata
    from vllm_metax_tpu.ops.kv_cache import new_kv_cache

    cfg = _v32_model_config(index_topk=8)
    params = deepseek.init_params(cfg, seed=0)
    spec = deepseek.kv_cache_spec(cfg)
    t = 24
    bs, nb_layer = 64, 2
    ids = jnp.asarray(np.arange(1, t + 1), jnp.int32)
    md = AttentionMetadata(
        slot_mapping=jnp.arange(t, dtype=jnp.int32),
        block_tables=jnp.asarray([[0, 1]], jnp.int32),
        seq_lens=jnp.asarray([t], jnp.int32),
        query_start_loc=jnp.asarray([0, t], jnp.int32),
        req_idx=jnp.zeros((t,), jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32),
        num_seqs=jnp.asarray(1, jnp.int32),
    )

    def run(chunk_q):
        import unittest.mock as mock

        kv = new_kv_cache(
            cfg.num_hidden_layers * nb_layer, bs, 1, spec["head_dim"],
            jnp.float32, model_dtype=jnp.float32, store_v=False,
            v_dim=spec["v_dim"],
        )
        orig = deepseek._v32_sparse_attend
        with mock.patch.object(
            deepseek, "_v32_sparse_attend",
            lambda *a, **k: orig(*a, **{**k, "chunk_q": chunk_q}),
        ):
            hidden, _ = deepseek.forward(params, ids, kv, md, cfg)
        return np.asarray(hidden)

    np.testing.assert_allclose(run(64), run(8), rtol=1e-5, atol=1e-5)
