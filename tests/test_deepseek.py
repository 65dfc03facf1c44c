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
