"""Tensor-parallel execution tests on the virtual 8-device CPU mesh.

Mirrors the reference's single-node TP tests
(tests/e2e/test_offline_inference_parallel.py:13-30, tensor_parallel_size=2):
TP output must match the single-device output token-for-token.
"""

import jax
import numpy as np
import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ParallelConfig,
    QuantizationConfig,
    SchedulerConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.parallel.mesh import make_tp_mesh
from vllm_metax_tpu.sample.params import SamplingParams


def _run_engine(config, mesh=None, prompts=None, max_tokens=8):
    engine = EngineCore(config, mesh=mesh)
    prompts = prompts or [[1, 2, 3, 4, 5], [9, 8, 7]]
    for i, p in enumerate(prompts):
        engine.add_request(f"r{i}", p, SamplingParams(max_tokens=max_tokens))
    acc = {f"r{i}": [] for i in range(len(prompts))}
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
    return [acc[f"r{i}"] for i in range(len(prompts))]


def _make_config(small_model_config, tp, quant=None):
    return EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        parallel_config=ParallelConfig(tensor_parallel_size=tp),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=quant or QuantizationConfig(),
    )


def test_tp_matches_single_device(small_model_config):
    ref = _run_engine(_make_config(small_model_config, 1))
    mesh = make_tp_mesh(2)
    out = _run_engine(_make_config(small_model_config, 2), mesh=mesh)
    assert out == ref


def test_tp4_wide_heads():
    from vllm_metax_tpu.config import ModelConfig

    mc = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=4,
        vocab_size=512,
        max_position_embeddings=512,
        max_model_len=512,
        dtype="float32",
    )
    ref = _run_engine(_make_config(mc, 1))
    mesh = make_tp_mesh(4)
    out = _run_engine(_make_config(mc, 4), mesh=mesh)
    assert out == ref


def test_tp_quantized_int8(small_model_config):
    qc = QuantizationConfig(method="int8", bits=8)
    ref = _run_engine(_make_config(small_model_config, 1, qc))
    mesh = make_tp_mesh(2)
    out = _run_engine(_make_config(small_model_config, 2, qc), mesh=mesh)
    assert out == ref


def test_tp_quantized_int4(small_model_config):
    qc = QuantizationConfig(method="gptq", bits=4, group_size=32)
    ref = _run_engine(_make_config(small_model_config, 1, qc))
    mesh = make_tp_mesh(2)
    out = _run_engine(_make_config(small_model_config, 2, qc), mesh=mesh)
    assert out == ref


def test_tp_quantized_kv_cache(small_model_config):
    """TP>1 with int8 KV: the (L*NB, H, BS) head-major scale pages must shard
    on the head axis exactly like the values (ADVICE r1: a block-size-axis
    shard has the same flat size, so misindexing is silent)."""
    import dataclasses

    def cfg(tp):
        c = _make_config(small_model_config, tp)
        return dataclasses.replace(
            c, cache_config=CacheConfig(
                block_size=16, num_blocks=64, kv_cache_dtype="int8"
            )
        )

    ref = _run_engine(cfg(1))
    mesh = make_tp_mesh(2)
    out = _run_engine(cfg(2), mesh=mesh)
    assert out == ref


def test_tp_rejects_bad_head_count(small_model_config):
    # 4 q heads / 2 kv heads can't split 8 ways
    mesh = make_tp_mesh(8)
    with pytest.raises(ValueError, match="head counts"):
        _run_engine(_make_config(small_model_config, 8), mesh=mesh)


def _moe_config_for_parallel():
    from vllm_metax_tpu.config import ModelConfig

    return ModelConfig(
        architecture="MixtralForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=128,
        dtype="float32",
    )


def test_ep_matches_single_device():
    """Expert parallelism (experts sharded over the ep mesh axis) must be
    numerically identical to single-device (BASELINE config 5 slice)."""
    from vllm_metax_tpu.config import ParallelConfig
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh

    mc = _moe_config_for_parallel()
    ref = _run_engine(_make_config(mc, 1))

    cfg = _make_config(mc, 1)
    cfg.parallel_config = ParallelConfig(
        tensor_parallel_size=1, expert_parallel_size=2
    )
    out = _run_engine(cfg, mesh=make_tp_mesh(1, 2))
    assert out == ref


def test_ep_x_tp_matches_single_device():
    from vllm_metax_tpu.config import ParallelConfig
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh

    mc = _moe_config_for_parallel()
    ref = _run_engine(_make_config(mc, 1))

    cfg = _make_config(mc, 2)
    cfg.parallel_config = ParallelConfig(
        tensor_parallel_size=2, expert_parallel_size=2
    )
    out = _run_engine(cfg, mesh=make_tp_mesh(2, 2))
    assert out == ref


def test_ep4_quantized_int8():
    from vllm_metax_tpu.config import ParallelConfig, QuantizationConfig
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh

    mc = _moe_config_for_parallel()
    qc = QuantizationConfig(method="int8", bits=8)
    ref = _run_engine(_make_config(mc, 1, qc))

    cfg = _make_config(mc, 1, qc)
    cfg.parallel_config = ParallelConfig(
        tensor_parallel_size=1, expert_parallel_size=4
    )
    out = _run_engine(cfg, mesh=make_tp_mesh(1, 4))
    assert out == ref


def test_tp_gemma2_matches_single_device():
    """Gemma-2 TP: sandwich norms + soft-caps + alternating window under
    shard_map must match single-device token-for-token."""
    from vllm_metax_tpu.config import ModelConfig

    mc = ModelConfig(
        model="dummy-gemma2",
        architecture="Gemma2ForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        tie_word_embeddings=True,
        scale_embeddings=True,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        query_pre_attn_scalar=24,
        sliding_window=16,
        sliding_window_pattern=2,
        hidden_act="gelu_pytorch_tanh",
        dtype="float32",
    )
    ref = _run_engine(_make_config(mc, 1))
    out = _run_engine(_make_config(mc, 2), mesh=make_tp_mesh(2))
    assert out == ref


def test_tp_gpt2_matches_single_device():
    """GPT-2 TP: row-parallel output biases must be added after the psum
    (not multiplied by the shard count)."""
    from vllm_metax_tpu.config import ModelConfig

    mc = ModelConfig(
        model="dummy-gpt2",
        architecture="GPT2LMHeadModel",
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        tie_word_embeddings=True,
        hidden_act="gelu_new",
        dtype="float32",
    )
    ref = _run_engine(_make_config(mc, 1))
    out = _run_engine(_make_config(mc, 2), mesh=make_tp_mesh(2))
    assert out == ref


def test_tp_opt_matches_single_device():
    from vllm_metax_tpu.config import ModelConfig

    mc = ModelConfig(
        model="dummy-opt",
        architecture="OPTForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        tie_word_embeddings=True,
        hidden_act="relu",
        dtype="float32",
    )
    ref = _run_engine(_make_config(mc, 1))
    out = _run_engine(_make_config(mc, 2), mesh=make_tp_mesh(2))
    assert out == ref


def test_tp_gpt_neox_matches_single_device():
    from vllm_metax_tpu.config import ModelConfig

    mc = ModelConfig(
        model="dummy-neox",
        architecture="GPTNeoXForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        dtype="float32",
    )
    ref = _run_engine(_make_config(mc, 1))
    out = _run_engine(_make_config(mc, 2), mesh=make_tp_mesh(2))
    assert out == ref


def test_ep_a2a_matches_single_device(monkeypatch):
    """All-to-all EP dispatch (METAX_TPU_EP_DISPATCH=a2a): token-sharded
    dispatch over the ep axis must match single-device exactly when no
    capacity drops occur (capacity_factor 2 at tiny T·K)."""
    from vllm_metax_tpu.config import ParallelConfig
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh

    monkeypatch.setenv("METAX_TPU_EP_DISPATCH", "a2a")
    mc = _moe_config_for_parallel()
    ref = _run_engine(_make_config(mc, 1))

    cfg = _make_config(mc, 1)
    cfg.parallel_config = ParallelConfig(
        tensor_parallel_size=1, expert_parallel_size=2
    )
    out = _run_engine(cfg, mesh=make_tp_mesh(1, 2))
    assert out == ref


def test_ep_a2a_x_tp_matches_single_device(monkeypatch):
    from vllm_metax_tpu.config import ParallelConfig
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh

    monkeypatch.setenv("METAX_TPU_EP_DISPATCH", "a2a")
    mc = _moe_config_for_parallel()
    ref = _run_engine(_make_config(mc, 1))

    cfg = _make_config(mc, 2)
    cfg.parallel_config = ParallelConfig(
        tensor_parallel_size=2, expert_parallel_size=2
    )
    out = _run_engine(cfg, mesh=make_tp_mesh(2, 2))
    assert out == ref
