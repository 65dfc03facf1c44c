"""Pipeline-parallel execution tests on the virtual 8-device CPU mesh.

Mirrors the reference's engine-level PP support (PP column of
docs/models/supported_models.md; vLLM v1 keeps pp_size batches in flight
across stage workers). Here PP is intra-program SPMD pipelining
(parallel/pipeline.py): layer banks + the layer-major KV page pool shard
over the "pp" mesh axis and activations ppermute stage-to-stage inside one
jitted step. Output must match single-device token-for-token.
"""

import dataclasses

import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ModelConfig,
    ParallelConfig,
    QuantizationConfig,
    SchedulerConfig,
)
from vllm_metax_tpu.parallel.mesh import make_tp_mesh

from tests.test_parallel import _make_config, _run_engine


def _pp_config(mc, pp, tp=1, quant=None, **cache_kw):
    cfg = _make_config(mc, tp, quant)
    cfg.parallel_config = ParallelConfig(
        tensor_parallel_size=tp, pipeline_parallel_size=pp
    )
    if cache_kw:
        cfg = dataclasses.replace(
            cfg, cache_config=CacheConfig(block_size=16, num_blocks=64, **cache_kw)
        )
    return cfg


def test_pp2_matches_single_device(small_model_config):
    ref = _run_engine(_make_config(small_model_config, 1))
    out = _run_engine(
        _pp_config(small_model_config, 2),
        mesh=make_tp_mesh(1, pp_size=2),
    )
    assert out == ref


def test_pp2_x_tp2_matches_single_device(small_model_config):
    ref = _run_engine(_make_config(small_model_config, 1))
    out = _run_engine(
        _pp_config(small_model_config, 2, tp=2),
        mesh=make_tp_mesh(2, pp_size=2),
    )
    assert out == ref


def test_pp4_deep_stack():
    """4 stages x 1 layer each, long enough decode to cross block boundaries."""
    mc = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        dtype="float32",
    )
    ref = _run_engine(_make_config(mc, 1), max_tokens=24)
    out = _run_engine(
        _pp_config(mc, 4), mesh=make_tp_mesh(1, pp_size=4), max_tokens=24
    )
    assert out == ref


def test_pp2_quantized_int4(small_model_config):
    qc = QuantizationConfig(method="gptq", bits=4, group_size=32)
    ref = _run_engine(_make_config(small_model_config, 1, qc))
    out = _run_engine(
        _pp_config(small_model_config, 2, quant=qc),
        mesh=make_tp_mesh(1, pp_size=2),
    )
    assert out == ref


def test_pp2_microbatched_multistep_decode(small_model_config):
    """16 decode rows + multi-step windows → pick_microbatches yields MB=2:
    the warmup/drain tick gating and per-microbatch metadata slicing must be
    token-exact vs single-device."""

    def cfg(pp):
        c = _pp_config(small_model_config, pp) if pp > 1 else _make_config(
            small_model_config, 1
        )
        return dataclasses.replace(
            c,
            scheduler_config=SchedulerConfig(
                max_num_seqs=16, max_num_batched_tokens=128, num_decode_steps=4
            ),
        )

    prompts = [[(7 * i + 3) % 100 + 1, (5 * i) % 100 + 1, i + 1] for i in range(16)]
    ref = _run_engine(cfg(1), prompts=prompts, max_tokens=12)
    out = _run_engine(
        cfg(2), mesh=make_tp_mesh(1, pp_size=2), prompts=prompts, max_tokens=12
    )
    assert out == ref


def test_pp2_rejects_indivisible_layers(small_model_config):
    mc = dataclasses.replace(small_model_config, num_hidden_layers=3)
    with pytest.raises(ValueError, match="pipeline"):
        _run_engine(_pp_config(mc, 2), mesh=make_tp_mesh(1, pp_size=2))


def test_pp_rejects_unsupported_model():
    """Models without embed/run_layers/finalize must fail loudly, not wrong
    (BaiChuanMoE keeps its monolithic forward)."""
    mc = ModelConfig(
        model="dummy-bcmoe",
        architecture="BaiChuanMoEForCausalLM",
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        num_experts=4,
        num_experts_per_tok=2,
        dtype="float32",
    )
    with pytest.raises(ValueError, match="pipeline"):
        _run_engine(_pp_config(mc, 2), mesh=make_tp_mesh(1, pp_size=2))


def test_pp2_moe_matches_single_device():
    """PP over the MoE stack (models/mixtral.py run_layers split)."""
    mc = ModelConfig(
        architecture="MixtralForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=256,
        num_experts=4,
        num_experts_per_tok=2,
    )
    ref = _run_engine(_make_config(mc, 1))
    out = _run_engine(
        _pp_config(mc, 2),
        mesh=make_tp_mesh(1, pp_size=2),
    )
    assert out == ref


def test_pp2_x_tp2_moe_matches_single_device():
    mc = ModelConfig(
        architecture="Qwen2MoeForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=256,
        num_experts=4,
        num_experts_per_tok=2,
        hf_config={"shared_expert_intermediate_size": 32},
    )
    ref = _run_engine(_make_config(mc, 1))
    out = _run_engine(
        _pp_config(mc, 2, tp=2),
        mesh=make_tp_mesh(2, pp_size=2),
    )
    assert out == ref


def test_pp2_gemma2_odd_local_layers():
    """Gemma-2 under PP: the even/odd sliding-window alternation must use
    GLOBAL layer parity — 6 layers / pp2 gives each stage an ODD count, so
    a local-parity bug would flip stage 1's window schedule."""
    mc = ModelConfig(
        architecture="Gemma2ForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=6,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        vocab_size=256,
        max_position_embeddings=256,
        sliding_window=32,
        sliding_window_pattern=2,
        scale_embeddings=True,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        hidden_act="gelu_pytorch_tanh",
        tie_word_embeddings=True,
    )
    ref = _run_engine(_make_config(mc, 1), prompts=[list(range(40, 80))])
    out = _run_engine(
        _pp_config(mc, 2),
        mesh=make_tp_mesh(1, pp_size=2),
        prompts=[list(range(40, 80))],
    )
    assert out == ref


@pytest.mark.parametrize("arch,extra", [
    ("GPT2LMHeadModel", dict(hidden_act="gelu_new", tie_word_embeddings=True)),
    ("OPTForCausalLM", dict(hidden_act="relu", tie_word_embeddings=True)),
    ("GPTNeoXForCausalLM", dict(hidden_act="gelu")),
])
def test_pp2_legacy_families(arch, extra):
    """PP for the learned-position / LayerNorm families (md-aware embed)."""
    mc = ModelConfig(
        architecture=arch,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=256,
        max_position_embeddings=256,
        **extra,
    )
    ref = _run_engine(_make_config(mc, 1))
    out = _run_engine(
        _pp_config(mc, 2),
        mesh=make_tp_mesh(1, pp_size=2),
    )
    assert out == ref
