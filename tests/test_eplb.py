"""EPLB (expert-parallel load balancing): placement math + semantic
neutrality of a live rebalance (ref: fused_moe.py:1273 rearrangement)."""

import numpy as np

from vllm_metax_tpu.parallel.eplb import balanced_placement, rank_loads


def test_balanced_placement_levels_skew():
    loads = np.array([100, 1, 1, 1, 90, 1, 1, 1], np.float64)
    p = balanced_placement(loads, ep=2)
    assert sorted(p.tolist()) == list(range(8))  # a permutation
    rl = rank_loads(loads, p, 2)
    # identity placement puts 103 vs 93; balanced puts the two hot experts
    # on different ranks
    assert abs(rl[0] - rl[1]) <= 10, rl
    assert p[0] // 4 != p[4] // 4  # hot experts split across ranks


def test_rebalance_is_semantically_neutral():
    """Mixtral engine under ep=2: rebalancing with skewed loads must not
    change greedy outputs, and a second rebalance composes correctly."""
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        ModelConfig,
        ParallelConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh
    from vllm_metax_tpu.sample.params import SamplingParams

    mc = ModelConfig(
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

    def build():
        cfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=16, num_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_seqs=2, max_num_batched_tokens=64
            ),
            load_config=LoadConfig(load_format="dummy", seed=0),
            parallel_config=ParallelConfig(
                tensor_parallel_size=1, expert_parallel_size=2
            ),
        )
        return EngineCore(cfg, mesh=make_tp_mesh(1, 2))

    def run(engine, rid):
        engine.add_request(rid, [1, 5, 9, 13],
                           SamplingParams(max_tokens=6, temperature=0.0))
        toks = []
        while engine.has_unfinished_requests():
            for out in engine.step():
                toks.extend(out.new_token_ids)
        return toks

    engine = build()
    ref = run(engine, "a")
    skew = np.array([[50, 1, 40, 1], [1, 60, 1, 30]], np.float64)
    engine.rebalance_experts(skew)
    layers = engine.runner.params["layers"]
    assert "expert_map" in layers
    pm = np.asarray(layers["expert_map"])
    assert any(not np.array_equal(pm[i], np.arange(4)) for i in range(2))
    assert run(engine, "b") == ref
    # second rebalance (map composition over already-permuted banks)
    engine.rebalance_experts(np.array([1, 99, 1, 99], np.float64))
    assert run(engine, "c") == ref


def test_elastic_ep_scale_up_down():
    """Elastic EP (ref: examples/online_serving/elastic_ep/scale.py):
    rescaling the EP world size live must keep greedy outputs invariant
    in both directions (2 -> 4 -> 2)."""
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        ModelConfig,
        ParallelConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh
    from vllm_metax_tpu.sample.params import SamplingParams

    mc = ModelConfig(
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
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(
            max_num_seqs=2, max_num_batched_tokens=64
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
        parallel_config=ParallelConfig(
            tensor_parallel_size=1, expert_parallel_size=2
        ),
    )
    engine = EngineCore(cfg, mesh=make_tp_mesh(1, 2))

    def run(rid):
        engine.add_request(rid, [1, 5, 9, 13],
                           SamplingParams(max_tokens=6, temperature=0.0))
        toks = []
        while engine.has_unfinished_requests():
            for out in engine.step():
                toks.extend(out.new_token_ids)
        return toks

    ref = run("a")
    engine.scale_ep(4)
    assert engine.runner.ep_size == 4
    assert run("b") == ref
    engine.scale_ep(2)
    assert run("c") == ref
