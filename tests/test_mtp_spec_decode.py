"""DeepSeek MTP speculative decoding.

Reference analog: vllm_metax/models/deepseek_mtp.py (the MTP spec layer) +
vLLM v1's MTP proposer flow. Drafts are argmax of the MTP head — a
point-mass proposal, so the runner's prefix-accept verification is exact
rejection sampling: greedy output with spec ON must equal spec OFF
token-for-token, regardless of the drafts' quality.
"""

import dataclasses

import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.sample.params import SamplingParams


def _mc(**kw):
    base = dict(
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
        num_nextn_predict_layers=1,
        dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def _config(mtp: bool):
    spec = (
        SpeculativeConfig(method="mtp", num_speculative_tokens=1)
        if mtp
        else SpeculativeConfig()
    )
    return EngineConfig(
        model_config=_mc(),
        cache_config=CacheConfig(block_size=64, num_blocks=16),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
        speculative_config=spec,
    )


def _run(config, prompts, max_tokens=12):
    engine = EngineCore(config)
    for i, p in enumerate(prompts):
        engine.add_request(
            f"r{i}", p, SamplingParams(max_tokens=max_tokens, temperature=0.0)
        )
    acc = {f"r{i}": [] for i in range(len(prompts))}
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
        steps += 1
        assert steps < 200
    return [acc[f"r{i}"] for i in range(len(prompts))], steps


PROMPTS = [[1, 5, 9, 13, 200, 47], [7, 3, 11]]


def test_mtp_greedy_parity_spec_on_off():
    ref, _ = _run(_config(mtp=False), PROMPTS)
    out, _ = _run(_config(mtp=True), PROMPTS)
    assert out == ref


def test_mtp_kv_pool_has_extra_layer():
    cfg = _config(mtp=True)
    engine = EngineCore(cfg)
    layers = cfg.model_config.num_hidden_layers
    nb = cfg.cache_config.num_blocks
    assert engine.runner.kv_cache.k.shape[0] == (layers + 1) * nb
    assert cfg.model_config.mtp_enabled


def test_mtp_drafts_are_scheduled():
    """At least one verify step must schedule a draft row (the head exists
    and flows through scheduler.external_drafts)."""
    engine = EngineCore(_config(mtp=True))
    engine.add_request(
        "r0", PROMPTS[0], SamplingParams(max_tokens=8, temperature=0.0)
    )
    saw_draft = False
    steps = 0
    while engine.has_unfinished_requests():
        so = engine.scheduler.schedule()
        if so.num_scheduled_spec_tokens:
            saw_draft = True
        runner_out = engine.runner.execute_model(so)
        sampled = dict(
            zip(runner_out.req_ids, runner_out.sampled_token_ids)
        )
        engine.scheduler.update_from_output(so, sampled)
        from vllm_metax_tpu.core.request import RequestStatus

        for rid, drafts in runner_out.draft_tokens.items():
            req = engine.scheduler.requests.get(rid)
            if req is not None and req.status == RequestStatus.RUNNING:
                req.spec_token_ids = list(drafts)
        steps += 1
        assert steps < 100
    assert saw_draft


def test_mtp_requires_mla():
    with pytest.raises(ValueError, match="MLA"):
        EngineConfig(
            model_config=ModelConfig(architecture="LlamaForCausalLM"),
            speculative_config=SpeculativeConfig(
                method="mtp", num_speculative_tokens=1
            ),
        )


def test_mtp_rejects_multi_step():
    cfg = _config(mtp=True)
    cfg = dataclasses.replace(
        cfg,
        scheduler_config=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64, num_decode_steps=4
        ),
    )
    with pytest.raises(ValueError, match="multi-step"):
        EngineCore(cfg)


def test_mtp_dcp2_matches_single_device():
    """MTP spec decode under decode-context parallelism: the draft layer's
    KV pages shard over dcp with the pool (runner localizes the metadata at
    the draft call). Token-exact vs the single-device MTP engine (ref:
    the reference is DCP-aware through mla/common.py:796-883 and its MTP
    layer rides the same backend)."""
    import dataclasses

    from vllm_metax_tpu.config import ParallelConfig
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh
    from vllm_metax_tpu.core.engine import EngineCore

    ref, _ = _run(_config(mtp=True), PROMPTS)

    cfg = _config(mtp=True)
    cfg = dataclasses.replace(
        cfg,
        parallel_config=ParallelConfig(
            tensor_parallel_size=1, decode_context_parallel_size=2
        ),
    )
    engine = EngineCore(cfg, mesh=make_tp_mesh(1, dcp_size=2))
    for i, p in enumerate(PROMPTS):
        engine.add_request(
            f"r{i}", p, SamplingParams(max_tokens=12, temperature=0.0)
        )
    acc = {f"r{i}": [] for i in range(len(PROMPTS))}
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
        steps += 1
        assert steps < 200
    assert [acc[f"r{i}"] for i in range(len(PROMPTS))] == ref
