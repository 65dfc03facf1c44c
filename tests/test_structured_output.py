"""Structured outputs (guided choice) — reference analog: the engine's
xgrammar-backed structured-output stack and tests."""

import numpy as np
import pytest

from vllm_metax_tpu.structured_output import ChoiceConstraint


def test_choice_constraint_fsm():
    c = ChoiceConstraint([[5, 6, 7], [5, 9], [11]], eos_token_id=2)
    assert c.allowed_tokens([]) == [5, 11]
    assert c.allowed_tokens([5]) == [6, 9]
    assert c.allowed_tokens([5, 6]) == [7]
    assert c.allowed_tokens([5, 9]) == [2]  # complete → EOS
    assert c.allowed_tokens([5, 6, 7]) == [2]
    assert c.allowed_tokens([99]) == [2]  # dead end → force stop


def test_guided_choice_engine(small_model_config):
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    engine = EngineCore(config)
    choices = [[10, 11, 12], [20, 21], [30]]
    sp = SamplingParams(max_tokens=8, temperature=0.0)
    sp._guided_token_choices = choices
    engine.add_request("r0", [1, 2, 3], sp, eos_token_id=2)
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    # emitted tokens (minus the final EOS) must be exactly one of the choices
    body = toks[:-1] if toks and toks[-1] == 2 else toks
    assert body in choices, toks


def test_guided_choice_with_sampling(small_model_config):
    """Random sampling stays within the constraint set."""
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    engine = EngineCore(config)
    choices = [[10, 11], [20, 21], [30, 31]]
    for i in range(3):
        sp = SamplingParams(max_tokens=8, temperature=1.0, seed=i)
        sp._guided_token_choices = choices
        engine.add_request(f"r{i}", [1, 2, 3 + i], sp, eos_token_id=2)
    acc = {f"r{i}": [] for i in range(3)}
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
    for toks in acc.values():
        body = toks[:-1] if toks and toks[-1] == 2 else toks
        assert body in choices, toks
