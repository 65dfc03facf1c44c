"""Multi-step on-device decode must match classic per-step decode exactly
(greedy), across batch compositions and mid-stream EOS."""

import numpy as np
import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    SchedulerConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.sample.params import SamplingParams


def _run(small_model_config, num_decode_steps, prompts, sampling=None,
         eos=None, num_blocks=64):
    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=num_blocks),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4,
            max_num_batched_tokens=64,
            num_decode_steps=num_decode_steps,
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    engine = EngineCore(config)
    for i, p in enumerate(prompts):
        sp = sampling[i] if sampling else SamplingParams(max_tokens=12, temperature=0.0)
        engine.add_request(f"r{i}", p, sp, eos_token_id=eos)
    acc = {f"r{i}": [] for i in range(len(prompts))}
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
        steps += 1
        assert steps < 200
    return [acc[f"r{i}"] for i in range(len(prompts))], steps


@pytest.mark.parametrize("m", [4, 8])
def test_multi_step_matches_single(small_model_config, m):
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [100, 200]]
    ref, ref_steps = _run(small_model_config, 1, prompts)
    out, steps = _run(small_model_config, m, prompts)
    assert out == ref
    assert steps < ref_steps  # actually fewer host steps


def test_multi_step_mid_stream_stop(small_model_config):
    # max_tokens not a multiple of M: truncation of the overshoot tokens
    prompts = [[1, 2, 3]]
    sp = [SamplingParams(max_tokens=5, temperature=0.0)]
    ref, _ = _run(small_model_config, 1, prompts, sampling=sp)
    out, _ = _run(small_model_config, 8, prompts, sampling=sp)
    assert out == ref
    assert len(out[0]) == 5


def test_multi_step_different_lengths(small_model_config):
    prompts = [[1, 2, 3], [5, 6]]
    sp = [SamplingParams(max_tokens=3, temperature=0.0), SamplingParams(max_tokens=11, temperature=0.0)]
    ref, _ = _run(small_model_config, 1, prompts, sampling=sp)
    out, _ = _run(small_model_config, 4, prompts, sampling=sp)
    assert out == ref


def test_multi_step_with_penalties_falls_back(small_model_config):
    # penalties need host-rebuilt history → must still be correct (single-step)
    prompts = [[1, 2, 3, 4]]
    sp = [SamplingParams(max_tokens=8, temperature=0.0, repetition_penalty=1.3)]
    ref, _ = _run(small_model_config, 1, prompts, sampling=sp)
    out, _ = _run(small_model_config, 8, prompts, sampling=sp)
    assert out == ref


def test_penalties_ride_the_window(small_model_config):
    """Repetition/frequency penalties no longer force single-stepping: the
    on-device count carry must reproduce the single-step outputs exactly."""
    import dataclasses

    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    def run(steps):
        cfg = EngineConfig(
            model_config=small_model_config,
            cache_config=CacheConfig(block_size=16, num_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_seqs=4,
                max_num_batched_tokens=128,
                num_decode_steps=steps,
            ),
            load_config=LoadConfig(load_format="dummy", seed=0),
        )
        engine = EngineCore(cfg)
        sp = SamplingParams(
            max_tokens=12,
            temperature=0.0,
            repetition_penalty=1.3,
            presence_penalty=0.4,
            frequency_penalty=0.2,
        )
        engine.add_request("a", [1, 5, 9, 13], sp)
        engine.add_request("b", [7, 3, 2], dataclasses.replace(sp))
        acc = {"a": [], "b": []}
        while engine.has_unfinished_requests():
            for out in engine.step():
                acc[out.req_id].extend(out.new_token_ids)
        return acc

    ref = run(1)
    win = run(4)
    assert win == ref
    assert len(ref["a"]) == 12


def test_bans_bias_min_tokens_ride_the_window(small_model_config):
    """min_tokens / bad_words / logit_bias no longer force single-stepping."""
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    def run(steps):
        cfg = EngineConfig(
            model_config=small_model_config,
            cache_config=CacheConfig(block_size=16, num_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_seqs=4,
                max_num_batched_tokens=128,
                num_decode_steps=steps,
            ),
            load_config=LoadConfig(load_format="dummy", seed=0),
        )
        engine = EngineCore(cfg)
        sp = SamplingParams(
            max_tokens=10,
            temperature=0.0,
            min_tokens=6,
            bad_words_token_ids=[17, 42],
            logit_bias={99: 4.0, 7: -6.0},
        )
        engine.add_request("a", [1, 5, 9, 13], sp, eos_token_id=3)
        acc = []
        while engine.has_unfinished_requests():
            for out in engine.step():
                acc.extend(out.new_token_ids)
        return acc

    ref = run(1)
    win = run(4)
    assert win == ref
    assert 17 not in win and 42 not in win
