"""min_tokens, bad_words, logit_bias (reference analogs: vLLM sampling params
semantics, exercised through the vendored v1 sampler/engine tests)."""

import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    SchedulerConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.sample.params import SamplingParams


def _engine(small_model_config, **sched):
    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64, **sched
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    return EngineCore(config)


def _run(engine, prompt, sp, eos=None):
    engine.add_request("r0", prompt, sp, eos_token_id=eos)
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    return toks


def test_min_tokens_suppresses_eos(small_model_config):
    # find what greedy emits first, then forbid stopping on it
    engine = _engine(small_model_config)
    base = _run(engine, [1, 2, 3], SamplingParams(max_tokens=4, temperature=0.0))
    eos = base[0]  # pretend the first emitted token is EOS
    engine2 = _engine(small_model_config)
    toks = _run(
        engine2,
        [1, 2, 3],
        SamplingParams(max_tokens=8, min_tokens=5, temperature=0.0),
        eos=eos,
    )
    # with EOS banned for the first 5 tokens, generation can't stop early;
    # none of the first 5 tokens may be the EOS
    assert len(toks) >= 5
    assert all(t != eos for t in toks[:5])


def test_logit_bias_forces_token(small_model_config):
    engine = _engine(small_model_config)
    sp = SamplingParams(
        max_tokens=4, temperature=0.0, logit_bias={123: 1000.0}
    )
    toks = _run(engine, [1, 2, 3], sp)
    assert toks == [123] * 4


def test_bad_words_bans_tokens(small_model_config):
    engine = _engine(small_model_config)
    base = _run(engine, [1, 2, 3], SamplingParams(max_tokens=6, temperature=0.0))
    engine2 = _engine(small_model_config)
    sp = SamplingParams(max_tokens=6, temperature=0.0)
    sp.bad_words_token_ids = [base[0], base[1]]
    toks = _run(engine2, [1, 2, 3], sp)
    assert all(t not in (base[0], base[1]) for t in toks)


def test_min_tokens_with_multi_step(small_model_config):
    """min_tokens forces single-stepping until satisfied, then multi-step
    resumes — output must still respect the constraint."""
    engine = _engine(small_model_config, num_decode_steps=8)
    base = _run(engine, [4, 5], SamplingParams(max_tokens=4, temperature=0.0))
    eos = base[0]
    engine2 = _engine(small_model_config, num_decode_steps=8)
    toks = _run(
        engine2,
        [4, 5],
        SamplingParams(max_tokens=10, min_tokens=6, temperature=0.0),
        eos=eos,
    )
    assert all(t != eos for t in toks[:6])


def test_parallel_sampling_n(small_model_config):
    """n>1 fans out into n completions; seeded children are reproducible
    (child k uses seed+k) and greedy children are identical."""
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.entrypoints.llm import LLM
    from vllm_metax_tpu.sample.params import SamplingParams

    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=8, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    llm = LLM(engine_config=config)

    out = llm.generate(
        prompt_token_ids=[[1, 2, 3]],
        sampling_params=SamplingParams(n=3, max_tokens=6, temperature=1.0,
                                       seed=7),
    )
    comps = out[0].outputs
    assert [c.index for c in comps] == [0, 1, 2]
    assert all(len(c.token_ids) == 6 for c in comps)

    # child k must equal a standalone request with seed 7+k
    for k in range(3):
        ref = llm.generate(
            prompt_token_ids=[[1, 2, 3]],
            sampling_params=SamplingParams(max_tokens=6, temperature=1.0,
                                           seed=7 + k),
        )
        assert ref[0].outputs[0].token_ids == comps[k].token_ids, k

    # greedy: all children identical
    out = llm.generate(
        prompt_token_ids=[[1, 2, 3]],
        sampling_params=SamplingParams(n=2, max_tokens=6, temperature=0.0),
    )
    a, b = out[0].outputs
    assert a.token_ids == b.token_ids
