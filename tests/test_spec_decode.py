"""Speculative decoding (ngram) tests.

Mirrors the reference's spec-decode suites (tests/v1/spec_decode/test_ngram.py
for the proposer, tests/v1/e2e/test_spec_decode.py for output equality):
greedy output with spec decode ON must equal spec decode OFF exactly.
"""

import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.sample.params import SamplingParams
from vllm_metax_tpu.spec_decode import NgramProposer


# --------------------------------------------------------------- proposer

def test_ngram_basic_match():
    p = NgramProposer(min_n=2, max_n=3, num_speculative_tokens=3)
    # ... 5 6 7 8 [1 2 3] ... [1 2 3] → propose what followed last time
    toks = [1, 2, 3, 9, 8, 7, 1, 2, 3]
    assert p.propose(toks) == [9, 8, 7]


def test_ngram_prefers_longer_match():
    p = NgramProposer(min_n=1, max_n=3, num_speculative_tokens=2)
    toks = [5, 1, 2, 50, 60, 9, 1, 2, 70, 80, 1, 2]
    # trigram no match; bigram [1,2] most recent earlier occurrence → [70, 80]
    assert p.propose(toks) == [70, 80]


def test_ngram_no_match():
    p = NgramProposer(min_n=2, max_n=3, num_speculative_tokens=2)
    assert p.propose([1, 2, 3, 4, 5, 6]) == []


def test_ngram_truncated_follow():
    p = NgramProposer(min_n=2, max_n=2, num_speculative_tokens=4)
    toks = [1, 2, 9, 1, 2]
    assert p.propose(toks) == [9, 1, 2][:4]


# --------------------------------------------------------------- e2e

def _run(small_model_config, spec, prompts, max_tokens=16):
    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
        speculative_config=spec or SpeculativeConfig(),
    )
    engine = EngineCore(config)
    for i, pr in enumerate(prompts):
        engine.add_request(
            f"r{i}", pr, SamplingParams(max_tokens=max_tokens, temperature=0.0)
        )
    acc = {f"r{i}": [] for i in range(len(prompts))}
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
        steps += 1
        assert steps < 300
    return [acc[f"r{i}"] for i in range(len(prompts))], steps


@pytest.mark.parametrize("k", [2, 4])
def test_spec_matches_plain_greedy(small_model_config, k):
    # repetitive prompt gives the ngram proposer real hits
    prompts = [[7, 8, 9, 7, 8, 9, 7, 8], [1, 2, 1, 2, 1, 2]]
    ref, _ = _run(small_model_config, None, prompts)
    spec = SpeculativeConfig(
        method="ngram", num_speculative_tokens=k,
        prompt_lookup_min=1, prompt_lookup_max=3,
    )
    out, _ = _run(small_model_config, spec, prompts)
    assert out == ref


def test_spec_accepts_drafts(small_model_config):
    """A model that actually repeats (dummy weights often loop) should finish
    in fewer engine steps with spec decode when drafts get accepted; at
    minimum the output must stay identical and the engine must not stall."""
    prompts = [[3, 4, 5, 3, 4, 5, 3, 4, 5]]
    ref, ref_steps = _run(small_model_config, None, prompts, max_tokens=24)
    spec = SpeculativeConfig(
        method="ngram", num_speculative_tokens=4,
        prompt_lookup_min=1, prompt_lookup_max=4,
    )
    out, steps = _run(small_model_config, spec, prompts, max_tokens=24)
    assert out == ref
    assert steps <= ref_steps


def test_spec_skips_guided_fsm_requests(small_model_config):
    """guided_regex/guided_json requests must not receive ngram drafts (the
    verify path would apply a stale pre-draft FSM state to every draft row);
    output must still conform to the constraint (ADVICE r1 high)."""
    import re

    from vllm_metax_tpu.guided_fsm import TokenFSM

    spec = SpeculativeConfig(
        method="ngram", num_speculative_tokens=3,
        prompt_lookup_min=1, prompt_lookup_max=3,
    )
    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
        speculative_config=spec,
    )
    vocab_chars = "0123456789abcdefghij-."
    tok_strs = {10 + i: c for i, c in enumerate(vocab_chars)}
    pattern = r"-?[1-9][0-9]{2,5}\.[0-9]{2}"
    fsm = TokenFSM(pattern, tok_strs)

    engine = EngineCore(config)
    # a repetitive prompt that WOULD give the ngram proposer hits
    sp = SamplingParams(max_tokens=16, temperature=0.0)
    sp._guided_fsm = fsm
    engine.add_request("r0", [11, 12, 11, 12, 11, 12], sp, eos_token_id=2)
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    body = toks[:-1] if toks and toks[-1] == 2 else toks
    text = "".join(tok_strs[t] for t in body)
    assert re.fullmatch(pattern, text), (toks, text)


def test_spec_with_sampling_runs(small_model_config):
    """Random sampling + spec: outputs differ from non-spec (different seed
    consumption) but must be valid and complete."""
    spec = SpeculativeConfig(
        method="ngram", num_speculative_tokens=2,
        prompt_lookup_min=1, prompt_lookup_max=3,
    )
    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=2, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
        speculative_config=spec,
    )
    engine = EngineCore(config)
    engine.add_request(
        "r0", [5, 6, 5, 6, 5, 6], SamplingParams(max_tokens=12, temperature=0.8,
                                                 seed=42)
    )
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    assert len(toks) == 12
    vocab = small_model_config.vocab_size
    assert all(0 <= t < vocab for t in toks)