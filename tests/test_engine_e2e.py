"""End-to-end engine tests: LLM.generate greedy parity vs HF transformers
(the reference's e2e surface: tests/e2e/test_offline_inference_basic.py)."""

import numpy as np
import pytest

from vllm_metax_tpu import LLM, SamplingParams
from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ModelConfig,
    SchedulerConfig,
)


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    path = str(tmp_path_factory.mktemp("ckpt") / "llama-tiny")
    model.save_pretrained(path, safe_serialization=True)
    return model, path


def _hf_greedy(hf_model, prompt, n):
    import torch

    with torch.no_grad():
        out = hf_model.generate(
            torch.tensor(prompt)[None], max_new_tokens=n, do_sample=False
        )
    return out[0, len(prompt) :].tolist()


def _make_llm(path, **kw):
    defaults = dict(
        dtype="float32",
        num_kv_blocks=128,
        max_num_seqs=8,
        max_num_batched_tokens=128,
    )
    defaults.update(kw)
    return LLM(model=path, **defaults)


def test_batch_greedy_matches_hf(hf_ckpt):
    hf_model, path = hf_ckpt
    llm = _make_llm(path)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, 256, size=n)) for n in (5, 23, 40, 11)]
    n_out = 12
    outs = llm.generate(
        sampling_params=SamplingParams(max_tokens=n_out, temperature=0.0,
                                       ignore_eos=True),
        prompt_token_ids=prompts,
    )
    for prompt, out in zip(prompts, outs):
        ref = _hf_greedy(hf_model, prompt, n_out)
        assert out.outputs[0].token_ids == ref
        assert out.outputs[0].finish_reason == "length"


def test_chunked_prefill_e2e(hf_ckpt):
    hf_model, path = hf_ckpt
    # tiny step budget forces multi-step prefill
    llm = _make_llm(path, max_num_batched_tokens=32)
    rng = np.random.default_rng(1)
    prompt = list(rng.integers(0, 256, size=100))
    outs = llm.generate(
        sampling_params=SamplingParams(max_tokens=8, temperature=0.0,
                                       ignore_eos=True),
        prompt_token_ids=[prompt],
    )
    assert outs[0].outputs[0].token_ids == _hf_greedy(hf_model, prompt, 8)


def test_prefix_caching_consistency(hf_ckpt):
    hf_model, path = hf_ckpt
    llm = _make_llm(path)
    rng = np.random.default_rng(2)
    prompt = list(rng.integers(0, 256, size=50))
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    first = llm.generate(sampling_params=sp, prompt_token_ids=[prompt])
    # second run hits the prefix cache; outputs must be identical
    second = llm.generate(sampling_params=sp, prompt_token_ids=[prompt])
    assert first[0].outputs[0].token_ids == second[0].outputs[0].token_ids
    assert llm.engine.scheduler.num_prefix_cached_tokens > 0


def test_stop_token(hf_ckpt):
    hf_model, path = hf_ckpt
    llm = _make_llm(path)
    prompt = list(range(10))
    ref = _hf_greedy(hf_model, prompt, 12)
    stop_tok = ref[4]
    outs = llm.generate(
        sampling_params=SamplingParams(
            max_tokens=12, temperature=0.0, stop_token_ids=[stop_tok]
        ),
        prompt_token_ids=[prompt],
    )
    got = outs[0].outputs[0].token_ids
    assert got == ref[:5]  # includes the stop token, then stops
    assert outs[0].outputs[0].finish_reason == "stop"


def test_seeded_sampling_deterministic(hf_ckpt):
    _, path = hf_ckpt
    llm = _make_llm(path)
    prompt = list(range(8))
    sp = SamplingParams(max_tokens=10, temperature=0.9, top_p=0.9, seed=1234,
                        ignore_eos=True)
    a = llm.generate(sampling_params=sp, prompt_token_ids=[prompt])
    b = llm.generate(sampling_params=sp, prompt_token_ids=[prompt])
    assert a[0].outputs[0].token_ids == b[0].outputs[0].token_ids
    sp2 = SamplingParams(max_tokens=10, temperature=0.9, top_p=0.9, seed=99,
                         ignore_eos=True)
    c = llm.generate(sampling_params=sp2, prompt_token_ids=[prompt])
    assert c[0].outputs[0].token_ids != a[0].outputs[0].token_ids


def test_logprobs_returned(hf_ckpt):
    _, path = hf_ckpt
    llm = _make_llm(path)
    outs = llm.generate(
        sampling_params=SamplingParams(max_tokens=4, temperature=0.0,
                                       logprobs=5, ignore_eos=True),
        prompt_token_ids=[list(range(12))],
    )
    lps = outs[0].outputs[0].logprobs
    assert lps is not None and len(lps) == 4
    for tok, d in zip(outs[0].outputs[0].token_ids, lps):
        assert tok in d
        assert max(d.values()) <= 0.0
        # greedy: chosen token has the max logprob
        assert d[tok] == max(d.values())


def test_penalties_change_output(hf_ckpt):
    _, path = hf_ckpt
    llm = _make_llm(path)
    prompt = list(range(12))
    sp_plain = SamplingParams(max_tokens=16, temperature=0.0, ignore_eos=True)
    sp_pen = SamplingParams(
        max_tokens=16, temperature=0.0, repetition_penalty=2.0, ignore_eos=True
    )
    a = llm.generate(sampling_params=sp_plain, prompt_token_ids=[prompt])
    b = llm.generate(sampling_params=sp_pen, prompt_token_ids=[prompt])
    ta = a[0].outputs[0].token_ids
    tb = b[0].outputs[0].token_ids
    assert ta != tb
    # repetition penalty must not repeat-pick the same token forever
    assert len(set(tb)) >= len(set(ta))


def test_many_requests_preemption(hf_ckpt):
    """More requests than KV blocks can hold at once → preemption must still
    produce the same greedy outputs."""
    hf_model, path = hf_ckpt
    llm = _make_llm(path, num_kv_blocks=24, max_num_seqs=8)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(0, 256, size=30)) for _ in range(6)]
    sp = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    outs = llm.generate(sampling_params=sp, prompt_token_ids=prompts)
    for prompt, out in zip(prompts, outs):
        assert out.outputs[0].token_ids == _hf_greedy(hf_model, prompt, 10)


def test_sleep_wake_roundtrip(small_model_config):
    """Sleep (offload weights, drop KV) then wake: outputs identical
    (ref behavior: patched Worker.sleep/wake_up, device_allocator.py:15)."""
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

    def run(prompt):
        engine.add_request("r", prompt, SamplingParams(max_tokens=6, temperature=0.0))
        toks = []
        while engine.has_unfinished_requests():
            for out in engine.step():
                toks.extend(out.new_token_ids)
        return toks

    before = run([1, 2, 3, 4])
    engine.sleep(level=1)
    assert engine.is_sleeping
    engine.wake_up()
    after = run([1, 2, 3, 4])
    assert after == before


def test_sharded_state_save_load(small_model_config, tmp_path):
    """Sharded-state fast restart (ref: save_sharded_state.py example):
    reload skips checkpoint parsing and reproduces outputs exactly."""
    import dataclasses
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    def make(load_format, model=""):
        mc = dataclasses.replace(small_model_config, model=model)
        return EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=16, num_blocks=64),
            scheduler_config=SchedulerConfig(max_num_seqs=4,
                                             max_num_batched_tokens=64),
            load_config=LoadConfig(load_format=load_format, seed=0),
        )

    def run(engine, prompt):
        engine.add_request("r", prompt, SamplingParams(max_tokens=6, temperature=0.0))
        toks = []
        while engine.has_unfinished_requests():
            for out in engine.step():
                toks.extend(out.new_token_ids)
        return toks

    e1 = EngineCore(make("dummy"))
    ref = run(e1, [5, 6, 7])
    path = str(tmp_path / "state")
    e1.save_sharded_state(path)

    e2 = EngineCore(make("sharded_state", model=path))
    assert run(e2, [5, 6, 7]) == ref


def test_batch_invariance(small_model_config):
    """A request's greedy output must not change when co-batched with other
    requests (reference analog: batch-invariant hooks, flash_attn.py:40, and
    reproducibility examples)."""
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    def make_engine():
        return EngineCore(EngineConfig(
            model_config=small_model_config,
            cache_config=CacheConfig(block_size=16, num_blocks=64),
            scheduler_config=SchedulerConfig(max_num_seqs=4,
                                             max_num_batched_tokens=64),
            load_config=LoadConfig(load_format="dummy", seed=0),
        ))

    def run(engine, prompts):
        for i, p in enumerate(prompts):
            engine.add_request(f"r{i}", p,
                               SamplingParams(max_tokens=6, temperature=0.0))
        acc = {f"r{i}": [] for i in range(len(prompts))}
        while engine.has_unfinished_requests():
            for out in engine.step():
                acc[out.req_id].extend(out.new_token_ids)
        return acc

    target = [7, 3, 9, 1]
    solo = run(make_engine(), [target])["r0"]
    batched = run(make_engine(), [target, [5, 5], [2, 4, 6, 8, 10]])["r0"]
    assert solo == batched


def test_forward_error_surfaces(small_model_config):
    """Engine errors propagate to the caller instead of hanging (reference:
    tests/v1/shutdown/test_forward_error.py)."""
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    engine = EngineCore(EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4,
                                         max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    ))
    # over-long prompt rejected at intake
    import pytest as _pytest
    with _pytest.raises(ValueError):
        engine.add_request("bad", list(range(5000)), SamplingParams(max_tokens=2))
    # engine still serves afterwards
    engine.add_request("ok", [1, 2, 3], SamplingParams(max_tokens=2,
                                                       temperature=0.0))
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    assert len(toks) == 2


def test_chunked_prefill_long_prompt_matches_hf(tmp_path):
    """A prompt longer than max_num_batched_tokens is prefetched in chunks;
    greedy output must still match transformers exactly."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).eval()
    path = str(tmp_path / "m")
    m.save_pretrained(path, safe_serialization=True)

    import numpy as np
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 256, size=150).tolist()  # >> 32-token budget
    with torch.no_grad():
        hf = m.generate(torch.tensor([prompt]), max_new_tokens=6,
                        do_sample=False)[0, len(prompt):].tolist()

    from vllm_metax_tpu.entrypoints.llm import LLM
    from vllm_metax_tpu.sample.params import SamplingParams

    llm = LLM(model=path, dtype="float32", max_model_len=256,
              max_num_batched_tokens=32, max_num_seqs=2)
    out = llm.generate(prompt_token_ids=[prompt],
                       sampling_params=SamplingParams(max_tokens=6,
                                                      temperature=0.0))
    assert out[0].outputs[0].token_ids == hf


def test_prefix_cache_reuse(small_model_config):
    """A second request sharing a long prefix reuses cached blocks (fewer
    scheduled tokens) and produces identical output (reference behavior:
    tests/v1/core/test_prefix_caching.py)."""
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    engine = EngineCore(EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64,
                                 enable_prefix_caching=True),
        scheduler_config=SchedulerConfig(max_num_seqs=4,
                                         max_num_batched_tokens=256),
        load_config=LoadConfig(load_format="dummy", seed=0),
    ))
    prefix = list(range(1, 65))  # 64 tokens = 4 full blocks

    def run(rid, tail):
        engine.add_request(rid, prefix + tail,
                           SamplingParams(max_tokens=4, temperature=0.0))
        toks = []
        while engine.has_unfinished_requests():
            for out in engine.step():
                toks.extend(out.new_token_ids)
        return toks

    first = run("a", [100, 101])
    cached_before = engine.scheduler.num_prefix_cached_tokens
    second = run("b", [100, 101])
    cached_after = engine.scheduler.num_prefix_cached_tokens
    assert second == first
    assert cached_after - cached_before >= 48  # ≥3 blocks reused


def test_config_invariance_fuzz(small_model_config):
    """Property fuzz: greedy tokens are a function of (weights, prompts)
    only — never of the serving configuration. The same randomized request
    set must produce identical streams across block sizes, decode-window
    widths, chunked-prefill budgets, prefix caching on/off, async on/off,
    and pool sizes small enough to force preemption-by-recompute."""
    import numpy as np

    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    rng = np.random.default_rng(123)
    prompts = [
        rng.integers(1, 512, size=int(n)).tolist()
        for n in rng.integers(3, 90, size=5)
    ]
    # one shared prefix pair to exercise the prefix cache / host paths
    prompts.append(prompts[0][:40] + rng.integers(1, 512, size=9).tolist())

    def run(cache_kw, sched_kw):
        eng = EngineCore(EngineConfig(
            model_config=small_model_config,
            cache_config=CacheConfig(block_size=16, **cache_kw),
            scheduler_config=SchedulerConfig(**sched_kw),
            load_config=LoadConfig(load_format="dummy", seed=0),
        ))
        for i, p in enumerate(prompts):
            eng.add_request(
                f"r{i}", p, SamplingParams(max_tokens=7, temperature=0.0)
            )
        acc = {f"r{i}": [] for i in range(len(prompts))}
        steps = 0
        while eng.has_unfinished_requests():
            for out in eng.step():
                acc[out.req_id].extend(out.new_token_ids)
            steps += 1
            assert steps < 2000, "livelock"
        return acc

    base = run(
        {"num_blocks": 64},
        {"max_num_seqs": 8, "max_num_batched_tokens": 128},
    )
    variants = [
        # wide batch budget, multi-step windows
        ({"num_blocks": 64},
         {"max_num_seqs": 8, "max_num_batched_tokens": 256,
          "num_decode_steps": 4}),
        # tiny chunked-prefill budget
        ({"num_blocks": 64},
         {"max_num_seqs": 4, "max_num_batched_tokens": 32}),
        # prefix caching off
        ({"num_blocks": 64, "enable_prefix_caching": False},
         {"max_num_seqs": 8, "max_num_batched_tokens": 128}),
        # tight pool: forces preemption-by-recompute
        ({"num_blocks": 24},
         {"max_num_seqs": 8, "max_num_batched_tokens": 128}),
        # sync scheduling
        ({"num_blocks": 64},
         {"max_num_seqs": 8, "max_num_batched_tokens": 128,
          "async_scheduling": False, "num_decode_steps": 8}),
    ]
    for ci, (ck, sk) in enumerate(variants):
        got = run(ck, sk)
        assert got == base, (ci, got, base)
