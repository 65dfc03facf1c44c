"""Headless scheduler tests (pattern of the reference's vendored
tests/v1/core/test_scheduler.py — real Scheduler, fake model outputs)."""

from vllm_metax_tpu.config import CacheConfig, SchedulerConfig
from vllm_metax_tpu.core.request import Request, RequestStatus
from vllm_metax_tpu.core.scheduler import Scheduler
from vllm_metax_tpu.sample.params import SamplingParams


def make_scheduler(
    max_num_seqs=8,
    max_tokens_per_step=64,
    num_blocks=64,
    block_size=16,
    chunked=True,
    max_model_len=512,
):
    return Scheduler(
        SchedulerConfig(
            max_num_seqs=max_num_seqs,
            max_num_batched_tokens=max_tokens_per_step,
            enable_chunked_prefill=chunked,
        ),
        CacheConfig(block_size=block_size, num_blocks=num_blocks),
        max_model_len,
    )


def _req(rid, prompt_len, max_tokens=8):
    return Request(
        rid, list(range(prompt_len)), SamplingParams(max_tokens=max_tokens)
    )


def fake_step(sched, out, sample=lambda rid: 7):
    """Pretend the model ran: sample `sample(rid)` for every finished-context req."""
    sampled = {}
    for rid, n in out.num_scheduled_tokens.items():
        req = sched.requests[rid]
        if req.num_computed_tokens + n >= req.num_tokens:
            sampled[rid] = [sample(rid)]
    return sched.update_from_output(out, sampled)


def test_prefill_then_decode():
    s = make_scheduler()
    s.add_request(_req("a", 20, max_tokens=3))
    out = s.schedule()
    assert out.num_scheduled_tokens == {"a": 20}
    fake_step(s, out)
    # decode steps: 1 token each
    for _ in range(2):
        out = s.schedule()
        assert out.num_scheduled_tokens == {"a": 1}
        fake_step(s, out)
    out = s.schedule()
    fake_step(s, out)
    assert not s.has_unfinished_requests()
    assert s.requests["a"].status == RequestStatus.FINISHED_LENGTH_CAPPED


def test_chunked_prefill_splits_long_prompt():
    s = make_scheduler(max_tokens_per_step=64)
    s.add_request(_req("a", 150))
    out = s.schedule()
    assert out.num_scheduled_tokens == {"a": 64}
    assert fake_step(s, out) == []  # partial prefill emits nothing
    out = s.schedule()
    assert out.num_scheduled_tokens == {"a": 64}
    fake_step(s, out)
    out = s.schedule()
    assert out.num_scheduled_tokens == {"a": 22}
    outs = fake_step(s, out)
    assert outs and outs[0].new_token_ids == [7]


def test_token_budget_shared_across_requests():
    s = make_scheduler(max_tokens_per_step=64)
    s.add_request(_req("a", 50))
    s.add_request(_req("b", 50))
    out = s.schedule()
    assert out.num_scheduled_tokens["a"] == 50
    assert out.num_scheduled_tokens["b"] == 14  # chunked into remaining budget
    fake_step(s, out)
    out = s.schedule()
    # a decodes 1; b finishes prefill
    assert out.num_scheduled_tokens["a"] == 1
    assert out.num_scheduled_tokens["b"] == 36


def test_max_num_seqs_limit():
    s = make_scheduler(max_num_seqs=2, max_tokens_per_step=64)
    for rid in "abc":
        s.add_request(_req(rid, 10))
    out = s.schedule()
    assert set(out.num_scheduled_tokens) == {"a", "b"}


def test_no_chunked_prefill_waits():
    s = make_scheduler(max_tokens_per_step=64, chunked=False)
    s.add_request(_req("a", 100))
    out = s.schedule()
    assert out.num_scheduled_tokens == {}


def test_preemption_and_resume():
    # 8 blocks of 16 = 128 slots total; two requests of 60+ tokens each
    s = make_scheduler(num_blocks=8, max_tokens_per_step=128, max_model_len=128)
    s.add_request(_req("a", 60, max_tokens=20))
    s.add_request(_req("b", 60, max_tokens=20))
    out = s.schedule()
    assert set(out.num_scheduled_tokens) == {"a", "b"}
    fake_step(s, out)
    # decode until the pool runs dry → the later request gets preempted
    preempted = False
    for _ in range(10):
        out = s.schedule()
        if out.preempted_req_ids:
            preempted = True
            assert "b" in out.preempted_req_ids
            break
        fake_step(s, out)
    assert preempted
    assert s.requests["b"].status == RequestStatus.PREEMPTED
    assert s.requests["b"].num_computed_tokens == 0
    # finish a → b resumes with its output tokens re-fed
    s.requests["a"].sampling_params.max_tokens = s.requests["a"].num_output_tokens
    out = s.schedule()
    fake_step(s, out)
    out = s.schedule()
    fake_step(s, out)
    resumed = [
        c for c in out.scheduled_cached_reqs if c.resumed_from_preemption
    ] or [
        c
        for o in [s.schedule()]
        for c in o.scheduled_cached_reqs
        if c.resumed_from_preemption
    ]
    assert resumed and resumed[0].req_id == "b"
    assert len(resumed[0].new_token_ids) == resumed[0].new_token_ids.__len__()
    assert s.requests["b"].status == RequestStatus.RUNNING


def test_prefix_cache_reduces_prefill():
    s = make_scheduler(max_tokens_per_step=256)
    s.add_request(_req("a", 64, max_tokens=1))
    out = s.schedule()
    fake_step(s, out)
    out = s.schedule()  # emits the finish
    fake_step(s, out)
    assert not s.has_unfinished_requests()
    # same prompt again: first 3 full blocks (48 tokens) come from cache
    s.add_request(_req("b", 64, max_tokens=1))
    out = s.schedule()
    assert out.num_scheduled_tokens["b"] == 64 - 48


def test_abort():
    s = make_scheduler()
    s.add_request(_req("a", 20))
    out = s.schedule()
    fake_step(s, out)
    s.abort_request("a")
    assert not s.has_unfinished_requests()
    assert s.kv_manager.get_num_free_blocks() == 64


def test_preemption_recompute_roundtrip(small_model_config):
    """KV exhaustion preempts the newest request and resumes it later with
    identical output (reference behavior: preemption-by-recompute,
    tests/v1/core/test_scheduler.py)."""
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    def run(num_blocks):
        engine = EngineCore(EngineConfig(
            model_config=small_model_config,
            cache_config=CacheConfig(block_size=16, num_blocks=num_blocks,
                                     enable_prefix_caching=False),
            scheduler_config=SchedulerConfig(max_num_seqs=4,
                                             max_num_batched_tokens=128),
            load_config=LoadConfig(load_format="dummy", seed=0),
        ))
        prompts = [list(range(1, 30)), list(range(40, 70)), list(range(80, 110))]
        for i, p in enumerate(prompts):
            engine.add_request(f"r{i}", p,
                               SamplingParams(max_tokens=40, temperature=0.0))
        acc = {f"r{i}": [] for i in range(3)}
        steps = 0
        while engine.has_unfinished_requests():
            for out in engine.step():
                acc[out.req_id].extend(out.new_token_ids)
            steps += 1
            assert steps < 500
        return [acc[f"r{i}"] for i in range(3)], engine.scheduler.num_preemptions

    plenty, p0 = run(num_blocks=64)
    tight, p1 = run(num_blocks=12)   # 192 slots < ~210 demanded → pressure
    assert p0 == 0
    assert p1 > 0, "expected preemptions under KV pressure"
    assert tight == plenty, "preempt+recompute changed outputs"
