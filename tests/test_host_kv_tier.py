"""Host-RAM KV offload tier (core/host_kv_tier.py).

Reference surface: swap_blocks (csrc/cache_kernels.cu:18) + the LMCache
offloading flow (tests/kv_transfer/test_lmcache_offloading.py): evicted
prefix-cache pages spill to host memory and restore on a later hash-chain
hit, so a revisited prompt prefills from one host→device transfer instead
of recompute.

Pinned: spill happens on eviction; restore registers the pages as cached
(the scheduler schedules only the tail); outputs stay token-exact vs a
fresh engine; the tier LRU bounds host memory.
"""

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    SchedulerConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.sample.params import SamplingParams


def _engine(small_model_config, num_blocks=12, host_swap_blocks=64):
    return EngineCore(
        EngineConfig(
            model_config=small_model_config,
            cache_config=CacheConfig(
                block_size=16,
                num_blocks=num_blocks,
                host_swap_blocks=host_swap_blocks,
            ),
            scheduler_config=SchedulerConfig(
                max_num_seqs=2, max_num_batched_tokens=128
            ),
            load_config=LoadConfig(load_format="dummy", seed=0),
        )
    )


def _run_one(engine, rid, prompt, max_tokens=4):
    engine.add_request(rid, prompt, SamplingParams(max_tokens=max_tokens,
                                                   temperature=0.0))
    toks, sched_tokens = [], 0
    while engine.has_unfinished_requests():
        before = engine.stats.num_prompt_tokens_total if hasattr(
            engine.stats, "num_prompt_tokens_total") else 0
        for o in engine.step():
            toks.extend(o.new_token_ids)
    return toks


PROMPT_A = [(3 * i + 7) % 100 + 1 for i in range(70)]  # 4 full blocks
PROMPT_B = [(5 * i + 2) % 100 + 1 for i in range(70)]
PROMPT_C = [(7 * i + 9) % 100 + 1 for i in range(70)]


def test_spill_restore_roundtrip(small_model_config):
    eng = _engine(small_model_config)
    out_a1 = _run_one(eng, "a1", PROMPT_A)

    # churn the small pool so A's cached blocks get evicted (and spilled)
    _run_one(eng, "b", PROMPT_B)
    _run_one(eng, "c", PROMPT_C)
    assert eng.host_tier.spilled > 0, "eviction churn must spill pages"

    # revisit: the hash chain must restore from the host tier and the
    # scheduler must see the restored span as computed
    cached_before = eng.scheduler.num_prefix_cached_tokens
    out_a2 = _run_one(eng, "a2", PROMPT_A)
    assert eng.host_tier.restored > 0, "revisit must restore from host"
    restored_span = eng.scheduler.num_prefix_cached_tokens - cached_before
    # 70-token prompt -> 4 full blocks of 16 = 64 tokens restorable
    assert restored_span >= 48, restored_span
    assert out_a2 == out_a1, "restored prefix must be token-exact"

    # and fully equal to a fresh engine with no tier at all
    fresh = _engine(small_model_config, host_swap_blocks=0)
    assert _run_one(fresh, "a", PROMPT_A) == out_a1


def test_tier_lru_bound(small_model_config):
    eng = _engine(small_model_config, host_swap_blocks=3)
    _run_one(eng, "a", PROMPT_A)
    _run_one(eng, "b", PROMPT_B)
    _run_one(eng, "c", PROMPT_C)
    _run_one(eng, "a2", PROMPT_A)
    assert len(eng.host_tier.store) <= 3


def test_tier_off_by_default(small_model_config):
    eng = _engine(small_model_config, host_swap_blocks=0)
    assert eng.host_tier is None
    _run_one(eng, "a", PROMPT_A)
    km = eng.scheduler.kv_manager
    assert all(not p.evicted_log for p in km.pools)
