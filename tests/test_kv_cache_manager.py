"""KV cache manager unit tests (behavioral model: the reference's vendored
tests/v1/core/test_kv_cache_utils.py and test_prefix_caching.py)."""

from vllm_metax_tpu.core.kv_cache_manager import KVCacheManager
from vllm_metax_tpu.core.request import Request
from vllm_metax_tpu.sample.params import SamplingParams


def _req(rid, tokens):
    return Request(rid, list(tokens), SamplingParams(max_tokens=10))


def test_basic_alloc_free():
    m = KVCacheManager(num_blocks=10, block_size=16)
    r = _req("a", range(40))
    blocks = m.allocate_slots(r, 40)
    assert blocks is not None and len(blocks.blocks) == 3
    assert m.get_num_free_blocks() == 7
    m.free(r)
    assert m.get_num_free_blocks() == 10


def test_alloc_fails_when_full():
    m = KVCacheManager(num_blocks=2, block_size=16)
    r1, r2 = _req("a", range(32)), _req("b", range(32))
    assert m.allocate_slots(r1, 32) is not None
    assert m.allocate_slots(r2, 32) is None


def test_prefix_cache_hit_after_free():
    m = KVCacheManager(num_blocks=10, block_size=16)
    tokens = list(range(40))
    r1 = _req("a", tokens)
    m.allocate_slots(r1, 40)
    r1.num_computed_tokens = 40
    m.cache_full_blocks(r1, 40)
    m.free(r1)

    r2 = _req("b", tokens)
    cached, n = m.get_computed_blocks(r2)
    # 40 tokens → blocks 0,1 full (32 tokens); block 2 partial not cacheable
    assert n == 32
    assert len(cached.blocks) == 2


def test_prefix_cache_shared_while_running():
    m = KVCacheManager(num_blocks=10, block_size=16)
    tokens = list(range(33))
    r1 = _req("a", tokens)
    m.allocate_slots(r1, 33)
    r1.num_computed_tokens = 33
    m.cache_full_blocks(r1, 33)

    r2 = _req("b", tokens + [99])
    cached, n = m.get_computed_blocks(r2)
    assert n == 32
    r2.num_computed_tokens = n  # scheduler sets this before allocating
    got = m.allocate_slots(r2, 2, cached)
    assert got is not None
    # shared prefix blocks are refcounted, not copied
    assert m.get_block_ids("b")[:2] == m.get_block_ids("a")[:2]
    m.free(r1)
    # blocks still held by r2
    assert m.get_num_free_blocks() == 10 - 3


def test_full_prompt_never_fully_cached():
    m = KVCacheManager(num_blocks=10, block_size=16)
    tokens = list(range(32))  # exactly 2 blocks
    r1 = _req("a", tokens)
    m.allocate_slots(r1, 32)
    r1.num_computed_tokens = 32
    m.cache_full_blocks(r1, 32)
    m.free(r1)
    r2 = _req("b", tokens)
    cached, n = m.get_computed_blocks(r2)
    # must leave at least the last token to compute logits
    assert n == 16 and len(cached.blocks) == 1


def test_lru_eviction_drops_cache():
    m = KVCacheManager(num_blocks=4, block_size=16)
    r1 = _req("a", list(range(32)))
    m.allocate_slots(r1, 32)
    r1.num_computed_tokens = 32
    m.cache_full_blocks(r1, 32)
    m.free(r1)
    # burn through the pool so r1's blocks get evicted
    r2 = _req("b", list(range(100, 164)))
    m.allocate_slots(r2, 64)
    r3 = _req("c", list(range(32)))
    cached, n = m.get_computed_blocks(r3)
    assert n == 0


def test_reset_prefix_cache():
    m = KVCacheManager(num_blocks=4, block_size=16)
    r1 = _req("a", list(range(32)))
    m.allocate_slots(r1, 32)
    r1.num_computed_tokens = 32
    m.cache_full_blocks(r1, 32)
    assert not m.reset_prefix_cache()  # blocks still referenced
    m.free(r1)
    assert m.reset_prefix_cache()
    r2 = _req("b", list(range(32)))
    _, n = m.get_computed_blocks(r2)
    assert n == 0
