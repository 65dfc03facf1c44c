"""Prefill/decode disaggregation: KV handoff between two engines.

Reference analog: tests/v1/kv_connector/nixl_integration/toy_proxy_server.py
— a prefill engine computes the prompt KV, a decode engine imports it and
continues; output must match a monolithic engine token-for-token.
"""

import pickle

import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.distributed.kv_transfer import (
    export_prompt_kv,
    import_prompt_kv,
    prompt_block_hashes,
)
from vllm_metax_tpu.sample.params import SamplingParams

PROMPT = [(13 * i + 7) % 200 + 1 for i in range(45)]  # 2 full blocks + tail


def _engine(seed=0, block_size=16):
    mc = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        dtype="float32",
    )
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=block_size, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    return EngineCore(cfg)


def _generate(engine, prompt, max_tokens):
    engine.add_request(
        f"g{max_tokens}-{len(prompt)}", list(prompt),
        SamplingParams(max_tokens=max_tokens, temperature=0.0),
    )
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    return toks


def test_pd_handoff_matches_monolithic():
    # monolithic reference
    mono = _generate(_engine(), PROMPT, 12)

    # prefill engine: compute the prompt once (first token comes from it)
    pre = _engine()
    first = _generate(pre, PROMPT, 1)
    handoff = export_prompt_kv(pre, PROMPT)
    assert handoff is not None and handoff.num_blocks == 2

    # ship through a real serialization boundary (any transport works)
    handoff = pickle.loads(pickle.dumps(handoff))

    # decode engine: import + continue; only the tail partial block and the
    # last token are recomputed
    dec = _engine()
    imported = import_prompt_kv(dec, handoff)
    assert imported == 2
    cached, n_cached = dec.scheduler.kv_manager.get_computed_blocks(
        _Req(PROMPT)
    )
    assert n_cached == 2 * 16  # both imported blocks visible as prefix hits
    rest = _generate(dec, PROMPT, 12)
    assert first + rest[1:] == mono
    assert rest == mono  # decode engine reproduces the whole greedy stream


class _Req:
    def __init__(self, prompt):
        self.prompt_token_ids = list(prompt)


def test_pd_export_requires_prefilled_blocks():
    pre = _engine()
    assert export_prompt_kv(pre, PROMPT) is None  # nothing computed yet


def test_pd_import_rejects_block_size_mismatch():
    pre = _engine(block_size=16)
    _generate(pre, PROMPT, 1)
    handoff = export_prompt_kv(pre, PROMPT)
    dec = _engine(block_size=32)
    with pytest.raises(ValueError, match="block_size"):
        import_prompt_kv(dec, handoff)


def test_pd_import_idempotent():
    pre = _engine()
    _generate(pre, PROMPT, 1)
    handoff = export_prompt_kv(pre, PROMPT)
    dec = _engine()
    assert import_prompt_kv(dec, handoff) == 2
    assert import_prompt_kv(dec, handoff) == 0  # already cached


def test_prompt_block_hashes_excludes_tail():
    bs = 16
    assert len(prompt_block_hashes(list(range(bs * 2 + 5)), bs)) == 2
    # aligned prompt: the final token must still be recomputed for logits
    assert len(prompt_block_hashes(list(range(bs * 2)), bs)) == 1
