"""prompt_logprobs end-to-end (SamplingParams.prompt_logprobs → engine →
RequestOutput.prompt_logprobs → OpenAI completions echo+logprobs).

Reference surface: vLLM's output processor delivers per-prompt-position
logprob dicts with position 0 = None
(tests/v1/engine/test_output_processor.py:119-133).
"""

import numpy as np
import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    QuantizationConfig,
    SchedulerConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.sample.params import SamplingParams


def _make_engine(small_model_config, max_batched=64):
    cfg = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=max_batched
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=QuantizationConfig(),
    )
    return EngineCore(cfg)


def _collect_plp(engine, prompt, k=3, max_tokens=2):
    engine.add_request(
        "r0",
        list(prompt),
        SamplingParams(
            max_tokens=max_tokens, temperature=0.0, prompt_logprobs=k
        ),
    )
    plp = None
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
            if out.prompt_logprobs is not None:
                plp = out.prompt_logprobs
    return plp, toks


def test_prompt_logprobs_shape_and_reference(small_model_config):
    prompt = [1, 5, 9, 2, 7, 3]
    engine = _make_engine(small_model_config)
    plp, _ = _collect_plp(engine, prompt)
    assert plp is not None
    assert len(plp) == len(prompt)
    assert plp[0] is None
    for pos in range(1, len(prompt)):
        d = plp[pos]
        assert prompt[pos] in d
        # top-k entries + possibly the target
        assert len(d) >= 3
        for lp in d.values():
            assert lp <= 0.0 or np.isclose(lp, 0.0, atol=1e-5)

    # reference: full-prompt forward → log_softmax, same positions
    runner = engine.runner
    import jax
    import jax.numpy as jnp

    from tests.utils import make_single_seq_metadata

    model, params, cfg = runner.model, runner.params, runner.model_cfg
    from vllm_metax_tpu.ops.kv_cache import new_kv_cache

    kv = new_kv_cache(
        cfg.num_hidden_layers * 8, 16, cfg.num_kv_heads, cfg.head_dim,
        jnp.float32,
    )
    md = make_single_seq_metadata(0, len(prompt), 16, 8)
    hidden, _ = model.forward(
        params, jnp.asarray(prompt, jnp.int32), kv, md, cfg
    )
    logits = model.compute_logits(params, hidden, cfg)
    ref_lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ref_lp = np.asarray(ref_lp)
    for pos in range(1, len(prompt)):
        got = plp[pos][prompt[pos]]
        want = ref_lp[pos - 1, prompt[pos]]
        assert np.isclose(got, want, rtol=1e-3, atol=1e-4), (pos, got, want)


def test_prompt_logprobs_chunked_prefill_invariant(small_model_config):
    prompt = list(np.random.default_rng(0).integers(1, 200, size=24))
    prompt = [int(x) for x in prompt]
    full = _make_engine(small_model_config, max_batched=64)
    plp_full, toks_full = _collect_plp(full, prompt)
    chunked = _make_engine(small_model_config, max_batched=16)
    plp_chunk, toks_chunk = _collect_plp(chunked, prompt)
    assert toks_full == toks_chunk
    assert plp_full is not None and plp_chunk is not None
    assert len(plp_full) == len(plp_chunk) == len(prompt)
    for a, b in zip(plp_full[1:], plp_chunk[1:]):
        assert set(a) == set(b)
        for t in a:
            assert np.isclose(a[t], b[t], rtol=1e-3, atol=1e-4)


def test_prompt_logprobs_mixed_batch(small_model_config):
    """One request with prompt_logprobs, one without, same step."""
    engine = _make_engine(small_model_config)
    engine.add_request(
        "a",
        [1, 2, 3, 4],
        SamplingParams(max_tokens=2, temperature=0.0, prompt_logprobs=2),
    )
    engine.add_request(
        "b", [5, 6, 7], SamplingParams(max_tokens=2, temperature=0.0)
    )
    got = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.prompt_logprobs is not None:
                got[out.req_id] = out.prompt_logprobs
    assert "a" in got and len(got["a"]) == 4
    assert "b" not in got


def test_prompt_logprobs_with_prefix_cache(small_model_config):
    """A prefix-cache hit must not leave holes in prompt_logprobs: such
    requests bypass cache reuse (vLLM's trade)."""
    from vllm_metax_tpu.config import CacheConfig

    cfg = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(
            block_size=16, num_blocks=64, enable_prefix_caching=True
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=QuantizationConfig(),
    )
    engine = EngineCore(cfg)
    prompt = [int(x) for x in np.random.default_rng(4).integers(1, 200, 40)]
    # prime the cache with the same prompt
    engine.add_request("prime", list(prompt), SamplingParams(max_tokens=1))
    while engine.has_unfinished_requests():
        engine.step()
    plp, _ = _collect_plp(engine, prompt, k=2)
    assert plp is not None
    assert len(plp) == len(prompt)  # no holes from cached blocks
    assert plp[0] is None and all(d is not None for d in plp[1:])
