"""Failure containment: a poisoned request or a failing forward errors ONE
request/batch, never the engine; startup errors are clean exceptions.

Reference analogs: tests/v1/shutdown/test_forward_error.py,
test_startup_error.py, test_processor_error.py.
"""

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


def _engine(small_model_config):
    return EngineCore(
        EngineConfig(
            model_config=small_model_config,
            cache_config=CacheConfig(block_size=16, num_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_seqs=4, max_num_batched_tokens=64
            ),
            load_config=LoadConfig(load_format="dummy", seed=0),
            quant_config=QuantizationConfig(),
        )
    )


def _run_one(engine, rid, prompt, max_tokens=4):
    engine.add_request(
        rid, prompt, SamplingParams(max_tokens=max_tokens, temperature=0.0)
    )
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.req_id == rid:
                toks.extend(out.new_token_ids)
    return toks


def test_oov_token_rejected_engine_survives(small_model_config):
    engine = _engine(small_model_config)
    vocab = small_model_config.vocab_size
    with pytest.raises(ValueError, match="out-of-vocabulary"):
        engine.add_request(
            "bad", [1, 2, vocab + 5], SamplingParams(max_tokens=4)
        )
    with pytest.raises(ValueError, match="out-of-vocabulary"):
        engine.add_request("neg", [1, -3], SamplingParams(max_tokens=4))
    with pytest.raises(ValueError, match="empty prompt"):
        engine.add_request("empty", [], SamplingParams(max_tokens=4))
    # the engine keeps serving
    assert len(_run_one(engine, "good", [1, 2, 3])) == 4


def test_oversized_prompt_rejected(small_model_config):
    engine = _engine(small_model_config)
    mml = small_model_config.max_model_len
    with pytest.raises(ValueError, match="max_model_len"):
        engine.add_request(
            "big", [1] * (mml + 1), SamplingParams(max_tokens=4)
        )
    assert len(_run_one(engine, "good", [1, 2, 3])) == 4


def test_forward_error_errors_batch_not_engine(small_model_config):
    """A runner exception aborts the scheduled requests with
    finish_reason="error"; the NEXT request serves normally."""
    engine = _engine(small_model_config)
    orig = engine.runner.execute_model
    blown = []

    def boom(so):
        if not blown:
            blown.append(1)
            raise RuntimeError("injected forward error")
        return orig(so)

    engine.runner.execute_model = boom
    engine.add_request("victim", [1, 2, 3], SamplingParams(max_tokens=4))
    outs = []
    while engine.has_unfinished_requests():
        outs.extend(engine.step())
    errored = [o for o in outs if o.req_id == "victim"]
    assert errored and errored[-1].finished
    assert errored[-1].finish_reason == "error"
    assert "injected forward error" in (errored[-1].stop_reason or "")

    # engine is still alive and correct afterwards
    assert len(_run_one(engine, "next", [4, 5, 6])) == 4
    # KV blocks of the failed request were released
    assert engine.scheduler.kv_manager.usage < 0.5


def test_startup_error_bad_path():
    from vllm_metax_tpu import LLM

    with pytest.raises((ValueError, FileNotFoundError)):
        LLM(model="/nonexistent/model/dir")
