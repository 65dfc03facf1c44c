"""Perplexity harness vs transformers (the reference's PPL_TOL=0.01 gate,
tests/models/language/generation_ppl_test/ppl_utils.py:15-20)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

PPL_TOL = 0.01  # relative — the reference's gate


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    tmp = tmp_path_factory.mktemp("ppl")
    cfg = LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).eval()
    path = str(tmp / "tiny")
    m.save_pretrained(path, safe_serialization=True)
    return m, path


def _hf_ppl(m, token_ids):
    with torch.no_grad():
        ids = torch.tensor([token_ids])
        out = m(ids, labels=ids)
    return float(torch.exp(out.loss))


def test_ppl_matches_transformers(ckpt):
    m, path = ckpt
    rng = np.random.default_rng(0)
    token_ids = rng.integers(0, 256, size=120).tolist()

    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.runner import ModelRunner
    from vllm_metax_tpu.evaluation import compute_ppl

    config = EngineConfig(
        model_config=ModelConfig.from_pretrained(path, dtype="float32",
                                                 max_model_len=256),
        cache_config=CacheConfig(block_size=16, num_blocks=32),
        scheduler_config=SchedulerConfig(max_num_seqs=2,
                                         max_num_batched_tokens=256),
        load_config=LoadConfig(),
    )
    runner = ModelRunner(config)
    ours = compute_ppl(runner, token_ids)
    ref = _hf_ppl(m, token_ids)
    assert abs(ours - ref) / ref < PPL_TOL, (ours, ref)


def test_ppl_windowing(ckpt):
    """Windows smaller than the sequence still produce the full-context PPL
    (KV persists across windows)."""
    m, path = ckpt
    rng = np.random.default_rng(1)
    token_ids = rng.integers(0, 256, size=100).tolist()

    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.runner import ModelRunner
    from vllm_metax_tpu.evaluation import compute_ppl

    config = EngineConfig(
        model_config=ModelConfig.from_pretrained(path, dtype="float32",
                                                 max_model_len=256),
        cache_config=CacheConfig(block_size=16, num_blocks=32),
        scheduler_config=SchedulerConfig(max_num_seqs=2,
                                         max_num_batched_tokens=32),  # window 32
        load_config=LoadConfig(),
    )
    runner = ModelRunner(config)
    ours = compute_ppl(runner, token_ids)
    ref = _hf_ppl(m, token_ids)
    assert abs(ours - ref) / ref < PPL_TOL, (ours, ref)


def test_llm_embed(ckpt):
    """Pooled embeddings surface (the reference's pooling-model analog)."""
    import numpy as np
    from vllm_metax_tpu.entrypoints.llm import LLM

    _, path = ckpt
    llm = LLM(model=path, dtype="float32", max_model_len=256)
    vecs = llm.embed(prompt_token_ids=[[1, 2, 3, 4], [9, 8]])
    assert len(vecs) == 2
    assert vecs[0].shape == (64,)
    mean_vecs = llm.embed(prompt_token_ids=[[1, 2, 3, 4]], pooling="mean")
    assert not np.allclose(mean_vecs[0], vecs[0])


def test_ppl_int8_kv_delta(ckpt):
    """INT8-KV quality gate (VERDICT/BASELINE config 3 pairing): perplexity
    with the quantized cache must sit within 0.1 of the bf16-cache PPL."""
    m, path = ckpt
    rng = np.random.default_rng(1)
    token_ids = rng.integers(0, 256, size=150).tolist()

    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.runner import ModelRunner
    from vllm_metax_tpu.evaluation import compute_ppl

    def ppl(kv_dtype):
        config = EngineConfig(
            model_config=ModelConfig.from_pretrained(path, dtype="float32",
                                                     max_model_len=256),
            cache_config=CacheConfig(block_size=16, num_blocks=32,
                                     kv_cache_dtype=kv_dtype),
            scheduler_config=SchedulerConfig(max_num_seqs=2,
                                             max_num_batched_tokens=256),
            load_config=LoadConfig(),
        )
        return compute_ppl(ModelRunner(config), token_ids)

    base = ppl("auto")
    quant = ppl("int8")
    assert abs(quant - base) < 0.1, (base, quant)
