"""EAGLE speculative decoding on a dense (llama-family) model.

Ref analog: vllm v1/spec_decode/eagle.py (EAGLE-1 head: fc over
[embed | hidden] + one decoder layer whose input_layernorm is removed).
Drafts are argmax — point-mass proposals — so the runner's prefix-accept
verification is exact: greedy output with spec ON must equal spec OFF.
"""

import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.sample.params import SamplingParams


def _mc(**kw):
    base = dict(
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
    base.update(kw)
    return ModelConfig(**base)


def _config(eagle: bool):
    spec = (
        SpeculativeConfig(method="eagle", num_speculative_tokens=1)
        if eagle
        else SpeculativeConfig()
    )
    return EngineConfig(
        model_config=_mc(),
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
        speculative_config=spec,
    )


def _run(config, prompts, max_tokens=12):
    engine = EngineCore(config)
    for i, p in enumerate(prompts):
        engine.add_request(
            f"r{i}", p, SamplingParams(max_tokens=max_tokens, temperature=0.0)
        )
    acc = {f"r{i}": [] for i in range(len(prompts))}
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
        steps += 1
        assert steps < 200
    return [acc[f"r{i}"] for i in range(len(prompts))], steps


PROMPTS = [[1, 5, 9, 13, 200, 47], [7, 3, 11]]


def test_eagle_greedy_parity_spec_on_off():
    ref, _ = _run(_config(eagle=False), PROMPTS)
    out, _ = _run(_config(eagle=True), PROMPTS)
    assert out == ref


def test_eagle_kv_pool_has_extra_layer():
    cfg = _config(eagle=True)
    engine = EngineCore(cfg)
    layers = cfg.model_config.num_hidden_layers
    nb = cfg.cache_config.num_blocks
    assert engine.runner.kv_cache.k.shape[0] == (layers + 1) * nb
    assert cfg.model_config.mtp_enabled


def test_eagle_rejects_mla_models():
    with pytest.raises(ValueError, match="dense-attention"):
        EngineConfig(
            model_config=_mc(
                architecture="DeepseekV3ForCausalLM",
                use_mla=True,
                kv_lora_rank=32,
                qk_nope_head_dim=16,
                qk_rope_head_dim=8,
                v_head_dim=16,
                q_lora_rank=24,
            ),
            speculative_config=SpeculativeConfig(
                method="eagle", num_speculative_tokens=1
            ),
        )


def test_eagle_checkpoint_loader(tmp_path):
    """EAGLE-1 checkpoint layout (fc + layers.0 without input_layernorm)
    loads into the draft param group and the engine decodes with it."""
    import numpy as np
    import safetensors.numpy as st

    cfg = _mc()
    e, hq, hkv, d = 64, 4, 2, 16
    rng = np.random.default_rng(0)

    def w(shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    tensors = {
        "fc.weight": w((e, 2 * e)),
        "layers.0.self_attn.q_proj.weight": w((hq * d, e)),
        "layers.0.self_attn.k_proj.weight": w((hkv * d, e)),
        "layers.0.self_attn.v_proj.weight": w((hkv * d, e)),
        "layers.0.self_attn.o_proj.weight": w((e, hq * d)),
        "layers.0.post_attention_layernorm.weight": np.ones(e, np.float32),
        "layers.0.mlp.gate_proj.weight": w((128, e)),
        "layers.0.mlp.up_proj.weight": w((128, e)),
        "layers.0.mlp.down_proj.weight": w((e, 128)),
        "embed_tokens.weight": w((256, e)),
    }
    path = tmp_path / "eagle_head"
    path.mkdir()
    st.save_file(tensors, str(path / "model.safetensors"))

    from vllm_metax_tpu.models.llama import load_eagle_weights

    mtp = load_eagle_weights(cfg, None, str(path))
    assert "ln1" not in mtp["layer"]  # EAGLE-1 drops layer-0 input norm
    assert mtp["fc"]["w"].shape == (2 * e, e)
    assert "embed" in mtp
