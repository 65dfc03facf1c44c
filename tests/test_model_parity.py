"""Model-math parity vs HuggingFace transformers.

The reference pins model correctness by comparing against HfRunner outputs
(tests/conftest.py:330,566). With no checkpoints in CI we do the same with
randomly-initialized tiny models saved to safetensors.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import tests.utils as tu
from vllm_metax_tpu.config import ModelConfig
from vllm_metax_tpu.models.registry import get_model


def _make_hf_model(tmp_path, arch: str):
    import torch
    import transformers

    torch.manual_seed(0)
    common = dict(
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
    if arch == "LlamaForCausalLM":
        cfg = transformers.LlamaConfig(**common, rope_theta=10000.0)
        model = transformers.LlamaForCausalLM(cfg)
    elif arch == "Qwen2ForCausalLM":
        cfg = transformers.Qwen2Config(**common)
        model = transformers.Qwen2ForCausalLM(cfg)
    elif arch == "Qwen3ForCausalLM":
        cfg = transformers.Qwen3Config(**common, head_dim=16)
        model = transformers.Qwen3ForCausalLM(cfg)
    elif arch == "LlamaForCausalLM-rope-llama3":
        cfg = transformers.LlamaConfig(
            **common,
            rope_scaling=dict(
                rope_type="llama3",
                factor=4.0,
                low_freq_factor=1.0,
                high_freq_factor=4.0,
                original_max_position_embeddings=128,
            ),
        )
        model = transformers.LlamaForCausalLM(cfg)
    else:
        raise ValueError(arch)
    model = model.eval()
    path = str(tmp_path / arch)
    model.save_pretrained(path, safe_serialization=True)
    return model, path


@pytest.mark.parametrize(
    "arch",
    [
        "LlamaForCausalLM",
        "Qwen2ForCausalLM",
        "Qwen3ForCausalLM",
        "LlamaForCausalLM-rope-llama3",
    ],
)
def test_prefill_logits_match_hf(tmp_path, arch):
    import torch

    hf_model, path = _make_hf_model(tmp_path, arch)
    cfg = ModelConfig.from_pretrained(path, dtype="float32")
    model = get_model(cfg.architecture)
    params = model.load_weights(cfg, None, path)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=17)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(prompt)[None]).logits[0].numpy()

    block_size, max_blocks = 16, 4
    md = tu.make_single_seq_metadata(0, len(prompt), block_size, max_blocks)
    kv = tu.make_kv_cache_stack(
        cfg.num_hidden_layers, max_blocks, block_size, cfg.num_kv_heads, cfg.head_dim
    )
    hidden, _ = model.forward(params, jnp.asarray(prompt), kv, md, cfg)
    logits = model.compute_logits(params, hidden, cfg)
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, rtol=2e-4, atol=2e-4
    )


def test_chunked_prefill_matches_full(tmp_path):
    """Prefill in two chunks (KV reuse across steps) must equal one-shot."""
    _, path = _make_hf_model(tmp_path, "LlamaForCausalLM")
    cfg = ModelConfig.from_pretrained(path, dtype="float32")
    model = get_model(cfg.architecture)
    params = model.load_weights(cfg, None, path)

    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, size=20)
    block_size, max_blocks = 16, 4

    md = tu.make_single_seq_metadata(0, 20, block_size, max_blocks)
    kv = tu.make_kv_cache_stack(
        cfg.num_hidden_layers, max_blocks, block_size, cfg.num_kv_heads, cfg.head_dim
    )
    full_hidden, _ = model.forward(params, jnp.asarray(prompt), kv, md, cfg)

    kv = tu.make_kv_cache_stack(
        cfg.num_hidden_layers, max_blocks, block_size, cfg.num_kv_heads, cfg.head_dim
    )
    md1 = tu.make_single_seq_metadata(0, 12, block_size, max_blocks)
    _, kv = model.forward(params, jnp.asarray(prompt[:12]), kv, md1, cfg)
    md2 = tu.make_single_seq_metadata(12, 8, block_size, max_blocks)
    hidden2, _ = model.forward(params, jnp.asarray(prompt[12:]), kv, md2, cfg)

    np.testing.assert_allclose(
        np.asarray(hidden2), np.asarray(full_hidden[12:]), rtol=1e-4, atol=1e-4
    )


def test_padded_batch_invariance(tmp_path):
    """Extra padding tokens must not change real-token outputs (the bucketed
    runner relies on this)."""
    _, path = _make_hf_model(tmp_path, "LlamaForCausalLM")
    cfg = ModelConfig.from_pretrained(path, dtype="float32")
    model = get_model(cfg.architecture)
    params = model.load_weights(cfg, None, path)

    rng = np.random.default_rng(2)
    prompt = rng.integers(0, cfg.vocab_size, size=9)
    block_size, max_blocks = 16, 4

    kv = tu.make_kv_cache_stack(
        cfg.num_hidden_layers, max_blocks, block_size, cfg.num_kv_heads, cfg.head_dim
    )
    md = tu.make_single_seq_metadata(0, 9, block_size, max_blocks)
    h_ref, _ = model.forward(params, jnp.asarray(prompt), kv, md, cfg)

    md_pad = tu.make_single_seq_metadata(0, 9, block_size, max_blocks,
                                         num_pad_tokens=7)
    ids_pad = jnp.asarray(np.pad(prompt, (0, 7)))
    h_pad, _ = model.forward(params, ids_pad, kv, md_pad, cfg)
    np.testing.assert_allclose(
        np.asarray(h_pad[:9]), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )


def test_mistral_sliding_window_parity(tmp_path):
    """Sliding-window attention e2e vs transformers Mistral (window smaller
    than the prompt so the mask actually truncates)."""
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    cfg = MistralConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        sliding_window=16,
        vocab_size=256,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = MistralForCausalLM(cfg).eval()
    path = str(tmp_path / "mistral")
    m.save_pretrained(path, safe_serialization=True)

    import numpy as np
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 256, size=40).tolist()  # > window
    with torch.no_grad():
        hf = m.generate(torch.tensor([prompt]), max_new_tokens=8,
                        do_sample=False)[0, len(prompt):].tolist()

    from vllm_metax_tpu.entrypoints.llm import LLM
    from vllm_metax_tpu.sample.params import SamplingParams

    llm = LLM(model=path, dtype="float32", max_model_len=256)
    assert llm.config.model_config.sliding_window == 16
    out = llm.generate(prompt_token_ids=[prompt],
                       sampling_params=SamplingParams(max_tokens=8,
                                                      temperature=0.0))
    assert out[0].outputs[0].token_ids == hf


def _tiny_parity_run(model, path, prompt, max_new=8):
    """Save `model` to `path`, greedy-generate with HF and with our LLM."""
    import torch

    model.save_pretrained(path, safe_serialization=True)
    with torch.no_grad():
        hf = model.generate(torch.tensor([prompt]), max_new_tokens=max_new,
                            do_sample=False)[0, len(prompt):].tolist()

    from vllm_metax_tpu.entrypoints.llm import LLM
    from vllm_metax_tpu.sample.params import SamplingParams

    llm = LLM(model=path, dtype="float32", max_model_len=256)
    out = llm.generate(prompt_token_ids=[prompt],
                       sampling_params=SamplingParams(max_tokens=max_new,
                                                      temperature=0.0))
    return out[0].outputs[0].token_ids, hf


def test_gemma_parity(tmp_path):
    """Gemma 1: (1+w) RMSNorm, sqrt(E)-scaled embeddings, GeGLU, tied head."""
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = GemmaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        vocab_size=256,
        max_position_embeddings=512,
    )
    torch.manual_seed(0)
    m = GemmaForCausalLM(cfg).eval()
    ours, hf = _tiny_parity_run(m, str(tmp_path / "gemma"), [2, 5, 9, 13, 200])
    assert ours == hf


def test_gemma2_parity(tmp_path):
    """Gemma 2: sandwich norms, attn/final soft-caps, query_pre_attn_scalar,
    alternating sliding window (window < prompt so the mask truncates)."""
    import numpy as np
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg = Gemma2Config(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        vocab_size=256,
        max_position_embeddings=512,
        query_pre_attn_scalar=24,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        sliding_window=16,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    m = Gemma2ForCausalLM(cfg).eval()
    rng = np.random.default_rng(3)
    prompt = rng.integers(2, 256, size=40).tolist()  # longer than the window
    ours, hf = _tiny_parity_run(m, str(tmp_path / "gemma2"), prompt)
    assert ours == hf


def test_phi3_longrope_parity(tmp_path):
    """Phi-3: fused qkv_proj/gate_up_proj checkpoint layout + longrope
    (SU-scaled) rope. Lengths stay inside the original window, where HF's
    wholesale factor switch and our per-position cache agree exactly."""
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    cfg = Phi3Config(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=128,
        original_max_position_embeddings=64,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.0, 1.1, 1.2, 1.3, 1.4, 1.5, 1.6, 1.7],
            "long_factor": [2.0, 2.1, 2.2, 2.3, 2.4, 2.5, 2.6, 2.7],
        },
        tie_word_embeddings=False,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(0)
    m = Phi3ForCausalLM(cfg).eval()
    ours, hf = _tiny_parity_run(m, str(tmp_path / "phi3"), [2, 5, 9, 13, 200, 47])
    assert ours == hf


def test_longrope_cache_switches_factors():
    """Positions past the original window must use the long factors."""
    import numpy as np

    from vllm_metax_tpu.ops.rope import compute_rope_cache

    scaling = {
        "type": "longrope",
        "short_factor": [1.0] * 8,
        "long_factor": [4.0] * 8,
        "original_max_position_embeddings": 32,
    }
    cache = np.asarray(compute_rope_cache(64, 16, 10000.0, scaling))
    mscale = np.sqrt(1 + np.log(2) / np.log(32))
    inv = 1.0 / (10000.0 ** (np.arange(0, 16, 2) / 16))
    np.testing.assert_allclose(
        cache[31, :8], np.cos(31 * inv) * mscale, rtol=1e-6
    )
    np.testing.assert_allclose(
        cache[40, :8], np.cos(40 * inv / 4.0) * mscale, rtol=1e-6
    )


def test_gpt2_parity(tmp_path):
    """GPT-2: LayerNorm, learned position embeddings, fused c_attn, non-gated
    tanh-GELU MLP, Conv1D (in,out) weight layout, tied head."""
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        n_embd=64,
        n_head=4,
        n_layer=2,
        n_positions=512,
        n_inner=None,
        vocab_size=256,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(0)
    m = GPT2LMHeadModel(cfg).eval()
    ours, hf = _tiny_parity_run(m, str(tmp_path / "gpt2"), [3, 5, 9, 13, 200, 47])
    assert ours == hf


def test_opt_parity(tmp_path):
    """OPT: +2-offset learned positions, pre-LN, ReLU MLP, biased attention."""
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        hidden_size=64,
        num_attention_heads=4,
        num_hidden_layers=2,
        ffn_dim=128,
        max_position_embeddings=512,
        vocab_size=256,
        word_embed_proj_dim=64,
        do_layer_norm_before=True,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(0)
    m = OPTForCausalLM(cfg).eval()
    ours, hf = _tiny_parity_run(m, str(tmp_path / "opt"), [3, 5, 9, 13, 200, 47])
    assert ours == hf


def test_opt_350m_style_parity(tmp_path):
    """OPT 350m variant: post-LN ordering + word_embed_proj_dim != hidden."""
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        hidden_size=64,
        num_attention_heads=4,
        num_hidden_layers=2,
        ffn_dim=128,
        max_position_embeddings=512,
        vocab_size=256,
        word_embed_proj_dim=32,
        do_layer_norm_before=False,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(1)
    m = OPTForCausalLM(cfg).eval()
    ours, hf = _tiny_parity_run(m, str(tmp_path / "opt350"), [3, 5, 9, 13, 200])
    assert ours == hf


def test_llm_chat_applies_template(tmp_path):
    """LLM.chat: chat template applied, then normal generation."""
    import torch
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import (
        LlamaConfig,
        LlamaForCausalLM,
        PreTrainedTokenizerFast,
    )

    cfg = LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=1024,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).eval()
    path = str(tmp_path / "chat")
    m.save_pretrained(path, safe_serialization=True)

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=512,
        special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(["user assistant hello world " * 5], trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>"
    )
    fast.chat_template = (
        "{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}\n"
        "{% endfor %}assistant:"
    )
    fast.save_pretrained(path)

    from vllm_metax_tpu.entrypoints.llm import LLM
    from vllm_metax_tpu.sample.params import SamplingParams

    llm = LLM(model=path, dtype="float32", max_model_len=256)
    msgs = [{"role": "user", "content": "hello world"}]
    out = llm.chat(msgs, SamplingParams(max_tokens=6, temperature=0.0))
    # prompt must be the templated conversation, and generation must match a
    # generate() call on those token ids
    expect_ids = fast.apply_chat_template(msgs, add_generation_prompt=True)
    assert out[0].prompt_token_ids == expect_ids
    ref = llm.generate(
        prompt_token_ids=[expect_ids],
        sampling_params=SamplingParams(max_tokens=6, temperature=0.0),
    )
    assert out[0].outputs[0].token_ids == ref[0].outputs[0].token_ids


def test_gpt_neox_parity(tmp_path):
    """GPT-NeoX/Pythia: parallel residual, per-head-interleaved fused qkv,
    partial rotary (rotary_pct=0.25)."""
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    cfg = GPTNeoXConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        vocab_size=256,
        max_position_embeddings=512,
        rotary_pct=0.25,
        use_parallel_residual=True,
        tie_word_embeddings=False,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(0)
    m = GPTNeoXForCausalLM(cfg).eval()
    ours, hf = _tiny_parity_run(m, str(tmp_path / "neox"), [3, 5, 9, 13, 200, 47])
    assert ours == hf


def test_gpt_neox_sequential_residual_parity(tmp_path):
    """use_parallel_residual=False variant (e.g. StableLM-base-alpha style)."""
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    cfg = GPTNeoXConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        vocab_size=256,
        max_position_embeddings=512,
        rotary_pct=1.0,
        use_parallel_residual=False,
        tie_word_embeddings=False,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(1)
    m = GPTNeoXForCausalLM(cfg).eval()
    ours, hf = _tiny_parity_run(m, str(tmp_path / "neox-seq"), [3, 5, 9, 13, 200])
    assert ours == hf


def test_registry_contract():
    """Every registered architecture resolves and exposes the full module
    contract the runner depends on."""
    from vllm_metax_tpu.models.registry import _REGISTRY, get_model

    required = (
        "forward",
        "compute_logits",
        "init_params",
        "load_weights",
        "param_specs",
        "kv_cache_spec",
    )
    for arch in _REGISTRY:
        mod = get_model(arch)
        for fn in required:
            assert hasattr(mod, fn), (arch, fn)

    import pytest

    with pytest.raises(ValueError):
        get_model("FooForCausalLM")
