"""Mamba-1 parity vs HF transformers (selective scan, conv state carry,
chunked prefill, engine e2e) — the reference's selective_scan_fwd surface
(csrc/mamba/mamba_ssm/selective_scan_fwd.cu)."""

import numpy as np
import pytest
import jax.numpy as jnp

import tests.utils as tu
from vllm_metax_tpu.config import ModelConfig
from vllm_metax_tpu.models.registry import get_model


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import torch
    from transformers import MambaConfig, MambaForCausalLM

    cfg = MambaConfig(
        hidden_size=64,
        state_size=8,
        conv_kernel=4,
        expand=2,
        time_step_rank=8,
        num_hidden_layers=2,
        vocab_size=256,
        layer_norm_epsilon=1e-5,
        use_bias=False,
        use_conv_bias=True,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = MambaForCausalLM(cfg).eval()
    path = str(tmp_path_factory.mktemp("mamba") / "tiny")
    hf.save_pretrained(path, safe_serialization=True)
    mcfg = ModelConfig.from_pretrained(path, dtype="float32")
    model = get_model(mcfg.architecture)
    params = model.load_weights(mcfg, None, path)
    return hf, path, mcfg, model, params


def _state_kv(model, cfg, max_blocks=4, block_size=16, rslot=4):
    spec = model.kv_cache_spec(cfg)
    kv = tu.make_kv_cache_stack(
        spec["num_layers"], max_blocks, block_size, spec["num_kv_heads"],
        spec["head_dim"],
    )
    return kv._replace(
        lin_state=jnp.zeros(
            (spec["linear_layers"], rslot) + tuple(spec["linear_state_shape"]),
            jnp.float32,
        ),
        conv_state=jnp.zeros(
            (spec["linear_layers"], rslot) + tuple(spec["conv_state_shape"]),
            jnp.float32,
        ),
    )


def test_prefill_logits_parity(setup):
    import dataclasses

    import torch

    hf, _, cfg, model, params = setup
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=19)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)[None]).logits[0].numpy()
    kv = _state_kv(model, cfg)
    md = tu.make_single_seq_metadata(0, len(ids), 16, 4)
    md = dataclasses.replace(md, state_idx=jnp.asarray([0], jnp.int32))
    hidden, kv = model.forward(params, jnp.asarray(ids), kv, md, cfg)
    logits = model.compute_logits(params, hidden, cfg)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=3e-4, atol=3e-4)


def test_prefill_then_decode_parity(setup):
    """State carry: prefill then 5 greedy decode steps vs HF generate
    (exercises the single-step path + conv history)."""
    import dataclasses

    import torch

    hf, _, cfg, model, params = setup
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, size=12)
    with torch.no_grad():
        gen = hf.generate(
            torch.tensor(ids)[None], max_new_tokens=5, do_sample=False
        )[0, len(ids):].tolist()
    kv = _state_kv(model, cfg)
    md = tu.make_single_seq_metadata(0, len(ids), 16, 4)
    md = dataclasses.replace(md, state_idx=jnp.asarray([0], jnp.int32))
    hidden, kv = model.forward(params, jnp.asarray(ids), kv, md, cfg)
    cur = int(np.asarray(model.compute_logits(params, hidden, cfg))[-1].argmax())
    got = []
    pos = len(ids)
    for _ in range(5):
        got.append(cur)
        md = tu.make_single_seq_metadata(pos, 1, 16, 4)
        md = dataclasses.replace(
            md, state_idx=jnp.asarray([0], jnp.int32), decode_only=True
        )
        hidden, kv = model.forward(
            params, jnp.asarray([cur], jnp.int32), kv, md, cfg
        )
        cur = int(
            np.asarray(model.compute_logits(params, hidden, cfg))[-1].argmax()
        )
        pos += 1
    assert got == gen


def test_chunked_prefill_matches_full(setup):
    """Split prefill (SSM + conv state handoff between chunks) == one-shot,
    including a split inside the conv kernel window."""
    import dataclasses

    _, _, cfg, model, params = setup
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 256, size=17)
    kv = _state_kv(model, cfg)
    md = tu.make_single_seq_metadata(0, len(ids), 16, 4)
    md = dataclasses.replace(md, state_idx=jnp.asarray([0], jnp.int32))
    full_hidden, _ = model.forward(params, jnp.asarray(ids), kv, md, cfg)

    for split in (2, 9):  # 2 < conv_kernel: history spans the chunk seam
        kv = _state_kv(model, cfg)
        outs = []
        for a, b in ((0, split), (split, len(ids))):
            md = tu.make_single_seq_metadata(a, b - a, 16, 4)
            md = dataclasses.replace(
                md, state_idx=jnp.asarray([0], jnp.int32)
            )
            hidden, kv = model.forward(
                params, jnp.asarray(ids[a:b]), kv, md, cfg
            )
            outs.append(np.asarray(hidden))
        np.testing.assert_allclose(
            np.concatenate(outs),
            np.asarray(full_hidden),
            rtol=2e-4,
            atol=2e-4,
        )


def test_llm_e2e_mixed_batch(setup):
    """Engine e2e: two concurrent requests, greedy vs HF, incl. multi-step
    decode windows over the state pools."""
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup
    rng = np.random.default_rng(3)
    p1 = rng.integers(0, 256, size=9).tolist()
    p2 = rng.integers(0, 256, size=14).tolist()
    with torch.no_grad():
        r1 = hf.generate(
            torch.tensor(p1)[None], max_new_tokens=12, do_sample=False
        )[0, len(p1):].tolist()
        r2 = hf.generate(
            torch.tensor(p2)[None], max_new_tokens=12, do_sample=False
        )[0, len(p2):].tolist()
    llm = LLM(
        model=path,
        dtype="float32",
        num_kv_blocks=64,
        max_num_seqs=4,
        max_num_batched_tokens=64,
        num_decode_steps=4,
    )
    sp = SamplingParams(max_tokens=12, temperature=0.0)
    outs = llm.generate(prompt_token_ids=[p1, p2], sampling_params=sp)
    assert outs[0].outputs[0].token_ids == r1
    assert outs[1].outputs[0].token_ids == r2


# ---------------------------------------------------------------------------
# Mamba-2 (SSD: per-head scalar decay, grouped B/C, gated RMSNorm)


@pytest.fixture(scope="module")
def setup2(tmp_path_factory):
    import torch
    from transformers import Mamba2Config, Mamba2ForCausalLM

    cfg = Mamba2Config(
        hidden_size=64,
        state_size=16,
        conv_kernel=4,
        expand=2,
        num_heads=8,
        head_dim=16,
        n_groups=2,
        chunk_size=8,
        num_hidden_layers=2,
        vocab_size=256,
        layer_norm_epsilon=1e-5,
        use_bias=False,
        use_conv_bias=True,
        rms_norm=True,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf = Mamba2ForCausalLM(cfg).eval()
    path = str(tmp_path_factory.mktemp("mamba2") / "tiny")
    hf.save_pretrained(path, safe_serialization=True)
    mcfg = ModelConfig.from_pretrained(path, dtype="float32")
    model = get_model(mcfg.architecture)
    params = model.load_weights(mcfg, None, path)
    return hf, path, mcfg, model, params


def test_m2_prefill_logits_parity(setup2):
    import dataclasses

    import torch

    hf, _, cfg, model, params = setup2
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 256, size=18)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)[None]).logits[0].numpy()
    kv = _state_kv(model, cfg)
    md = tu.make_single_seq_metadata(0, len(ids), 16, 4)
    md = dataclasses.replace(md, state_idx=jnp.asarray([0], jnp.int32))
    hidden, kv = model.forward(params, jnp.asarray(ids), kv, md, cfg)
    logits = model.compute_logits(params, hidden, cfg)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=4e-4, atol=4e-4)


def test_m2_llm_e2e(setup2):
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup2
    rng = np.random.default_rng(6)
    p1 = rng.integers(0, 256, size=11).tolist()
    p2 = rng.integers(0, 256, size=7).tolist()
    with torch.no_grad():
        r1 = hf.generate(
            torch.tensor(p1)[None], max_new_tokens=10, do_sample=False
        )[0, len(p1):].tolist()
        r2 = hf.generate(
            torch.tensor(p2)[None], max_new_tokens=10, do_sample=False
        )[0, len(p2):].tolist()
    llm = LLM(
        model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
        max_num_batched_tokens=16,  # chunked prefill across the conv seam
        num_decode_steps=4,
    )
    outs = llm.generate(
        prompt_token_ids=[p1, p2],
        sampling_params=SamplingParams(max_tokens=10, temperature=0.0),
    )
    assert outs[0].outputs[0].token_ids == r1
    assert outs[1].outputs[0].token_ids == r2


# ---------------------------------------------------------------------------
# Jamba (hybrid attention + Mamba + MoE)


@pytest.fixture(scope="module")
def setup_jamba(tmp_path_factory):
    import torch
    from transformers import JambaConfig, JambaForCausalLM

    cfg = JambaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        attn_layer_period=2,  # layers 1, 3 attention; 0, 2 mamba
        attn_layer_offset=1,
        expert_layer_period=2,  # layers 1, 3 MoE; 0, 2 dense
        expert_layer_offset=1,
        num_experts=4,
        num_experts_per_tok=2,
        mamba_d_state=8,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_dt_rank=8,
        use_mamba_kernels=False,
        vocab_size=256,
        rms_norm_eps=1e-6,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    hf = JambaForCausalLM(cfg).eval()
    path = str(tmp_path_factory.mktemp("jamba") / "tiny")
    hf.save_pretrained(path, safe_serialization=True)
    mcfg = ModelConfig.from_pretrained(path, dtype="float32")
    model = get_model(mcfg.architecture)
    params = model.load_weights(mcfg, None, path)
    return hf, path, mcfg, model, params


def test_jamba_prefill_logits_parity(setup_jamba):
    import dataclasses

    import torch

    hf, _, cfg, model, params = setup_jamba
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 256, size=15)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)[None]).logits[0].numpy()
    kv = _state_kv(model, cfg)
    md = tu.make_single_seq_metadata(0, len(ids), 16, 4)
    md = dataclasses.replace(md, state_idx=jnp.asarray([0], jnp.int32))
    hidden, kv = model.forward(params, jnp.asarray(ids), kv, md, cfg)
    logits = model.compute_logits(params, hidden, cfg)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=4e-4, atol=4e-4)


def test_jamba_llm_e2e(setup_jamba):
    """Engine e2e: paged attention + mamba state pools + MoE in one model,
    chunked prefill + multi-step decode."""
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path, cfg, model, params = setup_jamba
    rng = np.random.default_rng(8)
    p1 = rng.integers(0, 256, size=13).tolist()
    p2 = rng.integers(0, 256, size=6).tolist()
    with torch.no_grad():
        r1 = hf.generate(
            torch.tensor(p1)[None], max_new_tokens=10, do_sample=False
        )[0, len(p1):].tolist()
        r2 = hf.generate(
            torch.tensor(p2)[None], max_new_tokens=10, do_sample=False
        )[0, len(p2):].tolist()
    llm = LLM(
        model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
        max_num_batched_tokens=16, num_decode_steps=4,
    )
    outs = llm.generate(
        prompt_token_ids=[p1, p2],
        sampling_params=SamplingParams(max_tokens=10, temperature=0.0),
    )
    assert outs[0].outputs[0].token_ids == r1
    assert outs[1].outputs[0].token_ids == r2


def test_falcon_mamba_e2e(tmp_path):
    """FalconMamba = Mamba-1 + weightless RMS on B/C/dt (mixer_rms_eps)."""
    import torch
    from transformers import FalconMambaConfig, FalconMambaForCausalLM

    from vllm_metax_tpu import LLM, SamplingParams

    cfg = FalconMambaConfig(
        hidden_size=64,
        state_size=8,
        conv_kernel=4,
        expand=2,
        time_step_rank=8,
        num_hidden_layers=2,
        vocab_size=256,
        layer_norm_epsilon=1e-5,
        mixer_rms_eps=1e-6,
        use_bias=False,
        use_conv_bias=True,
        tie_word_embeddings=False,
    )
    torch.manual_seed(9)
    hf = FalconMambaForCausalLM(cfg).eval()
    path = str(tmp_path / "tiny_falcon_mamba")
    hf.save_pretrained(path, safe_serialization=True)
    rng = np.random.default_rng(10)
    ids = rng.integers(0, 256, size=12).tolist()
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(ids)[None], max_new_tokens=10, do_sample=False
        )[0, len(ids):].tolist()
    llm = LLM(
        model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
        max_num_batched_tokens=32, num_decode_steps=4,
    )
    outs = llm.generate(
        prompt_token_ids=[ids],
        sampling_params=SamplingParams(max_tokens=10, temperature=0.0),
    )
    assert outs[0].outputs[0].token_ids == ref


def test_ssd_chunked_equals_scan():
    """Chunked SSD (state-space duality form) is exactly the associative
    scan, incl. dt=0 pad rows and a non-multiple chunk length."""
    import jax.numpy as jnp

    from vllm_metax_tpu.ops.ssm import ssd_scan, ssd_scan_chunked

    rng = np.random.default_rng(11)
    r, t, h, p, n = 2, 53, 4, 8, 4
    x = jnp.asarray(rng.standard_normal((r, t, h, p)), jnp.float32)
    dt = jnp.abs(jnp.asarray(rng.standard_normal((r, t, h)), jnp.float32))
    dt = dt.at[1, 40:].set(0.0)
    a = -jnp.abs(jnp.asarray(rng.standard_normal(h), jnp.float32))
    b = jnp.asarray(rng.standard_normal((r, t, h, n)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((r, t, h, n)), jnp.float32)
    d = jnp.asarray(rng.standard_normal(h), jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((r, h, p, n)), jnp.float32)
    y1, s1 = ssd_scan(x, dt, a, b, c, d, h0)
    y2, s2 = ssd_scan_chunked(x, dt, a, b, c, d, h0, chunk=16)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=3e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=3e-4)
