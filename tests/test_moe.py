"""MoE routing + fused experts vs reference math; Mixtral/Qwen3-MoE e2e.

Reference analogs: tests/kernels/moe/test_moe.py (torch_moe reference loop),
e2e MoE targets in .modelpath (qwen3-30b = Qwen3MoeForCausalLM).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metax_tpu.ops.activation import silu_and_mul
from vllm_metax_tpu.ops.moe import fused_experts, fused_topk, grouped_topk


def _ref_moe(x, w1, w2, topk_w, topk_ids):
    """Dense per-token loop (the reference's torch_moe test pattern)."""
    t, h = x.shape
    out = np.zeros((t, h), np.float32)
    for i in range(t):
        for kk in range(topk_ids.shape[1]):
            e = int(topk_ids[i, kk])
            hdn = x[i] @ w1[e]  # (2I,)
            i2 = hdn.shape[0] // 2
            act = (hdn[:i2] / (1 + np.exp(-hdn[:i2]))) * hdn[i2:]
            out[i] += float(topk_w[i, kk]) * (act @ w2[e])
    return out


def test_fused_topk_renormalize(rng):
    gating = jnp.asarray(rng.standard_normal((6, 8), dtype=np.float32))
    w, ids = fused_topk(gating, 2)
    assert w.shape == (6, 2) and ids.shape == (6, 2)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    # ids are the true argmax pair
    probs = np.asarray(jnp.take_along_axis(jnp.asarray(gating), ids, axis=1))
    assert (probs[:, 0] >= probs[:, 1]).all()


def test_grouped_topk_masks_groups(rng):
    t, e, groups, kg = 4, 16, 4, 2
    gating = jnp.asarray(rng.standard_normal((t, e), dtype=np.float32))
    w, ids = grouped_topk(gating, 4, groups, kg)
    gsz = e // groups
    # every chosen expert must lie in one of the top-kg groups per token
    import jax

    scores = np.asarray(jax.nn.softmax(gating, axis=-1))
    group_scores = scores.reshape(t, groups, gsz).max(-1)
    top_groups = np.argsort(-group_scores, axis=1)[:, :kg]
    for i in range(t):
        for eid in np.asarray(ids)[i]:
            assert eid // gsz in top_groups[i]


def test_fused_experts_matches_reference(rng):
    t, h, i2, e, k = 12, 64, 32, 8, 2
    x = rng.standard_normal((t, h), dtype=np.float32) * 0.5
    w1 = rng.standard_normal((e, h, 2 * i2), dtype=np.float32) * 0.1
    w2 = rng.standard_normal((e, i2, h), dtype=np.float32) * 0.1
    gating = jnp.asarray(rng.standard_normal((t, e), dtype=np.float32))
    topk_w, topk_ids = fused_topk(gating, k)
    y = fused_experts(
        jnp.asarray(x), {"w": jnp.asarray(w1)}, {"w": jnp.asarray(w2)},
        topk_w, topk_ids, silu_and_mul, e,
    )
    y_ref = _ref_moe(x, w1, w2, np.asarray(topk_w), np.asarray(topk_ids))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)


def test_fused_experts_quantized_int8(rng):
    t, h, i2, e, k = 8, 64, 32, 4, 2
    x = rng.standard_normal((t, h), dtype=np.float32) * 0.5
    w1 = rng.standard_normal((e, h, 2 * i2), dtype=np.float32) * 0.05
    w2 = rng.standard_normal((e, i2, h), dtype=np.float32) * 0.05
    gating = jnp.asarray(rng.standard_normal((t, e), dtype=np.float32))
    topk_w, topk_ids = fused_topk(gating, k)
    from vllm_metax_tpu.config import QuantizationConfig
    from vllm_metax_tpu.quantization import quantize_linear
    import jax

    qc = QuantizationConfig(method="int8", bits=8)
    b1 = jax.vmap(lambda w: quantize_linear({"w": w}, qc))(jnp.asarray(w1))
    b2 = jax.vmap(lambda w: quantize_linear({"w": w}, qc))(jnp.asarray(w2))
    y = fused_experts(
        jnp.asarray(x), b1, b2, topk_w, topk_ids, silu_and_mul, e
    )
    y_ref = _ref_moe(x, w1, w2, np.asarray(topk_w), np.asarray(topk_ids))
    err = np.abs(np.asarray(y) - y_ref)
    assert np.median(err) < 0.01


@pytest.fixture(scope="module")
def moe_model_config():
    from vllm_metax_tpu.config import ModelConfig

    return ModelConfig(
        model="dummy-mixtral",
        architecture="MixtralForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=128,
        dtype="float32",
    )


def _run_engine(config, mesh=None, max_tokens=8):
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    engine = EngineCore(config, mesh=mesh)
    engine.add_request(
        "r0", [1, 2, 3, 4, 5], SamplingParams(max_tokens=max_tokens, temperature=0.0)
    )
    engine.add_request(
        "r1", [9, 8, 7], SamplingParams(max_tokens=max_tokens, temperature=0.0)
    )
    acc = {"r0": [], "r1": []}
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
    return [acc["r0"], acc["r1"]]


def _make_config(mc, tp=1, quant=None):
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        ParallelConfig,
        QuantizationConfig,
        SchedulerConfig,
    )

    return EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        parallel_config=ParallelConfig(tensor_parallel_size=tp),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=quant or QuantizationConfig(),
    )


def test_mixtral_engine_generates(moe_model_config):
    out = _run_engine(_make_config(moe_model_config))
    assert len(out[0]) == 8 and len(out[1]) == 8


def test_mixtral_tp_matches(moe_model_config):
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh

    ref = _run_engine(_make_config(moe_model_config))
    out = _run_engine(_make_config(moe_model_config, tp=2), mesh=make_tp_mesh(2))
    assert out == ref


def test_mixtral_vs_transformers(tmp_path):
    """Greedy parity with transformers MixtralForCausalLM on a tiny random
    checkpoint (the pattern of tests/e2e/test_offline_inference_basic.py)."""
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        vocab_size=256,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = MixtralForCausalLM(cfg).eval()
    path = str(tmp_path / "tiny_mixtral")
    m.save_pretrained(path, safe_serialization=True)

    prompt = [1, 5, 9, 13, 200, 47]
    with torch.no_grad():
        hf = m.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        )[0, len(prompt):].tolist()

    from vllm_metax_tpu.entrypoints.llm import LLM
    from vllm_metax_tpu.sample.params import SamplingParams

    llm = LLM(model=path, dtype="float32", max_model_len=256)
    out = llm.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(max_tokens=8, temperature=0.0),
    )
    assert out[0].outputs[0].token_ids == hf


def test_qwen3_moe_vs_transformers(tmp_path):
    """Greedy parity with transformers Qwen3MoeForCausalLM (qk-norm + MoE)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    cfg = Qwen3MoeConfig(
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        vocab_size=256,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = Qwen3MoeForCausalLM(cfg).eval()
    path = str(tmp_path / "qwen3moe")
    m.save_pretrained(path, safe_serialization=True)

    prompt = [1, 5, 9, 13, 200, 47]
    with torch.no_grad():
        hf = m.generate(torch.tensor([prompt]), max_new_tokens=8,
                        do_sample=False)[0, len(prompt):].tolist()

    from vllm_metax_tpu.entrypoints.llm import LLM
    from vllm_metax_tpu.sample.params import SamplingParams

    llm = LLM(model=path, dtype="float32", max_model_len=256)
    out = llm.generate(prompt_token_ids=[prompt],
                       sampling_params=SamplingParams(max_tokens=8,
                                                      temperature=0.0))
    assert out[0].outputs[0].token_ids == hf


# ---------------------------------------------- dropless a2a EP dispatch

def _ep4_dispatch(rng, ids):
    """Drive _fused_experts_a2a on a 4-rank ep mesh against the replicated
    reference (psum of per-rank partials == full combine). `ids` controls
    routing — adversarial hot-expert patterns overflow the capacity buffers
    and must take the exact dropless fallback branch (lax.cond), so the
    output stays invariant (ref: the reference's dropless deepep backends,
    vllm_metax/platform.py:202-217)."""
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from vllm_metax_tpu.ops.moe import _fused_experts_a2a, fused_experts
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh

    t, h, i, e, k, ep = 32, 16, 32, 8, 2, 4
    x = jnp.asarray(rng.standard_normal((t, h), dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((e, h, 2 * i), dtype=np.float32)) * 0.1
    w2 = jnp.asarray(rng.standard_normal((e, i, h), dtype=np.float32)) * 0.1
    weights = jnp.asarray(rng.random((t, k), dtype=np.float32))
    act = jax.nn.silu

    def act_fn(z):
        g, u = jnp.split(z, 2, axis=-1)
        return act(g) * u

    ref = fused_experts(
        x, {"w": w1}, {"w": w2}, weights, ids, act_fn, e, ep_axis=None
    )

    mesh = make_tp_mesh(1, ep_size=ep)

    def ranked(x, w1_l, w2_l, weights, ids):
        part = _fused_experts_a2a(
            x, {"w": w1_l}, {"w": w2_l}, weights, ids, act_fn, e, "ep"
        )
        return jax.lax.psum(part, "ep")

    fn = jax.shard_map(
        ranked,
        mesh=mesh,
        in_specs=(P(), P("ep"), P("ep"), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = fn(x, w1, w2, weights, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_ep4_a2a_dropless_balanced(rng):
    # balanced routing: stays on the a2a branch (no overflow at cf=2)
    import numpy as np

    ids = jnp.asarray(
        np.stack([np.arange(32) % 8, (np.arange(32) + 4) % 8], axis=1),
        jnp.int32,
    )
    _ep4_dispatch(rng, ids)


def test_ep4_a2a_dropless_hot_expert(rng):
    # adversarial: EVERY token routes to rank 0's experts — overflows the
    # per-destination capacity, must take the exact fallback branch
    ids = jnp.zeros((32, 2), jnp.int32).at[:, 1].set(1)
    _ep4_dispatch(rng, ids)


def test_ep4_engine_auto_dispatch(monkeypatch):
    """auto dispatch at the engine level, ep=4: token-exact vs single
    device (crossover logic picks a2a or replicated per batch shape)."""
    from vllm_metax_tpu.config import ParallelConfig
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh
    from tests.test_parallel import (
        _make_config,
        _moe_config_for_parallel,
        _run_engine,
    )

    monkeypatch.setenv("METAX_TPU_EP_DISPATCH", "auto")
    mc = _moe_config_for_parallel()
    ref = _run_engine(_make_config(mc, 1))
    cfg = _make_config(mc, 1)
    cfg.parallel_config = ParallelConfig(
        tensor_parallel_size=1, expert_parallel_size=4
    )
    out = _run_engine(cfg, mesh=make_tp_mesh(1, 4))
    assert out == ref
