"""Baichuan-MoE: per-layer heterogeneous experts (ref: baichuan_moe.py).

No public reference implementation exists to oracle against (the HF
checkpoint uses remote code), so coverage is: checkpoint loading under the
reference's weight names (W_pack / mlp.router / mlp.local_experts_routed.N /
mlp.local_experts_fixed / NormHead), the routed+fixed averaging math vs a
hand-written loop, engine e2e, and TP parity.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.sample.params import SamplingParams

E, I, HEADS, VOCAB = 64, 96, 4, 256
PLAN = {"routed": "1,4", "selected": "1,2", "fixed": "0,2"}


def _mc():
    return ModelConfig(
        architecture="BaiChuanMoEForCausalLM",
        hidden_size=E,
        intermediate_size=I,
        num_hidden_layers=2,
        num_attention_heads=HEADS,
        num_key_value_heads=HEADS,
        vocab_size=VOCAB,
        max_position_embeddings=512,
        max_model_len=512,
        dtype="float32",
        hf_config={
            "num_experts_routed_per_layer": PLAN["routed"],
            "num_experts_selected_per_layer": PLAN["selected"],
            "num_experts_fixed_per_layer": PLAN["fixed"],
        },
    )


def _config(mc, tp=1, load="dummy", model=""):
    mc.model = model
    return EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        parallel_config=ParallelConfig(tensor_parallel_size=tp),
        load_config=LoadConfig(load_format=load, seed=0),
    )


def _run(config, mesh=None, max_tokens=8):
    engine = EngineCore(config, mesh=mesh)
    engine.add_request(
        "r0", [1, 5, 9, 13, 200], SamplingParams(max_tokens=max_tokens,
                                                 temperature=0.0)
    )
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    return toks


def test_engine_generates_dummy():
    toks = _run(_config(_mc()))
    assert len(toks) == 8


def test_tp2_matches_single_device():
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh

    ref = _run(_config(_mc()))
    out = _run(_config(_mc(), tp=2), mesh=make_tp_mesh(2))
    assert out == ref


def test_moe_routed_plus_fixed_average():
    """The MoE block must equal softmax-top-k routed output averaged with the
    fixed MLP: (routed + fixed)/2 (ref baichuan_moe.py:267-273)."""
    from vllm_metax_tpu.models.registry import get_model

    model = get_model("BaiChuanMoEForCausalLM")
    cfg = _mc()
    params = model.init_params(cfg, None, seed=0)
    lp = params["layer_list"][1]
    assert "router" in lp and "gate_up_fixed" in lp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((6, E)).astype(np.float32) * 0.3)

    # hand loop
    logits = np.asarray(x @ lp["router"]["w"], np.float64)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    w1 = np.asarray(lp["experts_gate_up"]["w"], np.float64)
    w2 = np.asarray(lp["experts_down"]["w"], np.float64)
    routed = np.zeros((6, E))
    for t in range(6):
        top = np.argsort(-probs[t])[:2]
        wsum = probs[t][top].sum()
        for eidx in top:
            h = np.asarray(x[t], np.float64) @ w1[eidx]
            g, u = h[:I], h[I:]
            act = (g / (1 + np.exp(-g))) * u
            routed[t] += (probs[t][eidx] / wsum) * (act @ w2[eidx])
    gf = np.asarray(lp["gate_up_fixed"]["w"], np.float64)
    df = np.asarray(lp["down_fixed"]["w"], np.float64)
    h = np.asarray(x, np.float64) @ gf
    fi = gf.shape[1] // 2
    act = (h[:, :fi] / (1 + np.exp(-h[:, :fi]))) * h[:, fi:]
    expected = (routed + act @ df) / 2

    # model path (same ops the forward uses)
    from vllm_metax_tpu.layers.linear import apply_linear
    from vllm_metax_tpu.ops.activation import ACT2FN
    from vllm_metax_tpu.ops.moe import fused_experts, fused_topk

    act_fn = ACT2FN["silu"]
    gl = jnp.dot(x, lp["router"]["w"], preferred_element_type=jnp.float32)
    weights, ids = fused_topk(gl, 2)
    y = fused_experts(
        x, lp["experts_gate_up"], lp["experts_down"], weights, ids, act_fn, 4
    )
    fixed = apply_linear(
        lp["down_fixed"], act_fn(apply_linear(lp["gate_up_fixed"], x))
    )
    got = (y + fixed) * 0.5
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)


def test_checkpoint_load_reference_names(tmp_path):
    """Loader consumes the reference's weight naming (W_pack, mlp.router,
    local_experts_routed.N, local_experts_fixed, NormHead lm_head)."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(1)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    d = E // HEADS
    tensors = {
        "model.embed_tokens.weight": w(VOCAB, E),
        "model.norm.weight": np.ones(E, np.float32),
        "lm_head.weight": w(VOCAB, E) + 1.0,
    }
    for l in range(2):
        pre = f"model.layers.{l}"
        tensors[f"{pre}.input_layernorm.weight"] = np.ones(E, np.float32)
        tensors[f"{pre}.post_attention_layernorm.weight"] = np.ones(
            E, np.float32
        )
        tensors[f"{pre}.self_attn.W_pack.weight"] = w(3 * HEADS * d, E)
        tensors[f"{pre}.self_attn.o_proj.weight"] = w(E, HEADS * d)
    # layer 0 dense
    tensors["model.layers.0.mlp.gate_proj.weight"] = w(I, E)
    tensors["model.layers.0.mlp.up_proj.weight"] = w(I, E)
    tensors["model.layers.0.mlp.down_proj.weight"] = w(E, I)
    # layer 1 MoE: 4 routed + fixed(2)
    tensors["model.layers.1.mlp.router.weight"] = w(4, E)
    for j in range(4):
        base = f"model.layers.1.mlp.local_experts_routed.{j}"
        tensors[f"{base}.gate_proj.weight"] = w(I, E)
        tensors[f"{base}.up_proj.weight"] = w(I, E)
        tensors[f"{base}.down_proj.weight"] = w(E, I)
    fixed = "model.layers.1.mlp.local_experts_fixed"
    tensors[f"{fixed}.gate_proj.weight"] = w(2 * I, E)
    tensors[f"{fixed}.up_proj.weight"] = w(2 * I, E)
    tensors[f"{fixed}.down_proj.weight"] = w(E, 2 * I)

    path = str(tmp_path / "bc_moe")
    os.makedirs(path)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(
            {
                "architectures": ["BaiChuanMoEForCausalLM"],
                "hidden_size": E,
                "intermediate_size": I,
                "num_hidden_layers": 2,
                "num_attention_heads": HEADS,
                "vocab_size": VOCAB,
                "max_position_embeddings": 512,
                "rms_norm_eps": 1e-6,
                "rope_base": 10000.0,
                "num_experts_routed_per_layer": PLAN["routed"],
                "num_experts_selected_per_layer": PLAN["selected"],
                "num_experts_fixed_per_layer": PLAN["fixed"],
            },
            f,
        )

    mc = ModelConfig.from_pretrained(path, dtype="float32")
    assert mc.architecture == "BaiChuanMoEForCausalLM"
    toks = _run(_config(mc, load="auto", model=path))
    assert len(toks) == 8

    # NormHead: loaded lm_head columns are unit-norm
    from vllm_metax_tpu.models.registry import get_model

    params = get_model(mc.architecture).load_weights(mc, None, path)
    norms = np.linalg.norm(np.asarray(params["lm_head"]), axis=0)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_registered():
    from vllm_metax_tpu.models.registry import get_model

    m = get_model("BaiChuanMoEForCausalLM")
    assert hasattr(m, "forward") and hasattr(m, "load_weights")
