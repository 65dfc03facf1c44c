"""Quantized matmul + checkpoint-repack tests.

Pattern of the reference's tests/kernels/quantization/ suites (test_gptq.py,
test_awq.py, test_int8_quant.py, test_fp8_quant.py): every op is compared
against explicit reference math over a small parameter lattice.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metax_tpu.ops.quant import (
    dequant_int4,
    fp8_matmul,
    int4_matmul,
    int8_wo_matmul,
    pack_int4,
    quantize_activations_int8,
    quantize_fp8_channel,
    quantize_int4_grouped,
    quantize_int8_channel,
    unpack_int4,
    w8a8_int8_matmul,
)


def test_pack_unpack_int4_roundtrip(rng):
    q = rng.integers(0, 16, size=(64, 32)).astype(np.uint8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (32, 32)
    out = np.asarray(unpack_int4(packed))
    np.testing.assert_array_equal(out, q)


@pytest.mark.parametrize("group_size", [32, 64, -1])
@pytest.mark.parametrize("sym", [True, False])
def test_int4_quant_dequant_error(rng, group_size, sym):
    w = rng.standard_normal((128, 64), dtype=np.float32)
    w_p4, s, zs = quantize_int4_grouped(jnp.asarray(w), group_size, sym=sym)
    w_dq = np.asarray(dequant_int4(w_p4, s, zs, jnp.float32))
    # max error is bounded by half a quantization step per group
    gs = 128 if group_size == -1 else group_size
    step = np.asarray(s).repeat(gs, axis=0)
    assert np.all(np.abs(w_dq - w) <= step * 0.51 + 1e-6)


def test_int4_matmul_matches_explicit_dequant(rng):
    x = jnp.asarray(rng.standard_normal((4, 128), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((128, 64), dtype=np.float32))
    w_p4, s, zs = quantize_int4_grouped(w, 32)
    y = int4_matmul(x, w_p4, s, zs)
    y_ref = x @ dequant_int4(w_p4, s, zs, jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_int4_matmul_with_perm(rng):
    x = jnp.asarray(rng.standard_normal((4, 128), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((128, 64), dtype=np.float32))
    w_p4, s, zs = quantize_int4_grouped(w, 32)
    perm = jnp.asarray(rng.permutation(128).astype(np.int32))
    y = int4_matmul(x, w_p4, s, zs, perm)
    y_ref = x[:, perm] @ dequant_int4(w_p4, s, zs, jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("grouped", [False, True])
def test_int8_wo_matmul_close_to_dense(rng, grouped):
    x = jnp.asarray(rng.standard_normal((8, 256), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((256, 128), dtype=np.float32)) * 0.05
    if grouped:
        wf = np.asarray(w, np.float32).reshape(4, 64, 128)
        amax = np.abs(wf).max(axis=1)
        s = np.maximum(amax / 127.0, 1e-10)
        q = np.clip(np.round(wf / s[:, None, :]), -128, 127).astype(np.int8)
        w_i8, s = jnp.asarray(q.reshape(256, 128)), jnp.asarray(s)
    else:
        w_i8, s = quantize_int8_channel(w)
    y = int8_wo_matmul(x, w_i8, s)
    y_dense = x @ w
    err = np.abs(np.asarray(y) - np.asarray(y_dense))
    assert err.max() < 0.05  # int8 per-channel on small weights is tight


def test_dynamic_int8_act_quant(rng):
    x = jnp.asarray(rng.standard_normal((8, 64), dtype=np.float32)) * 3.0
    q, scale = quantize_activations_int8(x)
    x_dq = np.asarray(q, np.float32) * np.asarray(scale)
    np.testing.assert_allclose(x_dq, np.asarray(x), atol=np.asarray(scale).max())
    assert np.abs(np.asarray(q)).max() <= 127


def test_w8a8_int8_matmul_close_to_dense(rng):
    x = jnp.asarray(rng.standard_normal((8, 256), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((256, 128), dtype=np.float32)) * 0.05
    w_i8, s = quantize_int8_channel(w)
    y = w8a8_int8_matmul(x, w_i8, s)
    y_dense = x @ w
    rel = np.abs(np.asarray(y) - np.asarray(y_dense)) / (
        np.abs(np.asarray(y_dense)) + 1e-2
    )
    assert np.median(rel) < 0.02


def test_fp8_matmul_close_to_dense(rng):
    x = jnp.asarray(rng.standard_normal((8, 256), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((256, 128), dtype=np.float32)) * 0.05
    w_f8, s = quantize_fp8_channel(w)
    y = fp8_matmul(x, w_f8, s)
    y_dense = x @ w
    rel = np.abs(np.asarray(y) - np.asarray(y_dense)) / (
        np.abs(np.asarray(y_dense)) + 1e-2
    )
    assert np.median(rel) < 0.05


# ------------------------------------------------------------- GPTQ unpack

def _pack_gptq_qweight(q: np.ndarray, bits: int = 4) -> np.ndarray:
    pack = 32 // bits
    k, n = q.shape
    out = np.zeros((k // pack, n), np.uint32)
    for i in range(pack):
        out |= q[i::pack].astype(np.uint32) << (bits * i)
    return out.view(np.int32)


def _pack_gptq_qzeros(z: np.ndarray, bits: int = 4) -> np.ndarray:
    """z: (G, N) actual zero points; stored form subtracts 1."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    stored = (z.astype(np.int64) - 1) & mask
    g, n = z.shape
    out = np.zeros((g, n // pack), np.uint32)
    for i in range(pack):
        out |= stored[:, i::pack].astype(np.uint32) << (bits * i)
    return out.view(np.int32)


def test_gptq_repack_matches_reference_dequant(rng):
    from vllm_metax_tpu.quantization.gptq import repack_gptq

    k, n, gs = 128, 64, 32
    g = k // gs
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint8)
    z = rng.integers(1, 16, size=(g, n)).astype(np.uint8)  # stored z-1 ∈ [0,15]
    s = (rng.random((g, n), dtype=np.float32) + 0.5).astype(np.float32)
    p = repack_gptq(_pack_gptq_qweight(q), _pack_gptq_qzeros(z), s, g_idx=None)
    assert "perm" not in p
    w = np.asarray(dequant_int4(p["w_p4"], p["s"], p["zs"], jnp.float32))
    w_ref = (q.astype(np.float32) - z.repeat(gs, axis=0)) * s.repeat(gs, axis=0)
    np.testing.assert_allclose(w, w_ref, rtol=1e-6, atol=1e-6)


def test_gptq_desc_act_perm(rng):
    from vllm_metax_tpu.quantization.gptq import repack_gptq

    k, n, gs = 128, 64, 32
    g = k // gs
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint8)
    z = rng.integers(1, 16, size=(g, n)).astype(np.uint8)
    s = (rng.random((g, n), dtype=np.float32) + 0.5).astype(np.float32)
    # random assignment of rows to groups, gs rows each (desc_act style)
    g_idx = rng.permutation(np.arange(k) // gs).astype(np.int32)
    p = repack_gptq(_pack_gptq_qweight(q), _pack_gptq_qzeros(z), s, g_idx)
    assert "perm" in p
    # full linear: y = x @ W where W[k] = (q[k] - z[g_idx[k]]) * s[g_idx[k]]
    x = rng.standard_normal((4, k), dtype=np.float32)
    w_ref = (q.astype(np.float32) - z[g_idx]) * s[g_idx]
    y = int4_matmul(jnp.asarray(x), p["w_p4"], p["s"], p["zs"], p["perm"])
    np.testing.assert_allclose(np.asarray(y), x @ w_ref, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- AWQ unpack

def _pack_awq(vals: np.ndarray, bits: int = 4) -> np.ndarray:
    # AWQ convention: nibble position p of each word holds logical column
    # ORDER[p], ORDER = [0,2,4,6,1,3,5,7] — so logical col i goes to nibble
    # position argsort(ORDER)[i] (AutoAWQ's AWQ_REVERSE_ORDER).
    pos = np.argsort(np.array([0, 2, 4, 6, 1, 3, 5, 7]))
    pack = 32 // bits
    r, c = vals.shape
    out = np.zeros((r, c // pack), np.uint32)
    for i in range(pack):
        out |= vals[:, i::pack].astype(np.uint32) << (bits * int(pos[i]))
    return out.view(np.int32)


def test_awq_repack_matches_reference_dequant(rng):
    from vllm_metax_tpu.quantization.awq import repack_awq

    k, n, gs = 64, 128, 32
    g = k // gs
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint8)
    z = rng.integers(0, 16, size=(g, n)).astype(np.uint8)
    s = (rng.random((g, n), dtype=np.float32) + 0.5).astype(np.float32)
    p = repack_awq(_pack_awq(q), _pack_awq(z), s)
    w = np.asarray(dequant_int4(p["w_p4"], p["s"], p["zs"], jnp.float32))
    w_ref = (q.astype(np.float32) - z.repeat(gs, axis=0)) * s.repeat(gs, axis=0)
    np.testing.assert_allclose(w, w_ref, rtol=1e-6, atol=1e-6)


# ------------------------------------------------------------- e2e quantized

@pytest.mark.parametrize("method,bits", [("int8", 8), ("gptq", 4), ("fp8", 8),
                                         ("w8a8_int8", 8)])
def test_quantized_model_generates(small_model_config, method, bits):
    """Quantized dummy-weight engine produces sane greedy output (the pattern
    of the reference's quantized CI targets, .modelpath/all.json qwen3-30b-gptq
    etc. driven through tests/e2e/)."""
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        QuantizationConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    qc = QuantizationConfig(
        method=method, bits=bits, group_size=32 if bits == 4 else -1
    )
    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=qc,
    )
    engine = EngineCore(config)
    engine.add_request("r0", [1, 2, 3, 4, 5], SamplingParams(max_tokens=8))
    tokens = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            tokens.extend(out.new_token_ids)
    assert len(tokens) == 8
    assert all(0 <= t < small_model_config.vocab_size for t in tokens)


def test_gptq_desc_act_row_parallel_tp2(rng):
    """desc_act GPTQ under TP: rows (sorted by g_idx at load) shard
    contiguously; each rank all-gathers its activation slice to full width
    and indexes it with its perm slice (layers/linear.py gather_axis) —
    result must equal the unsharded linear exactly."""
    import jax
    from jax.sharding import PartitionSpec as P

    from vllm_metax_tpu.layers.linear import apply_linear
    from vllm_metax_tpu.models.llama import _repack_p4_for_shards
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh
    from vllm_metax_tpu.quantization.gptq import repack_gptq

    k, n, gs, tp = 128, 64, 32, 2
    g = k // gs
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint8)
    z = rng.integers(1, 16, size=(g, n)).astype(np.uint8)
    s = (rng.random((g, n), dtype=np.float32) + 0.5).astype(np.float32)
    g_idx = rng.permutation(np.arange(k) // gs).astype(np.int32)
    p = repack_gptq(_pack_gptq_qweight(q), _pack_gptq_qzeros(z), s, g_idx)
    x = rng.standard_normal((4, k)).astype(np.float32)
    y_ref = np.asarray(apply_linear(p, jnp.asarray(x)))

    stacked = jax.tree_util.tree_map(lambda a: a[None], p)  # L=1
    stacked = _repack_p4_for_shards(stacked, tp)
    specs = {
        "w_p4": P(None, "tp", None),
        "s": P(None, "tp", None),
        "zs": P(None, "tp", None),
        "perm": P(None, "tp"),
    }
    mesh = make_tp_mesh(tp)

    def fn(pl, xl):
        y = apply_linear(
            pl, xl, layer_idx=jnp.int32(0), gather_axis="tp"
        )
        return jax.lax.psum(y, "tp")

    y = jax.shard_map(
        fn, mesh=mesh, in_specs=(specs, P(None, "tp")), out_specs=P(),
        check_vma=False,
    )(stacked, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)


def test_fp8_prequantized_checkpoint_passthrough(tmp_path):
    """HF fp8 checkpoints (e4m3 `weight` + `weight_scale`) must load with
    codes and scales passed through VERBATIM — dropping weight_scale skews
    every channel by its scale (regression: the dense loader used to read
    only `.weight`). Also: greedy generation matches a dense checkpoint
    carrying the exact dequantized weights."""
    import json
    import os

    import ml_dtypes
    import numpy as np
    from safetensors.numpy import save_file

    H, I, V, L = 64, 128, 128, 2
    rng = np.random.default_rng(0)

    def build(d, fp8: bool):
        tensors = {}
        dq = {}

        def lin(name, k, n):
            w = rng.standard_normal((n, k)).astype(np.float32)
            s = (np.abs(w).max(axis=1, keepdims=True) / 448.0).astype(
                np.float32
            )
            codes = (w / s).astype(ml_dtypes.float8_e4m3fn)
            dq[name] = codes.astype(np.float32) * s
            if fp8:
                tensors[name + ".weight"] = codes
                tensors[name + ".weight_scale"] = s
            else:
                tensors[name + ".weight"] = dq[name]

        r2 = np.random.default_rng(1)
        emb = r2.standard_normal((V, H)).astype(np.float32)
        head = r2.standard_normal((V, H)).astype(np.float32)
        for i in range(L):
            pre = f"model.layers.{i}"
            for nm, k, n in [
                (f"{pre}.self_attn.q_proj", H, H),
                (f"{pre}.self_attn.k_proj", H, H),
                (f"{pre}.self_attn.v_proj", H, H),
                (f"{pre}.self_attn.o_proj", H, H),
                (f"{pre}.mlp.gate_proj", H, I),
                (f"{pre}.mlp.up_proj", H, I),
                (f"{pre}.mlp.down_proj", I, H),
            ]:
                lin(nm, k, n)
            tensors[f"{pre}.input_layernorm.weight"] = np.ones(H, np.float32)
            tensors[f"{pre}.post_attention_layernorm.weight"] = np.ones(
                H, np.float32
            )
        tensors["model.norm.weight"] = np.ones(H, np.float32)
        tensors["model.embed_tokens.weight"] = emb
        tensors["lm_head.weight"] = head
        os.makedirs(d, exist_ok=True)
        save_file(tensors, os.path.join(d, "model.safetensors"))
        cfg = {
            "architectures": ["LlamaForCausalLM"], "hidden_size": H,
            "intermediate_size": I, "num_hidden_layers": L,
            "num_attention_heads": 4, "num_key_value_heads": 4,
            "vocab_size": V, "max_position_embeddings": 256,
            "torch_dtype": "float32",
        }
        if fp8:
            cfg["quantization_config"] = {
                "quant_method": "fp8", "activation_scheme": "dynamic",
            }
        json.dump(cfg, open(os.path.join(d, "config.json"), "w"))
        return dq

    rng = np.random.default_rng(0)
    dq = build(str(tmp_path / "fp8"), fp8=True)
    rng = np.random.default_rng(0)
    build(str(tmp_path / "dense"), fp8=False)

    # weight-level: codes * scale == the true dequantized weights, exactly
    from vllm_metax_tpu.config import ModelConfig, QuantizationConfig
    from vllm_metax_tpu.models.llama import load_weights

    mc = ModelConfig.from_pretrained(str(tmp_path / "fp8"))
    qc = QuantizationConfig.from_hf_config(
        json.load(open(tmp_path / "fp8" / "config.json"))
    )
    assert qc.method == "fp8" and qc.enabled
    params = load_weights(mc, qc, str(tmp_path / "fp8"))
    lw = params["layers"]["down"]
    assert "w_f8" in lw
    w_eff = np.asarray(lw["w_f8"].astype(jnp.float32)) * np.asarray(
        lw["s"], np.float32
    )
    ref = np.stack(
        [dq[f"model.layers.{i}.mlp.down_proj"].T for i in range(L)]
    ) if w_eff.ndim == 3 else dq["model.layers.0.mlp.down_proj"].T
    np.testing.assert_array_equal(w_eff, ref)

    # engine-level: greedy tokens match the dense-dequant twin
    from vllm_metax_tpu import LLM, SamplingParams

    prompt = np.random.default_rng(7).integers(1, V, size=40).tolist()

    def gen(path):
        llm = LLM(model=path, dtype="float32")
        out = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(max_tokens=6, temperature=0.0),
        )
        return list(out[0].outputs[0].token_ids)

    assert gen(str(tmp_path / "fp8")) == gen(str(tmp_path / "dense"))


def test_fp8_block_scale_checkpoint(tmp_path):
    """DeepSeek-native block-fp8 checkpoints (`weight_scale_inv`, 128x128
    blocks) dequantize at load. Oracle: a dense checkpoint carrying the
    exact block-dequantized weights served with on-the-fly
    quantization='fp8' runs the SAME re-encode — tokens must match."""
    import json
    import os

    import ml_dtypes
    import numpy as np
    from safetensors.numpy import save_file

    H, I, V, L, BS = 128, 256, 256, 2, 64
    rng = np.random.default_rng(2)

    def build(d, fp8):
        tensors = {}

        def lin(name, k, n):
            w = rng.standard_normal((n, k)).astype(np.float32)
            nb, kb = -(-n // BS), -(-k // BS)
            s = np.zeros((nb, kb), np.float32)
            codes = np.zeros((n, k), ml_dtypes.float8_e4m3fn)
            for bi in range(nb):
                for bj in range(kb):
                    blk = w[bi * BS:(bi + 1) * BS, bj * BS:(bj + 1) * BS]
                    sc = max(np.abs(blk).max() / 448.0, 1e-8)
                    s[bi, bj] = sc
                    codes[bi * BS:(bi + 1) * BS, bj * BS:(bj + 1) * BS] = (
                        blk / sc
                    ).astype(ml_dtypes.float8_e4m3fn)
            dq = codes.astype(np.float32) * np.repeat(
                np.repeat(s, BS, 0)[:n], BS, 1
            )[:, :k]
            if fp8:
                tensors[name + ".weight"] = codes
                tensors[name + ".weight_scale_inv"] = s
            else:
                tensors[name + ".weight"] = dq

        r2 = np.random.default_rng(1)
        for i in range(L):
            pre = f"model.layers.{i}"
            for nm, k, n in [
                (f"{pre}.self_attn.q_proj", H, H),
                (f"{pre}.self_attn.k_proj", H, H),
                (f"{pre}.self_attn.v_proj", H, H),
                (f"{pre}.self_attn.o_proj", H, H),
                (f"{pre}.mlp.gate_proj", H, I),
                (f"{pre}.mlp.up_proj", H, I),
                (f"{pre}.mlp.down_proj", I, H),
            ]:
                lin(nm, k, n)
            tensors[f"{pre}.input_layernorm.weight"] = np.ones(H, np.float32)
            tensors[f"{pre}.post_attention_layernorm.weight"] = np.ones(
                H, np.float32
            )
        tensors["model.norm.weight"] = np.ones(H, np.float32)
        tensors["model.embed_tokens.weight"] = r2.standard_normal(
            (V, H)
        ).astype(np.float32)
        tensors["lm_head.weight"] = r2.standard_normal((V, H)).astype(
            np.float32
        )
        os.makedirs(d, exist_ok=True)
        save_file(tensors, os.path.join(d, "model.safetensors"))
        cfg = {
            "architectures": ["LlamaForCausalLM"], "hidden_size": H,
            "intermediate_size": I, "num_hidden_layers": L,
            "num_attention_heads": 4, "num_key_value_heads": 4,
            "vocab_size": V, "max_position_embeddings": 256,
            "torch_dtype": "float32",
        }
        if fp8:
            cfg["quantization_config"] = {
                "quant_method": "fp8",
                "weight_block_size": [BS, BS],
            }
        json.dump(cfg, open(os.path.join(d, "config.json"), "w"))

    rng = np.random.default_rng(2)
    build(str(tmp_path / "fp8b"), True)
    rng = np.random.default_rng(2)
    build(str(tmp_path / "dense"), False)

    from vllm_metax_tpu import LLM, SamplingParams

    prompt = np.random.default_rng(9).integers(1, V, size=33).tolist()

    def gen(path, **kw):
        llm = LLM(model=path, dtype="float32", **kw)
        out = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(max_tokens=6, temperature=0.0),
        )
        return list(out[0].outputs[0].token_ids)

    a = gen(str(tmp_path / "fp8b"))
    b = gen(str(tmp_path / "dense"), quantization="fp8")
    assert a and a == b


def test_fp8_mixtral_expert_checkpoint(tmp_path):
    """Per-channel fp8 Mixtral checkpoint (expert w1/w2/w3 quantized too)
    loads via dequant-at-read; oracle: dense twin + on-the-fly
    quantization='fp8' re-encodes identically — tokens must match."""
    import json
    import os

    import ml_dtypes
    import numpy as np
    from safetensors.numpy import save_file

    H, I, V, L, E = 64, 128, 256, 2, 4
    rng = np.random.default_rng(4)

    def build(d, fp8):
        tensors = {}

        def lin(name, k, n):
            w = rng.standard_normal((n, k)).astype(np.float32)
            s = (np.abs(w).max(axis=1, keepdims=True) / 448.0).astype(
                np.float32
            )
            codes = (w / s).astype(ml_dtypes.float8_e4m3fn)
            if fp8:
                tensors[name + ".weight"] = codes
                tensors[name + ".weight_scale"] = s
            else:
                tensors[name + ".weight"] = codes.astype(np.float32) * s

        r2 = np.random.default_rng(1)
        for i in range(L):
            pre = f"model.layers.{i}"
            for nm, k, n in [
                (f"{pre}.self_attn.q_proj", H, H),
                (f"{pre}.self_attn.k_proj", H, H),
                (f"{pre}.self_attn.v_proj", H, H),
                (f"{pre}.self_attn.o_proj", H, H),
            ]:
                lin(nm, k, n)
            for j in range(E):
                base = f"{pre}.block_sparse_moe.experts.{j}"
                lin(f"{base}.w1", H, I)
                lin(f"{base}.w3", H, I)
                lin(f"{base}.w2", I, H)
            tensors[f"{pre}.block_sparse_moe.gate.weight"] = (
                r2.standard_normal((E, H)).astype(np.float32)
            )
            tensors[f"{pre}.input_layernorm.weight"] = np.ones(H, np.float32)
            tensors[f"{pre}.post_attention_layernorm.weight"] = np.ones(
                H, np.float32
            )
        tensors["model.norm.weight"] = np.ones(H, np.float32)
        tensors["model.embed_tokens.weight"] = r2.standard_normal(
            (V, H)
        ).astype(np.float32)
        tensors["lm_head.weight"] = r2.standard_normal((V, H)).astype(
            np.float32
        )
        os.makedirs(d, exist_ok=True)
        save_file(tensors, os.path.join(d, "model.safetensors"))
        cfg = {
            "architectures": ["MixtralForCausalLM"], "hidden_size": H,
            "intermediate_size": I, "num_hidden_layers": L,
            "num_attention_heads": 4, "num_key_value_heads": 4,
            "vocab_size": V, "max_position_embeddings": 256,
            "num_local_experts": E, "num_experts_per_tok": 2,
            "torch_dtype": "float32",
        }
        if fp8:
            cfg["quantization_config"] = {
                "quant_method": "fp8", "activation_scheme": "dynamic",
            }
        json.dump(cfg, open(os.path.join(d, "config.json"), "w"))

    rng = np.random.default_rng(4)
    build(str(tmp_path / "fp8"), True)
    rng = np.random.default_rng(4)
    build(str(tmp_path / "dense"), False)

    from vllm_metax_tpu import LLM, SamplingParams

    prompt = np.random.default_rng(11).integers(1, V, size=30).tolist()

    def gen(path, **kw):
        llm = LLM(model=path, dtype="float32", **kw)
        out = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(max_tokens=6, temperature=0.0),
        )
        return list(out[0].outputs[0].token_ids)

    a = gen(str(tmp_path / "fp8"))
    b = gen(str(tmp_path / "dense"), quantization="fp8")
    assert a and a == b


def test_fp8_checkpoint_requantize_override(tmp_path):
    """quantization='w8a8_int8' on an fp8 checkpoint requantizes at load
    (fp8 dequantizes exactly at read, so the int8 re-encode matches a
    dense twin quantized the same way) — the fast-serving path for fp8
    checkpoints on int8-MXU hardware."""
    import json
    import os

    import ml_dtypes
    import numpy as np
    from safetensors.numpy import save_file

    H, I, V, L = 64, 128, 256, 2
    rng = np.random.default_rng(8)

    def build(d, fp8):
        tensors = {}

        def lin(name, k, n):
            w = rng.standard_normal((n, k)).astype(np.float32)
            s = (np.abs(w).max(axis=1, keepdims=True) / 448.0).astype(
                np.float32
            )
            codes = (w / s).astype(ml_dtypes.float8_e4m3fn)
            if fp8:
                tensors[name + ".weight"] = codes
                tensors[name + ".weight_scale"] = s
            else:
                tensors[name + ".weight"] = codes.astype(np.float32) * s

        r2 = np.random.default_rng(1)
        for i in range(L):
            pre = f"model.layers.{i}"
            for nm, k, n in [
                (f"{pre}.self_attn.q_proj", H, H),
                (f"{pre}.self_attn.k_proj", H, H),
                (f"{pre}.self_attn.v_proj", H, H),
                (f"{pre}.self_attn.o_proj", H, H),
                (f"{pre}.mlp.gate_proj", H, I),
                (f"{pre}.mlp.up_proj", H, I),
                (f"{pre}.mlp.down_proj", I, H),
            ]:
                lin(nm, k, n)
            tensors[f"{pre}.input_layernorm.weight"] = np.ones(H, np.float32)
            tensors[f"{pre}.post_attention_layernorm.weight"] = np.ones(
                H, np.float32
            )
        tensors["model.norm.weight"] = np.ones(H, np.float32)
        tensors["model.embed_tokens.weight"] = r2.standard_normal(
            (V, H)
        ).astype(np.float32)
        tensors["lm_head.weight"] = r2.standard_normal((V, H)).astype(
            np.float32
        )
        os.makedirs(d, exist_ok=True)
        save_file(tensors, os.path.join(d, "model.safetensors"))
        cfg = {
            "architectures": ["LlamaForCausalLM"], "hidden_size": H,
            "intermediate_size": I, "num_hidden_layers": L,
            "num_attention_heads": 4, "num_key_value_heads": 4,
            "vocab_size": V, "max_position_embeddings": 256,
            "torch_dtype": "float32",
        }
        if fp8:
            cfg["quantization_config"] = {
                "quant_method": "fp8", "activation_scheme": "dynamic",
            }
        json.dump(cfg, open(os.path.join(d, "config.json"), "w"))

    rng = np.random.default_rng(8)
    build(str(tmp_path / "fp8"), True)
    rng = np.random.default_rng(8)
    build(str(tmp_path / "dense"), False)

    from vllm_metax_tpu import LLM, SamplingParams

    prompt = np.random.default_rng(15).integers(1, V, size=30).tolist()

    def gen(path, **kw):
        llm = LLM(model=path, dtype="float32", **kw)
        out = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(max_tokens=6, temperature=0.0),
        )
        return list(out[0].outputs[0].token_ids)

    a = gen(str(tmp_path / "fp8"), quantization="w8a8_int8")
    b = gen(str(tmp_path / "dense"), quantization="w8a8_int8")
    assert a and a == b


def test_marlin_method_aliases():
    """gptq_marlin / awq_marlin quant_method names carry standard GPTQ/AWQ
    tensors (marlin is a kernel choice, not a checkpoint format) and must
    parse to the gptq/awq loaders — the analog of the reference forcing
    marlin configs through its non-marlin path."""
    from vllm_metax_tpu.config import QuantizationConfig

    qc = QuantizationConfig.from_hf_config({
        "quantization_config": {
            "quant_method": "gptq_marlin", "bits": 4, "group_size": 128,
        }
    })
    assert qc.method == "gptq" and qc.bits == 4 and qc.enabled
    qc = QuantizationConfig.from_hf_config({
        "quantization_config": {
            "quant_method": "awq_marlin", "bits": 4, "group_size": 64,
        }
    })
    assert qc.method == "awq" and qc.group_size == 64
