"""compressed-tensors checkpoint loading: config_groups scheme parsing and
synthetic-checkpoint loads for both schemes the reference serves
(W8A8-INT8 and WNA16 — quant_config/compressed_tensors_moe.py:31,92)."""

import json
import os

import numpy as np
import pytest

from vllm_metax_tpu.config import ModelConfig, QuantizationConfig
from vllm_metax_tpu.quantization.compressed_tensors import (
    _unpack_int32_nibbles,
    parse_ct_scheme,
)


def _ct_cfg(weights, input_acts):
    return {
        "quant_method": "compressed-tensors",
        "config_groups": {
            "group_0": {
                "weights": weights,
                "input_activations": input_acts,
                "targets": ["Linear"],
            }
        },
        "ignore": ["lm_head"],
    }


def test_parse_w8a8():
    qc = QuantizationConfig.from_hf_config(
        {
            "quantization_config": _ct_cfg(
                {"num_bits": 8, "symmetric": True, "strategy": "channel"},
                {"num_bits": 8, "dynamic": True},
            )
        }
    )
    assert qc.method == "compressed-tensors"
    assert qc.ct_scheme == "w8a8_int8"
    assert qc.bits == 8


def test_parse_wna16():
    qc = QuantizationConfig.from_hf_config(
        {
            "quantization_config": _ct_cfg(
                {
                    "num_bits": 4,
                    "symmetric": True,
                    "strategy": "group",
                    "group_size": 64,
                },
                None,
            )
        }
    )
    assert qc.ct_scheme == "wna16"
    assert qc.bits == 4
    assert qc.group_size == 64


def test_parse_legacy_defaults_to_w8a8():
    qc = QuantizationConfig.from_hf_config(
        {"quantization_config": {"quant_method": "compressed-tensors"}}
    )
    assert qc.ct_scheme == "w8a8_int8"


def test_nibble_unpack_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.integers(-8, 8, (4, 32)).astype(np.int32)
    packed = np.zeros((4, 4), np.uint32)
    for j in range(32):
        packed[:, j // 8] |= (vals[:, j].astype(np.uint32) & 0xF) << (
            4 * (j % 8)
        )
    out = _unpack_int32_nibbles(packed.astype(np.int32), 4)
    assert np.array_equal(out, vals)


def _write_ct_checkpoint(tmp_path, scheme):
    """Tiny llama ct checkpoint with synthetic quantized tensors."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    H, I, V, NL, NH = 64, 128, 256, 2, 4
    hd = H // NH
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "hidden_size": H,
        "intermediate_size": I,
        "num_hidden_layers": NL,
        "num_attention_heads": NH,
        "num_key_value_heads": NH,
        "vocab_size": V,
        "max_position_embeddings": 128,
        "rms_norm_eps": 1e-6,
        "torch_dtype": "float32",
        "tie_word_embeddings": False,
        "quantization_config": (
            _ct_cfg(
                {"num_bits": 8, "symmetric": True, "strategy": "channel"},
                {"num_bits": 8, "dynamic": True},
            )
            if scheme == "w8a8"
            else _ct_cfg(
                {
                    "num_bits": 4,
                    "symmetric": True,
                    "strategy": "group",
                    "group_size": 32,
                },
                None,
            )
        ),
    }
    tensors = {}

    def dense(name, n, k):
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.05
        tensors[name + ".weight"] = w
        return w

    def quant(name, n, k):
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.05
        if scheme == "w8a8":
            s = np.abs(w).max(axis=1, keepdims=True) / 127.0 + 1e-12
            q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
            tensors[name + ".weight"] = q
            tensors[name + ".weight_scale"] = s.astype(np.float32)
            deq = q.astype(np.float32) * s
        else:
            gs = 32
            g = k // gs
            wg = w.reshape(n, g, gs)
            s = np.abs(wg).max(axis=2) / 7.0 + 1e-12  # (N, G)
            q = np.clip(
                np.round(wg / s[:, :, None]), -8, 7
            ).astype(np.int32).reshape(n, k)
            packed = np.zeros((n, k // 8), np.uint32)
            for j in range(k):
                packed[:, j // 8] |= (q[:, j].astype(np.uint32) & 0xF) << (
                    4 * (j % 8)
                )
            tensors[name + ".weight_packed"] = packed.astype(np.int32)
            tensors[name + ".weight_scale"] = s.astype(np.float32)
            deq = (q.reshape(n, g, gs) * s[:, :, None]).reshape(n, k)
        return deq

    deq = {}
    tensors["model.embed_tokens.weight"] = (
        rng.standard_normal((V, H)).astype(np.float32) * 0.05
    )
    tensors["model.norm.weight"] = np.ones(H, np.float32)
    tensors["lm_head.weight"] = (
        rng.standard_normal((V, H)).astype(np.float32) * 0.05
    )
    for l in range(NL):
        pre = f"model.layers.{l}"
        tensors[pre + ".input_layernorm.weight"] = np.ones(H, np.float32)
        tensors[pre + ".post_attention_layernorm.weight"] = np.ones(
            H, np.float32
        )
        for lin, (n, k) in {
            "self_attn.q_proj": (NH * hd, H),
            "self_attn.k_proj": (NH * hd, H),
            "self_attn.v_proj": (NH * hd, H),
            "self_attn.o_proj": (H, NH * hd),
            "mlp.gate_proj": (I, H),
            "mlp.up_proj": (I, H),
            "mlp.down_proj": (H, I),
        }.items():
            deq[f"{pre}.{lin}"] = quant(f"{pre}.{lin}", n, k)
    path = str(tmp_path / f"ct-{scheme}")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    return path, deq


@pytest.mark.parametrize("scheme", ["w8a8", "wna16"])
def test_ct_checkpoint_generates(tmp_path, scheme):
    """Synthetic ct checkpoint loads through the real loader and the engine
    generates; quantized layers use the canonical layouts."""
    from vllm_metax_tpu import LLM, SamplingParams

    path, deq = _write_ct_checkpoint(tmp_path, scheme)
    llm = LLM(model=path, num_kv_blocks=32)
    qc = llm.config.quant_config
    assert qc.method == "compressed-tensors"
    assert qc.ct_scheme == ("w8a8_int8" if scheme == "w8a8" else "wna16")
    layers = llm.engine.runner.params["layers"]
    key = "w_i8" if scheme == "w8a8" else "w_p4"
    assert key in layers["qkv"], list(layers["qkv"])

    # loaded quantized weights dequantize to the checkpoint's dequant values
    from vllm_metax_tpu.ops.quant import dequant_int4

    q = layers["qkv"]
    ref = deq["model.layers.0.self_attn.q_proj"].T  # (K, N)
    nq = ref.shape[1]
    if scheme == "w8a8":
        got = np.asarray(q["w_i8"][0], np.float32) * np.asarray(q["s"][0])
    else:
        got = np.asarray(
            dequant_int4(q["w_p4"][0], q["s"][0], q["zs"][0], None)
        )
    np.testing.assert_allclose(got[:, :nq], ref, rtol=2e-2, atol=2e-3)

    out = llm.generate(
        prompt_token_ids=[[1, 2, 3, 4]],
        sampling_params=SamplingParams(max_tokens=4, temperature=0.0),
    )
    assert len(out[0].outputs[0].token_ids) == 4


def test_ct_fp8_float_scheme(tmp_path):
    """compressed-tensors FP8 ("float" type — the neuralmagic fp8
    distribution format) must route to the w_f8 runtime, NOT the int8
    branch (raw e4m3 bytes read as int8 weights). Oracle: dense twin with
    the exact dequantized weights + on-the-fly quantization='fp8'."""
    import json
    import os

    import ml_dtypes
    import numpy as np
    from safetensors.numpy import save_file

    H, I, V, L = 64, 128, 256, 2
    rng = np.random.default_rng(6)

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
                "quant_method": "compressed-tensors",
                "config_groups": {
                    "group_0": {
                        "targets": ["Linear"],
                        "weights": {
                            "type": "float", "num_bits": 8,
                            "strategy": "channel", "symmetric": True,
                        },
                        "input_activations": {
                            "type": "float", "num_bits": 8,
                            "dynamic": True,
                        },
                    }
                },
                "ignore": ["lm_head"],
            }
        json.dump(cfg, open(os.path.join(d, "config.json"), "w"))

    rng = np.random.default_rng(6)
    build(str(tmp_path / "ct"), True)
    rng = np.random.default_rng(6)
    build(str(tmp_path / "dense"), False)

    from vllm_metax_tpu.config import QuantizationConfig

    qc = QuantizationConfig.from_hf_config(
        json.load(open(tmp_path / "ct" / "config.json"))
    )
    assert qc.method == "compressed-tensors" and qc.ct_scheme == "fp8"

    from vllm_metax_tpu import LLM, SamplingParams

    prompt = np.random.default_rng(13).integers(1, V, size=28).tolist()

    def gen(path, **kw):
        llm = LLM(model=path, dtype="float32", **kw)
        out = llm.generate(
            [{"prompt_token_ids": prompt}],
            SamplingParams(max_tokens=6, temperature=0.0),
        )
        return list(out[0].outputs[0].token_ids)

    a = gen(str(tmp_path / "ct"))
    b = gen(str(tmp_path / "dense"), quantization="fp8")
    assert a and a == b
