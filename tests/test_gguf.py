"""GGUF checkpoint support: block dequant math (validated against scalar
reference implementations of the ggml layouts), file round-trip, config
mapping, and e2e greedy generate from a .gguf llama checkpoint (the
reference's gguf quantization support, csrc/quantization/gguf/)."""

import struct

import numpy as np
import pytest

from vllm_metax_tpu.weights import gguf as G


# ---------------------------------------------------------------------------
# minimal GGUF writer (test-only)


def _w_str(s):
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _w_kv(key, val):
    out = _w_str(key)
    if isinstance(val, bool):
        out += struct.pack("<IB", 7, val)
    elif isinstance(val, int):
        out += struct.pack("<Iq", 11, val)
    elif isinstance(val, float):
        out += struct.pack("<If", 6, val)
    elif isinstance(val, str):
        out += struct.pack("<I", 8) + _w_str(val)
    else:
        raise TypeError(val)
    return out


def write_gguf(path, metadata: dict, tensors: dict):
    """tensors: name → (ggml_type, np_shape, block_bytes)."""
    infos = b""
    data = b""
    align = 32
    for name, (ttype, shape, raw) in tensors.items():
        off = len(data)
        dims = tuple(reversed(shape))  # ggml ne order
        infos += (
            _w_str(name)
            + struct.pack("<I", len(dims))
            + struct.pack(f"<{len(dims)}Q", *dims)
            + struct.pack("<IQ", ttype, off)
        )
        data += raw
        pad = (-len(data)) % align
        data += b"\0" * pad
    header = struct.pack("<IIQQ", G.GGUF_MAGIC, 3, len(tensors), len(metadata))
    kv = b"".join(_w_kv(k, v) for k, v in metadata.items())
    pre = header + kv + infos
    pad = (-len(pre)) % align
    with open(path, "wb") as f:
        f.write(pre + b"\0" * pad + data)


# test-side quantizers (round-to-nearest; any valid (scale, q) encoding is
# a correct round-trip target for the reader)


def quant_q8_0(x):
    x = x.reshape(-1, 32)
    d = np.abs(x).max(axis=1) / 127.0
    d[d == 0] = 1.0
    q = np.clip(np.round(x / d[:, None]), -128, 127).astype(np.int8)
    out = b""
    for i in range(x.shape[0]):
        out += np.float16(d[i]).tobytes() + q[i].tobytes()
    return out, (x.reshape(-1) // 1, d, q)


def dequant_ref_q8_0(raw, n):
    out = np.empty(n, np.float32)
    for i in range(n // 32):
        blk = raw[i * 34 : (i + 1) * 34]
        d = np.frombuffer(blk[:2], np.float16)[0]
        q = np.frombuffer(blk[2:], np.int8)
        out[i * 32 : (i + 1) * 32] = np.float32(d) * q
    return out


def quant_q4_0(x):
    x = x.reshape(-1, 32)
    amax_idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), amax_idx]
    d = maxv / -8.0
    d[d == 0] = 1.0
    q = np.clip(np.round(x / d[:, None]) + 8, 0, 15).astype(np.uint8)
    out = b""
    for i in range(x.shape[0]):
        packed = (q[i, :16] | (q[i, 16:] << 4)).astype(np.uint8)
        out += np.float16(d[i]).tobytes() + packed.tobytes()
    return out


def dequant_ref_q4_0(raw, n):
    out = np.empty(n, np.float32)
    for i in range(n // 32):
        blk = raw[i * 18 : (i + 1) * 18]
        d = np.float32(np.frombuffer(blk[:2], np.float16)[0])
        qs = np.frombuffer(blk[2:], np.uint8)
        for j in range(16):
            out[i * 32 + j] = d * ((qs[j] & 0xF) - 8.0)
            out[i * 32 + 16 + j] = d * ((qs[j] >> 4) - 8.0)
    return out


def test_q8_0_and_q4_0_dequant():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(256).astype(np.float32)
    raw, _ = quant_q8_0(x)
    np.testing.assert_allclose(
        G._dequant(G.Q8_0, raw, 256), dequant_ref_q8_0(raw, 256), rtol=0
    )
    raw4 = quant_q4_0(x)
    np.testing.assert_allclose(
        G._dequant(G.Q4_0, raw4, 256), dequant_ref_q4_0(raw4, 256), rtol=0
    )


def test_q5_0_dequant_scalar_ref():
    """Synthetic Q5_0 blocks vs a scalar reference of the ggml layout."""
    rng = np.random.default_rng(1)
    nb = 4
    raw = b""
    for _ in range(nb):
        d = np.float16(rng.uniform(0.01, 0.1))
        q = rng.integers(0, 32, 32).astype(np.uint8)
        qh = 0
        for j in range(32):
            qh |= int(q[j] >> 4) << j
        qs = ((q[:16] & 0xF) | ((q[16:] & 0xF) << 4)).astype(np.uint8)
        raw += d.tobytes() + struct.pack("<I", qh) + qs.tobytes()
        # scalar expectation for this block
    got = G._dequant(G.Q5_0, raw, nb * 32)
    # recompute scalar
    exp = np.empty(nb * 32, np.float32)
    for i in range(nb):
        blk = raw[i * 22 : (i + 1) * 22]
        d = np.float32(np.frombuffer(blk[:2], np.float16)[0])
        qh = struct.unpack("<I", blk[2:6])[0]
        qs = np.frombuffer(blk[6:], np.uint8)
        for j in range(32):
            lo = qs[j % 16] & 0xF if j < 16 else qs[j - 16] >> 4
            q = lo | (((qh >> j) & 1) << 4)
            exp[i * 32 + j] = d * (q - 16.0)
    np.testing.assert_allclose(got, exp)


def test_q4_k_q6_k_dequant_scalar_ref():
    """Synthetic K-quant superblocks vs scalar references of the ggml
    layouts (ggml-quants.c dequantize_row_q4_K / q6_K)."""
    rng = np.random.default_rng(2)
    # --- Q4_K
    nb = 2
    raw = b""
    for _ in range(nb):
        d, dmin = np.float16(0.05), np.float16(0.02)
        sc = rng.integers(0, 64, 8).astype(np.uint8)
        mn = rng.integers(0, 64, 8).astype(np.uint8)
        scales = np.zeros(12, np.uint8)
        for j in range(4):
            scales[j] = sc[j] | ((sc[j + 4] >> 4) << 6)
            scales[j + 4] = mn[j] | ((mn[j + 4] >> 4) << 6)
            scales[j + 8] = (sc[j + 4] & 0xF) | ((mn[j + 4] & 0xF) << 4)
        qs = rng.integers(0, 256, 128).astype(np.uint8)
        raw += d.tobytes() + dmin.tobytes() + scales.tobytes() + qs.tobytes()
    got = G._dequant(G.Q4_K, raw, nb * 256)
    exp = np.empty(nb * 256, np.float32)
    for i in range(nb):
        blk = raw[i * 144 : (i + 1) * 144]
        d = np.float32(np.frombuffer(blk[0:2], np.float16)[0])
        dmin = np.float32(np.frombuffer(blk[2:4], np.float16)[0])
        scales = np.frombuffer(blk[4:16], np.uint8)
        qs = np.frombuffer(blk[16:144], np.uint8)
        sc = np.empty(8)
        mn = np.empty(8)
        for j in range(8):
            if j < 4:
                sc[j] = scales[j] & 63
                mn[j] = scales[j + 4] & 63
            else:
                sc[j] = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4)
                mn[j] = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
        for j in range(4):
            chunk = qs[32 * j : 32 * (j + 1)]
            for l in range(32):
                c = int(chunk[l])
                exp[i * 256 + 64 * j + l] = (
                    d * sc[2 * j] * (c & 0xF) - dmin * mn[2 * j]
                )
                exp[i * 256 + 64 * j + 32 + l] = (
                    d * sc[2 * j + 1] * (c >> 4) - dmin * mn[2 * j + 1]
                )
    np.testing.assert_allclose(got, exp, rtol=1e-6)

    # --- Q6_K
    raw = b""
    for _ in range(nb):
        ql = rng.integers(0, 256, 128).astype(np.uint8)
        qh = rng.integers(0, 256, 64).astype(np.uint8)
        scs = rng.integers(-32, 32, 16).astype(np.int8)
        d = np.float16(0.03)
        raw += ql.tobytes() + qh.tobytes() + scs.tobytes() + d.tobytes()
    got = G._dequant(G.Q6_K, raw, nb * 256)
    exp = np.empty(nb * 256, np.float32)
    for i in range(nb):
        blk = raw[i * 210 : (i + 1) * 210]
        ql = np.frombuffer(blk[0:128], np.uint8)
        qh = np.frombuffer(blk[128:192], np.uint8)
        scs = np.frombuffer(blk[192:208], np.int8)
        d = np.float32(np.frombuffer(blk[208:210], np.float16)[0])
        y = np.empty(256, np.float32)
        for half in range(2):
            lq = ql[64 * half : 64 * half + 64]
            hq = qh[32 * half : 32 * half + 32]
            sc = scs[8 * half : 8 * half + 8]
            for l in range(32):
                is_ = l // 16
                lql, lqh, h = int(lq[l]), int(lq[l + 32]), int(hq[l])
                q1 = ((lql & 0xF) | (((h >> 0) & 3) << 4)) - 32
                q2 = ((lqh & 0xF) | (((h >> 2) & 3) << 4)) - 32
                q3 = ((lql >> 4) | (((h >> 4) & 3) << 4)) - 32
                q4 = ((lqh >> 4) | (((h >> 6) & 3) << 4)) - 32
                y[128 * half + l] = d * sc[is_] * q1
                y[128 * half + l + 32] = d * sc[is_ + 2] * q2
                y[128 * half + l + 64] = d * sc[is_ + 4] * q3
                y[128 * half + l + 96] = d * sc[is_ + 6] * q4
        exp[i * 256 : (i + 1) * 256] = y
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_file_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((8, 64)).astype(np.float32)
    b = rng.standard_normal((4, 32)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    write_gguf(
        path,
        {"general.architecture": "llama", "llama.block_count": 1},
        {
            "a.weight": (G.F32, a.shape, a.tobytes()),
            "b.weight": (G.Q8_0, b.shape, quant_q8_0(b)[0]),
        },
    )
    g = G.GGUFFile(path)
    assert g.metadata["general.architecture"] == "llama"
    np.testing.assert_array_equal(g.get("a.weight"), a)
    got = g.get("b.weight")
    assert got.shape == b.shape
    np.testing.assert_allclose(got, b, atol=0.05)


@pytest.fixture(scope="module")
def gguf_llama(tmp_path_factory):
    """Tiny llama: HF fp32 model + a GGUF file carrying the SAME weights
    (linears Q8_0-quantized; the HF model is rebuilt from the dequantized
    tensors so greedy outputs must match exactly)."""
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    hf = transformers.LlamaForCausalLM(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    def blk(i, stem):
        return f"blk.{i}.{stem}.weight"

    tensors = {}
    hf_to_g = {
        "model.embed_tokens.weight": "token_embd.weight",
        "model.norm.weight": "output_norm.weight",
        "lm_head.weight": "output.weight",
    }
    for i in range(2):
        pre = f"model.layers.{i}."
        hf_to_g.update({
            pre + "self_attn.q_proj.weight": blk(i, "attn_q"),
            pre + "self_attn.k_proj.weight": blk(i, "attn_k"),
            pre + "self_attn.v_proj.weight": blk(i, "attn_v"),
            pre + "self_attn.o_proj.weight": blk(i, "attn_output"),
            pre + "mlp.gate_proj.weight": blk(i, "ffn_gate"),
            pre + "mlp.up_proj.weight": blk(i, "ffn_up"),
            pre + "mlp.down_proj.weight": blk(i, "ffn_down"),
            pre + "input_layernorm.weight": blk(i, "attn_norm"),
            pre + "post_attention_layernorm.weight": blk(i, "ffn_norm"),
        })
    new_sd = {}
    for hname, gname in hf_to_g.items():
        w = sd[hname]
        if "norm" in gname or gname == "token_embd.weight":
            tensors[gname] = (G.F32, w.shape, np.ascontiguousarray(w).tobytes())
            new_sd[hname] = w
        else:
            raw, _ = quant_q8_0(w)
            tensors[gname] = (G.Q8_0, w.shape, raw)
            new_sd[hname] = dequant_ref_q8_0(raw, w.size).reshape(w.shape)
    import torch as T

    hf.load_state_dict({k: T.tensor(v) for k, v in new_sd.items()})
    path = str(tmp_path_factory.mktemp("gguf") / "tiny-llama-q8.gguf")
    write_gguf(
        path,
        {
            "general.architecture": "llama",
            "llama.embedding_length": 64,
            "llama.block_count": 2,
            "llama.feed_forward_length": 128,
            "llama.attention.head_count": 4,
            "llama.attention.head_count_kv": 2,
            "llama.context_length": 512,
            "llama.attention.layer_norm_rms_epsilon": 1e-5,
            "llama.rope.freq_base": 10000.0,
            "llama.vocab_size": 256,
        },
        tensors,
    )
    return hf, path


def test_config_from_gguf(gguf_llama):
    _, path = gguf_llama
    from vllm_metax_tpu.config import ModelConfig

    cfg = ModelConfig.from_pretrained(path, dtype="float32")
    assert cfg.architecture == "LlamaForCausalLM"
    assert cfg.hidden_size == 64 and cfg.num_hidden_layers == 2
    assert cfg.num_kv_heads == 2 and cfg.vocab_size == 256
    assert not cfg.tie_word_embeddings


def test_gguf_e2e_greedy(gguf_llama):
    import torch

    from vllm_metax_tpu import LLM, SamplingParams

    hf, path = gguf_llama
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 256, size=11).tolist()
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(prompt)[None], max_new_tokens=10, do_sample=False
        )[0, len(prompt):].tolist()
    llm = LLM(
        model=path,
        dtype="float32",
        num_kv_blocks=64,
        max_num_seqs=4,
        max_num_batched_tokens=64,
    )
    out = llm.generate(
        prompt_token_ids=[prompt], sampling_params=SamplingParams(
            max_tokens=10, temperature=0.0
        )
    )
    assert out[0].outputs[0].token_ids == ref


def test_unsupported_quant_type_raises(tmp_path):
    path = str(tmp_path / "bad.gguf")
    iq2_xxs = 16  # IQ codebook types remain unsupported
    write_gguf(
        path,
        {"general.architecture": "llama"},
        {"x.weight": (iq2_xxs, (256,), b"\0" * 66)},
    )
    g = G.GGUFFile(path)
    with pytest.raises(NotImplementedError, match="IQ2_XXS|16"):
        g.get("x.weight")


def test_parser_robust_to_garbage(tmp_path):
    """The GGUF parser handles hostile/truncated files with clean errors
    (checkpoint paths are untrusted input)."""
    rng = np.random.default_rng(7)
    # valid header magic but garbage body, truncations, huge counts
    cases = [
        b"",
        b"GG",
        b"GGUF",
        struct.pack("<IIQQ", G.GGUF_MAGIC, 3, 1, 1),  # truncated kv
        struct.pack("<IIQQ", G.GGUF_MAGIC, 99, 0, 0),  # bad version
        struct.pack("<IIQQ", G.GGUF_MAGIC, 3, 0, 1)
        + struct.pack("<Q", 1 << 40),  # absurd string length
        rng.bytes(256),
    ]
    for i, blob in enumerate(cases):
        p = tmp_path / f"bad{i}.gguf"
        p.write_bytes(blob)
        with pytest.raises((ValueError, EOFError, OSError, struct.error,
                            UnicodeDecodeError, MemoryError)):
            G.GGUFFile(str(p))


def test_q2_k_dequant_scalar_ref():
    """Synthetic Q2_K superblocks vs a scalar reference of the ggml layout
    (ggml-quants.c dequantize_row_q2_K)."""
    import struct

    import vllm_metax_tpu.weights.gguf as G

    rng = np.random.default_rng(5)
    nb = 3
    raw = b""
    for _ in range(nb):
        scales = rng.integers(0, 256, 16).astype(np.uint8)
        qs = rng.integers(0, 256, 64).astype(np.uint8)
        d, dmin = np.float16(0.03), np.float16(0.01)
        raw += scales.tobytes() + qs.tobytes() + d.tobytes() + dmin.tobytes()
    got = G._dequant(G.Q2_K, raw, nb * 256)
    exp = np.empty(nb * 256, np.float32)
    for i in range(nb):
        blk = raw[i * 84 : (i + 1) * 84]
        scales = np.frombuffer(blk[:16], np.uint8)
        qs = np.frombuffer(blk[16:80], np.uint8)
        d = np.float32(np.frombuffer(blk[80:82], np.float16)[0])
        dmin = np.float32(np.frombuffer(blk[82:84], np.float16)[0])
        y = 0
        is_ = 0
        for j in (0, 128):  # two halves, each from a 32-byte q chunk
            shift = 0
            q = qs[j // 4 : j // 4 + 32]
            for _k in range(4):
                for sub in range(2):
                    s = scales[is_]
                    is_ += 1
                    dl = d * (s & 0xF)
                    ml = dmin * (s >> 4)
                    for l in range(16):
                        exp[i * 256 + y] = (
                            dl * ((q[16 * sub + l] >> shift) & 3) - ml
                        )
                        y += 1
                shift += 2
    np.testing.assert_allclose(got, exp)


def test_q3_k_dequant_scalar_ref():
    """Synthetic Q3_K superblocks vs a scalar reference of the ggml layout
    (ggml-quants.c dequantize_row_q3_K)."""
    import vllm_metax_tpu.weights.gguf as G

    rng = np.random.default_rng(6)
    nb = 3
    raw = b""
    for _ in range(nb):
        hmask = rng.integers(0, 256, 32).astype(np.uint8)
        qs = rng.integers(0, 256, 64).astype(np.uint8)
        scales = rng.integers(0, 256, 12).astype(np.uint8)
        d = np.float16(0.04)
        raw += hmask.tobytes() + qs.tobytes() + scales.tobytes() + d.tobytes()
    got = G._dequant(G.Q3_K, raw, nb * 256)
    exp = np.empty(nb * 256, np.float32)
    km1, km2 = 0x03030303, 0x0F0F0F0F
    for i in range(nb):
        blk = raw[i * 110 : (i + 1) * 110]
        hmask = np.frombuffer(blk[:32], np.uint8)
        qs = np.frombuffer(blk[32:96], np.uint8)
        aux = list(np.frombuffer(blk[96:108], np.uint32))
        d = np.float32(np.frombuffer(blk[108:110], np.float16)[0])
        tmp = aux[2]
        a = [
            (aux[0] & km2) | (((tmp >> 0) & km1) << 4),
            (aux[1] & km2) | (((tmp >> 2) & km1) << 4),
            ((aux[0] >> 4) & km2) | (((tmp >> 4) & km1) << 4),
            ((aux[1] >> 4) & km2) | (((tmp >> 6) & km1) << 4),
        ]
        sc16 = (
            np.array(a, np.uint32).view(np.uint8).view(np.int8).astype(
                np.float32
            )
            - 32.0
        )
        y = 0
        is_ = 0
        m = 1
        for j in (0, 128):
            shift = 0
            q = qs[j // 4 : j // 4 + 32]
            hm = hmask
            for _k in range(4):
                for sub in range(2):
                    dl = d * sc16[is_]
                    is_ += 1
                    for l in range(16):
                        ll = 16 * sub + l
                        hb = 0 if (hm[ll] & m) else -4
                        exp[i * 256 + y] = dl * (
                            int((q[ll] >> shift) & 3) + hb
                        )
                        y += 1
                shift += 2
                m <<= 1
    np.testing.assert_allclose(got, exp)


def test_q5_k_dequant_scalar_ref():
    """Synthetic Q5_K superblocks vs a scalar reference of the ggml layout
    (ggml-quants.c dequantize_row_q5_K)."""
    import vllm_metax_tpu.weights.gguf as G

    rng = np.random.default_rng(7)
    nb = 2
    raw = b""
    for _ in range(nb):
        d, dmin = np.float16(0.05), np.float16(0.02)
        sc = rng.integers(0, 64, 8).astype(np.uint8)
        mn = rng.integers(0, 64, 8).astype(np.uint8)
        scales = np.zeros(12, np.uint8)
        for j in range(4):
            scales[j] = sc[j] | ((sc[j + 4] >> 4) << 6)
            scales[j + 4] = mn[j] | ((mn[j + 4] >> 4) << 6)
            scales[j + 8] = (sc[j + 4] & 0xF) | ((mn[j + 4] & 0xF) << 4)
        qh = rng.integers(0, 256, 32).astype(np.uint8)
        qs = rng.integers(0, 256, 128).astype(np.uint8)
        raw += (
            d.tobytes() + dmin.tobytes() + scales.tobytes() + qh.tobytes()
            + qs.tobytes()
        )
    got = G._dequant(G.Q5_K, raw, nb * 256)
    exp = np.empty(nb * 256, np.float32)
    for i in range(nb):
        blk = raw[i * 176 : (i + 1) * 176]
        d = np.float32(np.frombuffer(blk[0:2], np.float16)[0])
        dmin = np.float32(np.frombuffer(blk[2:4], np.float16)[0])
        scales = np.frombuffer(blk[4:16], np.uint8)
        qh = np.frombuffer(blk[16:48], np.uint8)
        qs = np.frombuffer(blk[48:176], np.uint8)
        # 6-bit (sc, mn) pairs, Q4_K packing
        sc = np.empty(8, np.float32)
        mn = np.empty(8, np.float32)
        for j in range(4):
            sc[j] = scales[j] & 63
            mn[j] = scales[j + 4] & 63
        for j in range(4, 8):
            sc[j] = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4)
            mn[j] = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
        y = 0
        u1, u2 = 1, 2
        for j in range(4):
            ql = qs[32 * j : 32 * (j + 1)]
            for l in range(32):
                exp[i * 256 + y + l] = (
                    d * sc[2 * j] * ((ql[l] & 0xF) + (16 if qh[l] & u1 else 0))
                    - dmin * mn[2 * j]
                )
                exp[i * 256 + y + 32 + l] = (
                    d
                    * sc[2 * j + 1]
                    * ((ql[l] >> 4) + (16 if qh[l] & u2 else 0))
                    - dmin * mn[2 * j + 1]
                )
            y += 64
            u1 <<= 2
            u2 <<= 2
    np.testing.assert_allclose(got, exp)


def test_iq4_dequant_scalar_ref():
    """IQ4_NL / IQ4_XS: vectorized loader vs scalar per-value reference
    (ggml-quants.c dequantize_row_iq4_nl / _xs semantics)."""
    rng = np.random.default_rng(3)
    lut = np.asarray(G._IQ4_LUT, np.float32)

    # --- IQ4_NL: 2 blocks of 32 ---
    nb = 2
    raw = bytearray()
    for b in range(nb):
        d = np.float16(rng.uniform(0.01, 0.1))
        raw += d.tobytes()
        qs = rng.integers(0, 16, size=32)
        for i in range(16):
            raw += bytes([int(qs[i]) | (int(qs[i + 16]) << 4)])
    raw = bytes(raw)

    def ref_nl(raw, n):
        out = np.zeros(n, np.float32)
        for b in range(n // 32):
            blk = raw[b * 18 : (b + 1) * 18]
            d = np.frombuffer(blk[:2], np.float16)[0].astype(np.float32)
            for i in range(16):
                byte = blk[2 + i]
                out[b * 32 + i] = d * lut[byte & 0xF]
                out[b * 32 + 16 + i] = d * lut[byte >> 4]
        return out

    np.testing.assert_allclose(
        G._dequant(G.IQ4_NL, raw, nb * 32), ref_nl(raw, nb * 32), rtol=0
    )

    # --- IQ4_XS: 2 super-blocks of 256 ---
    nb = 2
    raw = bytearray()
    metas = []
    for b in range(nb):
        d = np.float16(rng.uniform(0.01, 0.1))
        ls = rng.integers(0, 64, size=8)  # 6-bit sub-scales
        qs = rng.integers(0, 16, size=256)
        scales_h = 0
        scales_l = []
        for j in range(8):
            scales_h |= ((int(ls[j]) >> 4) & 0x3) << (2 * j)
        for j in range(4):
            scales_l.append(
                (int(ls[2 * j]) & 0xF) | ((int(ls[2 * j + 1]) & 0xF) << 4)
            )
        raw += d.tobytes()
        raw += int(scales_h).to_bytes(2, "little")
        raw += bytes(scales_l)
        for j in range(8):
            for i in range(16):
                raw += bytes([
                    int(qs[32 * j + i]) | (int(qs[32 * j + 16 + i]) << 4)
                ])
        metas.append((float(d), ls, qs))
    raw = bytes(raw)

    def ref_xs(metas, n):
        out = np.zeros(n, np.float32)
        for b, (d, ls, qs) in enumerate(metas):
            for j in range(8):
                scale = d * (float(ls[j]) - 32.0)
                for i in range(32):
                    out[b * 256 + 32 * j + i] = scale * lut[qs[32 * j + i]]
        return out

    np.testing.assert_allclose(
        G._dequant(G.IQ4_XS, raw, nb * 256), ref_xs(metas, nb * 256),
        rtol=0, atol=1e-6,
    )
