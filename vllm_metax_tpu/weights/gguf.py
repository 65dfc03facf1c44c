"""Native GGUF checkpoint support (reader + dequantization).

The reference ships a CUDA ggml kernel zoo (csrc/quantization/gguf/, 5.7k
LoC: dequant/matvec/matmul for Q2_K…Q8_0) and lists "gguf" in
supported_quantization (vllm_metax/platform.py:59-66). The TPU-native
shape is different: GGUF blocks are DEQUANTIZED AT LOAD (numpy, vectorized
per format below) into the dense bf16 params — and can then be
re-quantized into the canonical packed-int4/int8 runtime layout by the
standard on-the-fly quantize path, so the serving-time GEMMs are the same
Pallas kernels as GPTQ/AWQ (ops/pallas/quant_matmul.py). No per-format
runtime kernels needed.

File format: https://github.com/ggml-org/ggml/blob/master/docs/gguf.md
(GGUF v2/v3); block layouts follow ggml-quants.c reference dequant rows.
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian

# metadata value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32, _T_F32, _T_BOOL = range(8)
_T_STRING, _T_ARRAY, _T_U64, _T_I64, _T_F64 = range(8, 13)
_SCALAR_FMT = {
    _T_U8: "<B", _T_I8: "<b", _T_U16: "<H", _T_I16: "<h",
    _T_U32: "<I", _T_I32: "<i", _T_F32: "<f", _T_BOOL: "<B",
    _T_U64: "<Q", _T_I64: "<q", _T_F64: "<d",
}

# ggml tensor dtypes (ggml.h enum ggml_type)
F32, F16 = 0, 1
Q4_0, Q4_1, Q5_0, Q5_1, Q8_0 = 2, 3, 6, 7, 8
Q2_K, Q3_K, Q4_K, Q5_K, Q6_K = 10, 11, 12, 13, 14
IQ4_NL, IQ4_XS = 20, 23
BF16 = 30

# IQ4 nonlinear 4-bit codebook (ggml-quants.c kvalues_iq4nl)
_IQ4_LUT = [
    -127, -104, -83, -65, -49, -35, -22, -10,
    1, 13, 25, 38, 53, 69, 89, 113,
]

# (block_size_in_values, block_size_in_bytes)
BLOCK_INFO = {
    F32: (1, 4),
    F16: (1, 2),
    BF16: (1, 2),
    Q4_0: (32, 18),
    Q4_1: (32, 20),
    Q5_0: (32, 22),
    Q2_K: (256, 84),
    Q3_K: (256, 110),
    Q5_K: (256, 176),
    Q5_1: (32, 24),
    Q8_0: (32, 34),
    Q4_K: (256, 144),
    Q6_K: (256, 210),
    IQ4_NL: (32, 18),
    IQ4_XS: (256, 136),
}

TYPE_NAMES = {
    F32: "F32", F16: "F16", BF16: "BF16", Q4_0: "Q4_0", Q4_1: "Q4_1",
    Q5_0: "Q5_0", Q5_1: "Q5_1", Q8_0: "Q8_0", Q2_K: "Q2_K", Q3_K: "Q3_K",
    Q4_K: "Q4_K", Q5_K: "Q5_K", Q6_K: "Q6_K",
    IQ4_NL: "IQ4_NL", IQ4_XS: "IQ4_XS",
}


def _read_str(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8")


def _read_value(f: BinaryIO, vtype: int) -> Any:
    if vtype in _SCALAR_FMT:
        fmt = _SCALAR_FMT[vtype]
        (v,) = struct.unpack(fmt, f.read(struct.calcsize(fmt)))
        return bool(v) if vtype == _T_BOOL else v
    if vtype == _T_STRING:
        return _read_str(f)
    if vtype == _T_ARRAY:
        (etype,) = struct.unpack("<I", f.read(4))
        (n,) = struct.unpack("<Q", f.read(8))
        return [_read_value(f, etype) for _ in range(n)]
    raise ValueError(f"unknown GGUF metadata type {vtype}")


def _f16(buf: np.ndarray) -> np.ndarray:
    return buf.view(np.float16).astype(np.float32)


def _dequant(ggml_type: int, raw: bytes, n: int) -> np.ndarray:
    """Dequantize `n` values from ggml block data → float32 (ggml-quants.c
    dequantize_row_* reference layouts)."""
    if ggml_type == F32:
        return np.frombuffer(raw, np.float32, n).copy()
    if ggml_type == F16:
        return np.frombuffer(raw, np.float16, n).astype(np.float32)
    if ggml_type == BF16:
        u = np.frombuffer(raw, np.uint16, n).astype(np.uint32) << 16
        return u.view(np.float32)

    if ggml_type not in BLOCK_INFO:
        raise NotImplementedError(
            f"GGUF tensor type {TYPE_NAMES.get(ggml_type, ggml_type)} is "
            f"not supported yet (supported: "
            f"{sorted(TYPE_NAMES[t] for t in BLOCK_INFO)})"
        )
    bvals, bbytes = BLOCK_INFO[ggml_type]
    nb = n // bvals
    b = np.frombuffer(raw, np.uint8, nb * bbytes).reshape(nb, bbytes)

    if ggml_type == Q8_0:
        d = _f16(b[:, :2].reshape(-1))[:, None]
        q = b[:, 2:34].view(np.int8).astype(np.float32)
        return (d * q).reshape(-1)

    if ggml_type in (Q4_0, Q4_1):
        hdr = 4 if ggml_type == Q4_1 else 2
        qs = b[:, hdr : hdr + 16]
        lo = (qs & 0xF).astype(np.float32)
        hi = (qs >> 4).astype(np.float32)
        q = np.concatenate([lo, hi], axis=1)  # value j | j+16
        d = _f16(b[:, :2].reshape(-1))[:, None]
        if ggml_type == Q4_0:
            return (d * (q - 8.0)).reshape(-1)
        m = _f16(b[:, 2:4].reshape(-1))[:, None]
        return (d * q + m).reshape(-1)

    if ggml_type in (Q5_0, Q5_1):
        hdr = 4 if ggml_type == Q5_1 else 2
        qh = b[:, hdr : hdr + 4].copy().view(np.uint32).reshape(-1)  # (nb,)
        qs = b[:, hdr + 4 : hdr + 20]
        lo = (qs & 0xF).astype(np.uint8)
        hi = (qs >> 4).astype(np.uint8)
        bit = (
            (qh[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
        ).astype(np.uint8)  # bit j = 5th bit of value j
        q = np.concatenate([lo, hi], axis=1) | (bit << 4)
        q = q.astype(np.float32)
        d = _f16(b[:, :2].reshape(-1))[:, None]
        if ggml_type == Q5_0:
            return (d * (q - 16.0)).reshape(-1)
        m = _f16(b[:, 2:4].reshape(-1))[:, None]
        return (d * q + m).reshape(-1)

    if ggml_type == Q4_K:
        d = _f16(b[:, 0:2].reshape(-1))[:, None]
        dmin = _f16(b[:, 2:4].reshape(-1))[:, None]
        sc_b = b[:, 4:16].astype(np.uint16)  # 12 bytes → 8 (sc, m) 6-bit pairs
        sc = np.empty((nb, 8), np.float32)
        mn = np.empty((nb, 8), np.float32)
        for j in range(4):
            sc[:, j] = (sc_b[:, j] & 63).astype(np.float32)
            mn[:, j] = (sc_b[:, j + 4] & 63).astype(np.float32)
        for j in range(4, 8):
            sc[:, j] = (
                (sc_b[:, j + 4] & 0xF) | ((sc_b[:, j - 4] >> 6) << 4)
            ).astype(np.float32)
            mn[:, j] = (
                (sc_b[:, j + 4] >> 4) | ((sc_b[:, j] >> 6) << 4)
            ).astype(np.float32)
        qs = b[:, 16:144]
        out = np.empty((nb, 256), np.float32)
        for j in range(4):  # each 32-byte chunk → two 32-value sub-blocks
            chunk = qs[:, 32 * j : 32 * (j + 1)]
            out[:, 64 * j : 64 * j + 32] = (
                d * sc[:, 2 * j : 2 * j + 1] * (chunk & 0xF)
                - dmin * mn[:, 2 * j : 2 * j + 1]
            )
            out[:, 64 * j + 32 : 64 * j + 64] = (
                d * sc[:, 2 * j + 1 : 2 * j + 2] * (chunk >> 4)
                - dmin * mn[:, 2 * j + 1 : 2 * j + 2]
            )
        return out.reshape(-1)

    if ggml_type == Q2_K:
        # block_q2_K: scales[16] (4-bit sc | 4-bit min), qs[64] (2-bit),
        # d, dmin (ggml-quants.c dequantize_row_q2_K). Value v of 256:
        # q byte qs[32*(v//128) + v%32], plane shift 2*((v%128)//32);
        # scale byte v//16.
        scales8 = b[:, :16]
        qs = b[:, 16:80]
        d = _f16(b[:, 80:82].reshape(-1))[:, None]
        dmin = _f16(b[:, 82:84].reshape(-1))[:, None]
        out = np.empty((nb, 256), np.float32)
        for half in range(2):
            q = qs[:, 32 * half : 32 * half + 32]
            for plane in range(4):
                vals = ((q >> (2 * plane)) & 3).astype(np.float32)
                v0 = half * 128 + plane * 32
                for sub in range(2):
                    sc = scales8[:, v0 // 16 + sub]
                    out[:, v0 + 16 * sub : v0 + 16 * (sub + 1)] = (
                        d * (sc & 0xF)[:, None] * vals[:, 16 * sub : 16 * (sub + 1)]
                        - dmin * (sc >> 4)[:, None]
                    )
        return out.reshape(-1)

    if ggml_type == Q3_K:
        # block_q3_K: hmask[32], qs[64] (2-bit), scales[12] (16 packed
        # 6-bit signed, -32 offset), d. Value = dl * ((2bit | hbit<<2) - 4).
        hmask = b[:, :32]
        qs = b[:, 32:96]
        aux = b[:, 96:108].copy().view(np.uint32)  # (nb, 3)
        a0, a1, tmp = aux[:, 0], aux[:, 1], aux[:, 2]
        km1, km2 = np.uint32(0x03030303), np.uint32(0x0F0F0F0F)
        packed = np.stack(
            [
                (a0 & km2) | (((tmp >> 0) & km1) << 4),
                (a1 & km2) | (((tmp >> 2) & km1) << 4),
                ((a0 >> 4) & km2) | (((tmp >> 4) & km1) << 4),
                ((a1 >> 4) & km2) | (((tmp >> 6) & km1) << 4),
            ],
            axis=1,
        ).astype(np.uint32)
        sc16 = (
            packed.view(np.uint8).reshape(nb, 16).view(np.int8).astype(
                np.float32
            )
            - 32.0
        )
        d = _f16(b[:, 108:110].reshape(-1))[:, None]
        out = np.empty((nb, 256), np.float32)
        for half in range(2):
            q = qs[:, 32 * half : 32 * half + 32]
            for plane in range(4):
                bit = half * 4 + plane
                hb = ((hmask >> bit) & 1).astype(np.float32)  # (nb, 32)
                vals = ((q >> (2 * plane)) & 3).astype(np.float32)
                vals = vals + 4.0 * hb - 4.0
                v0 = half * 128 + plane * 32
                for sub in range(2):
                    dl = d[:, 0] * sc16[:, v0 // 16 + sub]
                    out[:, v0 + 16 * sub : v0 + 16 * (sub + 1)] = (
                        dl[:, None] * vals[:, 16 * sub : 16 * (sub + 1)]
                    )
        return out.reshape(-1)

    if ggml_type == Q5_K:
        # block_q5_K: d, dmin, scales[12] (Q4_K 6-bit sc/min packing),
        # qh[32] (5th bits), qs[128] (4-bit)
        d = _f16(b[:, 0:2].reshape(-1))[:, None]
        dmin = _f16(b[:, 2:4].reshape(-1))[:, None]
        sc_b = b[:, 4:16].astype(np.uint16)
        sc = np.empty((nb, 8), np.float32)
        mn = np.empty((nb, 8), np.float32)
        for j in range(4):
            sc[:, j] = (sc_b[:, j] & 63).astype(np.float32)
            mn[:, j] = (sc_b[:, j + 4] & 63).astype(np.float32)
        for j in range(4, 8):
            sc[:, j] = (
                (sc_b[:, j + 4] & 0xF) | ((sc_b[:, j - 4] >> 6) << 4)
            ).astype(np.float32)
            mn[:, j] = (
                (sc_b[:, j + 4] >> 4) | ((sc_b[:, j] >> 6) << 4)
            ).astype(np.float32)
        qh = b[:, 16:48]
        qs = b[:, 48:176]
        out = np.empty((nb, 256), np.float32)
        for j in range(4):
            ql = qs[:, 32 * j : 32 * (j + 1)]
            h1 = ((qh >> (2 * j)) & 1).astype(np.float32) * 16.0
            h2 = ((qh >> (2 * j + 1)) & 1).astype(np.float32) * 16.0
            out[:, 64 * j : 64 * j + 32] = (
                d * sc[:, 2 * j : 2 * j + 1] * ((ql & 0xF) + h1)
                - dmin * mn[:, 2 * j : 2 * j + 1]
            )
            out[:, 64 * j + 32 : 64 * j + 64] = (
                d * sc[:, 2 * j + 1 : 2 * j + 2] * ((ql >> 4) + h2)
                - dmin * mn[:, 2 * j + 1 : 2 * j + 2]
            )
        return out.reshape(-1)

    if ggml_type == Q6_K:
        ql = b[:, 0:128]
        qh = b[:, 128:192]
        sc = b[:, 192:208].view(np.int8).astype(np.float32)  # 16 int8 scales
        d = _f16(b[:, 208:210].reshape(-1))[:, None]
        out = np.empty((nb, 256), np.float32)
        for half in range(2):  # two independent 128-value halves
            lq = ql[:, 64 * half : 64 * (half + 1)]
            hq = qh[:, 32 * half : 32 * (half + 1)]
            so = 8 * half
            l32 = np.arange(32)
            is_ = so + l32 // 16  # scale index for rows 0..31
            q1 = ((lq[:, :32] & 0xF) | ((hq & 0x3) << 4)).astype(np.int32) - 32
            q2 = ((lq[:, 32:] & 0xF) | (((hq >> 2) & 0x3) << 4)).astype(np.int32) - 32
            q3 = ((lq[:, :32] >> 4) | (((hq >> 4) & 0x3) << 4)).astype(np.int32) - 32
            q4 = ((lq[:, 32:] >> 4) | (((hq >> 6) & 0x3) << 4)).astype(np.int32) - 32
            base = 128 * half
            out[:, base : base + 32] = d * sc[:, is_] * q1
            out[:, base + 32 : base + 64] = d * sc[:, is_ + 2] * q2
            out[:, base + 64 : base + 96] = d * sc[:, is_ + 4] * q3
            out[:, base + 96 : base + 128] = d * sc[:, is_ + 6] * q4
        return out.reshape(-1)

    if ggml_type == IQ4_NL:
        # block_iq4_nl: d (f16) + 16 nibble bytes; v = d * LUT[q]
        # (ggml-quants.c dequantize_row_iq4_nl)
        lut = np.asarray(_IQ4_LUT, np.float32)
        d = _f16(b[:, :2].reshape(-1))[:, None]
        qs = b[:, 2:18]
        out = np.empty((nb, 32), np.float32)
        out[:, :16] = d * lut[qs & 0xF]
        out[:, 16:] = d * lut[qs >> 4]
        return out.reshape(-1)

    if ggml_type == IQ4_XS:
        # block_iq4_xs: d (f16), scales_h (u16), scales_l[4], qs[128];
        # sub-block j of 8: ls = (scales_l nib j) | (((scales_h>>2j)&3)<<4),
        # v = d * (ls - 32) * LUT[q] (ggml-quants.c dequantize_row_iq4_xs)
        lut = np.asarray(_IQ4_LUT, np.float32)
        d = _f16(b[:, :2].reshape(-1))[:, None]
        scales_h = b[:, 2:4].copy().view("<u2").astype(np.uint32)  # (nb,1)
        scales_l = b[:, 4:8]
        qs = b[:, 8:136]
        out = np.empty((nb, 256), np.float32)
        for j in range(8):
            lo = (scales_l[:, j // 2] >> (4 * (j % 2))) & 0xF
            hi = (scales_h[:, 0] >> (2 * j)) & 0x3
            ls = (lo | (hi << 4)).astype(np.float32) - 32.0  # (nb,)
            chunk = qs[:, 16 * j : 16 * (j + 1)]
            sub = np.empty((nb, 32), np.float32)
            sub[:, :16] = lut[chunk & 0xF]
            sub[:, 16:] = lut[chunk >> 4]
            out[:, 32 * j : 32 * (j + 1)] = d * ls[:, None] * sub
        return out.reshape(-1)

    raise NotImplementedError(
        f"GGUF tensor type {TYPE_NAMES.get(ggml_type, ggml_type)} is not "
        f"supported yet (supported: {sorted(TYPE_NAMES[t] for t in BLOCK_INFO)})"
    )


class GGUFFile:
    """Parsed GGUF container: metadata dict + lazy dequantizing tensor get."""

    def __init__(self, path: str):
        self.path = path
        self.metadata: dict[str, Any] = {}
        self.tensors: dict[str, tuple[int, tuple[int, ...], int]] = {}
        with open(path, "rb") as f:
            magic, version = struct.unpack("<II", f.read(8))
            if magic != GGUF_MAGIC:
                raise ValueError(f"{path}: not a GGUF file")
            if version not in (2, 3):
                raise ValueError(f"{path}: unsupported GGUF version {version}")
            n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
            for _ in range(n_kv):
                key = _read_str(f)
                (vtype,) = struct.unpack("<I", f.read(4))
                self.metadata[key] = _read_value(f, vtype)
            for _ in range(n_tensors):
                name = _read_str(f)
                (nd,) = struct.unpack("<I", f.read(4))
                dims = struct.unpack(f"<{nd}Q", f.read(8 * nd))
                ttype, offset = struct.unpack("<IQ", f.read(12))
                # ggml dims: ne[0] is the contiguous axis → numpy shape is
                # reversed
                self.tensors[name] = (ttype, tuple(reversed(dims)), offset)
            align = int(self.metadata.get("general.alignment", 32))
            pos = f.tell()
            self._data_start = (pos + align - 1) // align * align

    def names(self) -> list[str]:
        return list(self.tensors)

    def has(self, name: str) -> bool:
        return name in self.tensors

    def get(self, name: str) -> np.ndarray:
        ttype, shape, offset = self.tensors[name]
        n = int(np.prod(shape))
        bvals, bbytes = BLOCK_INFO.get(ttype, (None, None))
        if bvals is None:
            # probe for a clean error on unsupported K-quants
            return _dequant(ttype, b"", n).reshape(shape)
        nbytes = n // bvals * bbytes
        with open(self.path, "rb") as f:
            f.seek(self._data_start + offset)
            raw = f.read(nbytes)
        return _dequant(ttype, raw, n).reshape(shape)


# ---------------------------------------------------------------------------
# llama-family name + config mapping (the arches the reference serves from
# GGUF are llama-likes; vLLM's gguf path does the same translation)

_NAME_MAP = [
    ("token_embd.weight", "model.embed_tokens.weight"),
    ("output_norm.weight", "model.norm.weight"),
    ("output.weight", "lm_head.weight"),
]
_BLK_MAP = {
    "attn_q": "self_attn.q_proj",
    "attn_k": "self_attn.k_proj",
    "attn_v": "self_attn.v_proj",
    "attn_output": "self_attn.o_proj",
    "ffn_gate": "mlp.gate_proj",
    "ffn_up": "mlp.up_proj",
    "ffn_down": "mlp.down_proj",
    "attn_norm": "input_layernorm",
    "ffn_norm": "post_attention_layernorm",
    "attn_q_norm": "self_attn.q_norm",
    "attn_k_norm": "self_attn.k_norm",
}


def gguf_to_hf_name(name: str) -> str:
    for g, h in _NAME_MAP:
        if name == g:
            return h
    if name.startswith("blk."):
        _, i, rest = name.split(".", 2)
        stem, _, suffix = rest.rpartition(".")
        if stem in _BLK_MAP:
            return f"model.layers.{i}.{_BLK_MAP[stem]}.{suffix}"
    return name


class GGUFCheckpointReader:
    """CheckpointReader-compatible view over a .gguf file with HF names."""

    def __init__(self, path: str):
        self.file = GGUFFile(path)
        self._hf_names = {
            gguf_to_hf_name(n): n for n in self.file.names()
        }
        # tied embeddings: GGUF may omit output.weight
        if "lm_head.weight" not in self._hf_names:
            self._hf_names["lm_head.weight"] = self._hf_names.get(
                "model.embed_tokens.weight"
            )

    def names(self) -> list[str]:
        return list(self._hf_names)

    def has(self, name: str) -> bool:
        return name in self._hf_names

    def get(self, name: str) -> np.ndarray:
        return self.file.get(self._hf_names[name])


_ARCH_MAP = {
    "llama": "LlamaForCausalLM",
    "qwen2": "Qwen2ForCausalLM",
    "qwen3": "Qwen3ForCausalLM",
    "mistral": "MistralForCausalLM",
    "gemma": "GemmaForCausalLM",
    "gemma2": "Gemma2ForCausalLM",
    "gpt2": "GPT2LMHeadModel",
}


def config_from_gguf(path: str) -> dict:
    """Build an HF-style config dict from GGUF metadata keys."""
    g = GGUFFile(path)
    md = g.metadata
    arch = md.get("general.architecture", "llama")
    if arch not in _ARCH_MAP:
        raise ValueError(f"unsupported GGUF architecture {arch!r}")

    def k(name, default=None):
        return md.get(f"{arch}.{name}", default)

    heads = int(k("attention.head_count"))
    embd = int(k("embedding_length"))
    vocab = md.get(f"{arch}.vocab_size")
    if vocab is None:
        # derive from the embedding tensor
        vocab = g.tensors["token_embd.weight"][1][0]
    cfg = {
        "architectures": [_ARCH_MAP[arch]],
        "hidden_size": embd,
        "intermediate_size": int(k("feed_forward_length", 4 * embd)),
        "num_hidden_layers": int(k("block_count")),
        "num_attention_heads": heads,
        "num_key_value_heads": int(k("attention.head_count_kv", heads)),
        "vocab_size": int(vocab),
        "max_position_embeddings": int(k("context_length", 4096)),
        "rms_norm_eps": float(k("attention.layer_norm_rms_epsilon", 1e-5)),
        "rope_theta": float(k("rope.freq_base", 10000.0)),
        "tie_word_embeddings": not g.has("output.weight"),
        "torch_dtype": "bfloat16",
    }
    if k("attention.key_length"):
        cfg["head_dim"] = int(k("attention.key_length"))
    if k("rope.scaling.type") == "linear":
        cfg["rope_scaling"] = {
            "rope_type": "linear",
            "factor": float(k("rope.scaling.factor", 1.0)),
        }
    return cfg
