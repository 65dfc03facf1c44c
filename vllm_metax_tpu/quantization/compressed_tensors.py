"""compressed-tensors checkpoint support.

Parses the HF `quantization_config.config_groups` schemes and loads the two
schemes the reference serves (ref: MacaCompressedTensorsW8A8Int8MoEMethod /
MacaCompressedTensorsWNA16MoEMethod, quant_config/compressed_tensors_moe.py:
31, 92):

  - W8A8-INT8 ("int-quantized"): per-channel int8 `weight` (N, K) +
    `weight_scale` (N, 1), dynamic per-token int8 activations.
  - WNA16 ("pack-quantized"): group-quantized int4/int8 weights packed 8-per-
    int32 along K (`weight_packed` (N, K/8) int32, signed two's-complement
    nibbles) + `weight_scale` (N, G), weight-only.

Both land in the SAME canonical layouts every other quant path uses
(w_i8/s/a8, w_p4/s/zs), so the serving kernels are shared — the analog of
the reference converging AWQ onto the GPTQ kernel (awq_to_gptq_4bit,
quant_config/awq.py:78).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def parse_ct_scheme(q: dict):
    """Extract (scheme, bits, group_size, sym) from a compressed-tensors
    quantization_config. Unlike the round-3 stub (which hardcoded
    w8a8-int8), this reads config_groups — a WNA16 checkpoint routes to the
    int4 group path. Returns ("w8a8_int8"|"wna16", bits, group_size, sym)."""
    groups = q.get("config_groups") or {}
    weights = None
    input_acts = None
    for g in groups.values():
        if not isinstance(g, dict):
            continue
        targets = [t.lower() for t in g.get("targets", ["linear"])]
        if any("linear" in t for t in targets):
            weights = g.get("weights") or weights
            input_acts = g.get("input_activations") or input_acts
    if weights is None:
        # legacy/unspecified: the previous default (w8a8-int8)
        return "w8a8_int8", 8, -1, True
    bits = int(weights.get("num_bits", 8))
    sym = bool(weights.get("symmetric", True))
    strategy = weights.get("strategy", "channel")
    group_size = int(weights.get("group_size") or -1)
    if strategy != "group":
        group_size = -1
    if weights.get("type") == "float":
        # FP8 W8A8 ("float-quantized", the neuralmagic fp8 distribution
        # format): e4m3 codes + weight_scale — routing it into the int8
        # branch would read raw fp8 bytes as int8 weights
        if bits != 8:
            raise ValueError(
                f"unsupported float compressed-tensors width: {weights}"
            )
        return "fp8", 8, -1, sym
    if bits == 8 and input_acts:
        return "w8a8_int8", 8, -1, sym
    if bits in (4, 8):
        return "wna16", bits, group_size if group_size > 0 else 128, sym
    raise ValueError(f"unsupported compressed-tensors weights: {weights}")


def has_ct_tensors(reader, prefix: str) -> bool:
    return reader.has(f"{prefix}.weight_packed") or (
        reader.has(f"{prefix}.weight")
        and reader.has(f"{prefix}.weight_scale")
    )


def _unpack_int32_nibbles(packed: np.ndarray, bits: int) -> np.ndarray:
    """(N, K/f) int32 → (N, K) signed ints; f = 32 // bits, values packed
    little-endian along K (the compressed-tensors pack_4bit layout)."""
    factor = 32 // bits
    shifts = (np.arange(factor, dtype=np.uint32) * bits)[None, None, :]
    vals = (packed.astype(np.uint32)[:, :, None] >> shifts) & ((1 << bits) - 1)
    vals = vals.reshape(packed.shape[0], -1).astype(np.int32)
    # sign-extend
    half = 1 << (bits - 1)
    return np.where(vals >= half, vals - (1 << bits), vals)


def load_ct_linear(reader, prefix: str, qc, dtype) -> dict:
    """One compressed-tensors linear → canonical quant param dict."""
    scheme = getattr(qc, "ct_scheme", "") or "w8a8_int8"
    if scheme == "fp8":
        # FP8 W8A8: e4m3 codes + per-channel/per-tensor scale pass through
        # verbatim into the w_f8 runtime (same layout the fp8 quant_method
        # loader produces)
        codes = jnp.asarray(reader.get(f"{prefix}.weight"))  # (N, K) e4m3
        scale = jnp.asarray(
            reader.get(f"{prefix}.weight_scale"), jnp.float32
        )
        n = codes.shape[0]
        s = (
            scale.reshape(-1)[None, :]
            if scale.size == n
            else jnp.broadcast_to(scale.reshape(1, 1), (1, n))
        )
        p = {"w_f8": codes.T, "s": s}
        if reader.has(f"{prefix}.input_scale"):
            p["act_s"] = jnp.asarray(
                reader.get(f"{prefix}.input_scale"), jnp.float32
            ).reshape(())
        return p
    if scheme == "w8a8_int8":
        w = np.asarray(reader.get(f"{prefix}.weight"))  # (N, K) int8
        s = np.asarray(
            reader.get(f"{prefix}.weight_scale"), dtype=np.float32
        ).reshape(-1)  # (N,)
        return {
            "w_i8": jnp.asarray(w.T, jnp.int8),  # (K, N)
            "s": jnp.asarray(s[None, :]),  # (1, N) per-channel
            "a8": jnp.zeros((), jnp.int8),
        }
    # WNA16: packed int4/int8 group weights
    bits = qc.bits or 4
    packed = np.asarray(reader.get(f"{prefix}.weight_packed"))
    qvals = _unpack_int32_nibbles(packed, bits)  # (N, K) signed
    scales = np.asarray(
        reader.get(f"{prefix}.weight_scale"), dtype=np.float32
    )  # (N, G)
    n, k = qvals.shape
    g = scales.shape[1] if scales.ndim == 2 else 1
    half = 1 << (bits - 1)
    if bits == 4:
        from vllm_metax_tpu.ops.quant import pack_int4

        qu = (qvals.T + half).astype(np.uint8)  # (K, N) in [0, 15]
        s = scales.T  # (G, N)
        zs = half * s  # symmetric: zero at mid-scale
        return {
            "w_p4": pack_int4(jnp.asarray(qu)),
            "s": jnp.asarray(s),
            "zs": jnp.asarray(zs),
        }
    # 8-bit groups → per-channel int8 (group scales folded exactly when
    # G == 1; otherwise requantize per-channel over the dense weight)
    dense = qvals.T.astype(np.float32).reshape(g, k // g, n) * scales.T[
        :, None, :
    ]
    dense = dense.reshape(k, n)
    from vllm_metax_tpu.ops.quant import quantize_int8_channel

    w_i8, s = quantize_int8_channel(jnp.asarray(dense))
    return {"w_i8": w_i8, "s": s}
