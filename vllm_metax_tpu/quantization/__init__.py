"""Quantization method registry + param-tree quantizer.

Equivalent of the reference's quant_config/ package (MacaGPTQConfig
quant_config/gptq.py:22, MacaAWQConfig awq.py:24, compressed-tensors,
moe_wna16), redesigned for a functional param pytree: quantization is a
load-time tree transformation that swaps dense {"w"} linear dicts for
quantized layouts; the hot path dispatches on dict keys (layers/linear.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from vllm_metax_tpu.config import ModelConfig, QuantizationConfig
from vllm_metax_tpu.ops.quant import (
    quantize_fp8_channel,
    quantize_int4_grouped,
    quantize_int8_channel,
)

# Methods supported end-to-end (ref: supported_quantization list,
# platform.py:59-66 — awq, gptq, compressed-tensors, moe_wna16; plus fp8/int8
# which the reference gates off on MACA but TPU supports natively).
SUPPORTED_METHODS = (
    "gptq",
    "awq",
    "int4",
    "int8",
    "w8a8_int8",
    "compressed-tensors",
    "fp8",
    "moe_wna16",
)

# Param-dict keys that mark an already-quantized linear.
_QUANT_KEYS = ("w_p4", "w_i8", "w_f8")


def is_quantized_linear(p: dict) -> bool:
    return any(k in p for k in _QUANT_KEYS)


def quantize_linear(p: dict, qc: QuantizationConfig) -> dict:
    """Quantize one dense linear param dict {"w", ["b"]} in place of layout."""
    w = p["w"]
    out: dict = {}
    if (
        qc.method in ("gptq", "awq", "int4", "moe_wna16")
        or (qc.method == "compressed-tensors" and qc.ct_scheme == "wna16")
    ) and qc.bits == 4:
        w_p4, s, zs = quantize_int4_grouped(w, qc.group_size, sym=qc.sym)
        out = {"w_p4": w_p4, "s": s, "zs": zs}
    elif qc.method in ("gptq", "awq", "int8", "moe_wna16") and qc.bits == 8:
        w_i8, s = quantize_int8_channel(w)
        out = {"w_i8": w_i8, "s": s}
    elif qc.method == "compressed-tensors" and qc.ct_scheme == "fp8":
        w_f8, s = quantize_fp8_channel(w)
        out = {"w_f8": w_f8, "s": s}
    elif qc.method in ("w8a8_int8", "compressed-tensors"):
        w_i8, s = quantize_int8_channel(w)
        out = {"w_i8": w_i8, "s": s, "a8": jnp.zeros((), jnp.int8)}
    elif qc.method == "fp8":
        w_f8, s = quantize_fp8_channel(w)
        out = {"w_f8": w_f8, "s": s}
    else:
        raise ValueError(f"unsupported quantization {qc.method!r}/{qc.bits}b")
    if "b" in p:
        out["b"] = p["b"]
    return out


# Linear keys inside a layer dict that get quantized. Embeddings, norms, and
# rope caches never quantize; lm_head only when qc.lm_head_quantized.
_LAYER_LINEARS = ("qkv", "o", "gate_up", "down", "gate_up_shared", "down_shared")
# MoE expert banks: stacked (E, K, N) weights use grouped per-expert scales.
_EXPERT_BANKS = ("experts_gate_up", "experts_down")


def quantize_params(
    params: dict, cfg: ModelConfig, qc: QuantizationConfig
) -> dict:
    """On-the-fly quantization of a bf16 param tree (what `quantization="..."`
    on a non-quantized checkpoint does — the analog of loading a pre-quantized
    HF checkpoint, for testing and for checkpoints quantized at deploy time)."""
    if not qc.enabled:
        return params
    if qc.method not in SUPPORTED_METHODS:
        raise ValueError(
            f"unsupported quantization method {qc.method!r}; "
            f"supported: {SUPPORTED_METHODS}"
        )
    import jax

    layers = dict(params["layers"])
    for key in _LAYER_LINEARS:
        if key in layers and not is_quantized_linear(layers[key]):
            # stacked (L, K, N): SEQUENTIAL over layers (lax.map) — a vmap
            # materializes the whole bank's f32 quantization workspace at
            # once (15GB transient for an 8B fp8/int8 bank, OOMs 16GB HBM
            # at load; the failure surfaces later because dispatch is async)
            lin = layers[key]
            quant = jax.lax.map(
                lambda w: quantize_linear({"w": w}, qc), lin["w"]
            )
            if "b" in lin:
                quant["b"] = lin["b"]
            layers[key] = quant
    for key in _EXPERT_BANKS:
        if key in layers and not is_quantized_linear(layers[key]):
            lin = layers[key]
            # (L, E, K, N) → sequential over L, vmap over experts
            layers[key] = jax.lax.map(
                jax.vmap(lambda w: quantize_linear({"w": w}, qc)), lin["w"]
            )
    new_params = dict(params)
    new_params["layers"] = layers
    if (
        qc.lm_head_quantized
        and "lm_head" in new_params
        and not isinstance(new_params["lm_head"], dict)
    ):
        # int8 weight-only per-channel (accuracy-safe for logits; the act
        # side stays bf16) — halves the E*V decode-step HBM read
        from vllm_metax_tpu.ops.quant import quantize_int8_channel

        w_i8, s = quantize_int8_channel(new_params["lm_head"])
        new_params["lm_head"] = {"w_i8": w_i8, "s": s}
    return new_params
