"""Linear layers over plain param pytrees.

A linear's params are a dict whose keys select the math (static under jit):
- {"w": (K, N) [, "b": (N,)]}                       — dense bf16/fp32
- {"w_i8": (K, N) int8, "s": (K/g or 1, N)}         — weight-only INT8
- {"w_p4": (K/2, N) uint8, "s": (K/g, N),
   "zs": (K/g, N) [, "perm": (K,)]}                 — packed INT4 group quant
                                                       (GPTQ/AWQ canonical form;
                                                        ref csrc/quantization/gptq/)
- {"w_i8": (K, N) int8, "s": (1, N), "a8": ()}      — W8A8 dynamic int8 act quant
- {"w_f8": (K, N) fp8, "s": (1, N) [, "act_s"]}     — FP8 W8A8

All weights are stored (in_features, out_features): `y = x @ W`, the natural
MXU orientation. The reference's equivalents are GPTQLinearMethod.apply
(vllm_metax/quant_config/gptq.py:131) and cutlass_scaled_mm
(csrc/torch_bindings.cpp:251).

Stacked mode: when called under a lax.scan over layers, pass the WHOLE
stacked dict (leaves have a leading L axis) plus `layer_idx`. Quantized
layouts route the stacked bank straight into the Pallas kernel, whose
BlockSpec index map selects the layer — avoiding the dynamic-slice
materialization (a full extra weight read+write per layer) that scanning
weights as xs incurs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _idx(arr, layer_idx):
    return jax.lax.dynamic_index_in_dim(arr, layer_idx, keepdims=False)


def _prefill_requant_hit(p: dict, x) -> bool:
    """True when this call should use the int8 prefill-requant bank: the
    token count (static under jit — the runner's bucket size) is at or above
    the prefill threshold."""
    from vllm_metax_tpu import envs

    return x.shape[0] >= envs.METAX_TPU_PREFILL_MIN_T


def apply_linear(
    p: dict, x: jnp.ndarray, layer_idx=None, lora_idx=None,
    gather_axis: Optional[str] = None,
) -> jnp.ndarray:
    """gather_axis: mesh axis for ROW-parallel layers under TP. Only used by
    the GPTQ desc_act path: the global activation permutation crosses rank
    shards, so the local x slice is all-gathered to full width first and the
    rank's perm slice (sharded P(..., "tp")) indexes into it — the TP analog
    of exllama's act-order handling (ref: q_gemm.cu:1059)."""
    stacked = layer_idx is not None

    def leaf(name):
        return _idx(p[name], layer_idx) if stacked else p[name]

    if "perm" in p and gather_axis is not None:
        x = jax.lax.all_gather(x, gather_axis, axis=1, tiled=True)

    def lora_delta(y):
        # Batched multi-LoRA via mask-and-matmul (vllm_metax_tpu/lora.py):
        # two tiny MXU passes over (n_slots * R) columns, no per-token
        # gathers — the TPU-native replacement for punica BGMV.
        if lora_idx is None or "lora_A" not in p:
            return y
        a = leaf("lora_A").astype(jnp.float32)  # (n, K, R)
        b = leaf("lora_B").astype(jnp.float32)  # (n, R, N)
        s = p["lora_s"]  # (n,) f32, slot 0 == 0.0
        xa = jnp.einsum("tk,nkr->tnr", x.astype(jnp.float32), a)
        mask = (
            lora_idx[:, None]
            == jnp.arange(a.shape[0], dtype=jnp.int32)[None, :]
        )
        xa = xa * (mask.astype(jnp.float32) * s[None, :])[..., None]
        delta = jnp.einsum("tnr,nrm->tm", xa, b)
        return y + delta.astype(y.dtype)

    if "w" in p:
        y = jnp.dot(x, leaf("w"), preferred_element_type=jnp.float32).astype(
            x.dtype
        )
    elif "w8p" in p and _prefill_requant_hit(p, x):
        # prefill-requant fast path: load-time int8-per-channel copy of the
        # int4 bank; compute-bound prefill chunks run the int8 MXU with one
        # per-channel epilogue (ref analog: shape-keyed kernel dispatch,
        # csrc/quantization/gptq/q_gemm.cu:2373 region). Decode buckets
        # (small T) fall through to the int4 branches below.
        from vllm_metax_tpu.ops.quant import w8a8_stacked_matmul

        if "perm" in p:  # same activation reorder as the int4 path
            x = jnp.take(x, leaf("perm"), axis=1)
        y = w8a8_stacked_matmul(x, p["w8p"], p["s8p"], layer_idx)
    elif "w_p4t" in p:
        from vllm_metax_tpu.ops.quant import int4_matmul_tiled

        perm = leaf("perm") if "perm" in p else None
        y = int4_matmul_tiled(x, p["w_p4t"], p["s"], p["zs"], perm, layer_idx)
    elif "w_p4" in p:
        from vllm_metax_tpu.ops.quant import int4_matmul

        perm = leaf("perm") if "perm" in p else None
        if stacked:
            y = int4_matmul(x, p["w_p4"], p["s"], p["zs"], perm, layer_idx)
        else:
            y = int4_matmul(x, p["w_p4"], p["s"], p["zs"], perm)
    elif "w_i8" in p and "a8" in p:
        if stacked and p["w_i8"].ndim == 3:
            # stacked bank through the Pallas kernel: the XLA dot lowering
            # materializes a relayout copy of the WHOLE (L, K, N) bank
            # (OOMs 8B-scale int8/fp8 W8A8 engines)
            from vllm_metax_tpu.ops.quant import w8a8_stacked_matmul

            y = w8a8_stacked_matmul(x, p["w_i8"], p["s"], layer_idx)
        else:
            from vllm_metax_tpu.ops.quant import w8a8_int8_matmul

            y = w8a8_int8_matmul(x, leaf("w_i8"), leaf("s"))
    elif "w_i8" in p:
        from vllm_metax_tpu.ops.quant import int8_wo_matmul

        if stacked:
            y = int8_wo_matmul(x, p["w_i8"], p["s"], layer_idx)
        else:
            y = int8_wo_matmul(x, p["w_i8"], p["s"])
    elif "w_f8" in p:
        if stacked and p["w_f8"].ndim == 3 and "act_s" not in p:
            from vllm_metax_tpu.ops.quant import fp8_stacked_matmul

            y = fp8_stacked_matmul(x, p["w_f8"], p["s"], layer_idx)
        else:
            from vllm_metax_tpu.ops.quant import fp8_matmul

            act_s = leaf("act_s") if "act_s" in p else None
            y = fp8_matmul(x, leaf("w_f8"), leaf("s"), act_s)
    else:
        raise ValueError(f"unknown linear param keys: {list(p)}")
    if "b" in p:
        y = y + leaf("b").astype(y.dtype)
    return lora_delta(y)
