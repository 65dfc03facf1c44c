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
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "w" in p:
        y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype)
    elif "w_p4" in p:
        from vllm_metax_tpu.ops.quant import int4_matmul

        y = int4_matmul(x, p["w_p4"], p["s"], p["zs"], p.get("perm"))
    elif "w_i8" in p and "a8" in p:
        from vllm_metax_tpu.ops.quant import w8a8_int8_matmul

        y = w8a8_int8_matmul(x, p["w_i8"], p["s"])
    elif "w_i8" in p:
        from vllm_metax_tpu.ops.quant import int8_wo_matmul

        y = int8_wo_matmul(x, p["w_i8"], p["s"])
    elif "w_f8" in p:
        from vllm_metax_tpu.ops.quant import fp8_matmul

        y = fp8_matmul(x, p["w_f8"], p["s"], p.get("act_s"))
    else:
        raise ValueError(f"unknown linear param keys: {list(p)}")
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y
