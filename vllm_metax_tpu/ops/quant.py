"""Quantized matmul ops (XLA reference implementations).

TPU-native replacements for the reference's quantized GEMM stack:
- int4 group quant  ≈ csrc/quantization/gptq/q_gemm.cu (gemm_half_q_half_gptq_
  4bit_kernel :179) and the MACA hgemm_gptq.h fused dequant kernels
- int8 weight-only  ≈ the same path at 8 bits
- w8a8 int8         ≈ csrc/quantization/cutlass_w8a8/ cutlass_scaled_mm +
  csrc/quantization/compressed_tensors/int8_quant_kernels.cu (dynamic per-token)
- fp8 w8a8          ≈ csrc/quantization/fp8/common.cu (the reference gates fp8
  off on MACA, platform.py:412-414; TPU v5p+/v6 has native fp8 matmul, so we
  support it for real)

Canonical packed-int4 layout (what GPTQ **and** AWQ checkpoints are repacked
into at load time — the analog of the reference converging AWQ onto the GPTQ
kernel via awq_to_gptq_4bit, quant_config/awq.py:78):
    w_p4: (K/2, N) uint8 — nibble-packed along K; even k in the low nibble,
          odd k in the high nibble
    s:    (K/g, N) f32   — per-group scales
    zs:   (K/g, N) f32   — zero*scale, so dequant is one FMA: w = q*s - zs
    perm: (K,) i32       — optional activation permutation (GPTQ desc_act)

The Pallas fused dequant-matmul kernels (ops/pallas/quant_matmul.py) implement
the same math; these XLA versions are the ground truth for their unit tests
and the fallback on CPU. Dispatch: METAX_TPU_QUANT_IMPL env (auto|xla|pallas).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_metax_tpu import envs

_INT8_MAX = 127.0
_FP8_MAX = 448.0  # e4m3 finite max


def _use_pallas() -> bool:
    impl = envs.METAX_TPU_QUANT_IMPL
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    return jax.devices()[0].platform not in ("cpu", "gpu")


def _pallas_tiles_ok(t: int, n: int) -> bool:
    """Kernel tiling constraints (quant_matmul.py): T and N divisible by the
    chosen tiles. Runner token buckets are powers of two ≥ 16, so this holds
    for all real model shapes; odd test shapes fall back to XLA."""
    return t % min(128, t) == 0 and n % min(256, n) == 0 and n % 128 == 0


# ---------------------------------------------------------------- int4 packing

def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """(K, N) uint8 values in [0,15] → (K/2, N) nibble-packed uint8.

    Split-halves packing: row i holds K-row i in the low nibble and K-row
    i + K/2 in the high nibble. Chosen over even/odd interleaving because the
    Pallas kernel's unpack is then a sublane-contiguous concat (no cross-lane
    shuffle), and any K-chunk of the dequantized weight maps to one contiguous
    nibble-plane slice (ops/pallas/quant_matmul.py)."""
    k = q.shape[0]
    assert k % 2 == 0, "K must be even to nibble-pack"
    q = q.astype(jnp.uint8)
    lo = q[: k // 2]
    hi = q[k // 2 :]
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_int4(w_p4: jnp.ndarray) -> jnp.ndarray:
    """(K/2, N) packed → (K, N) uint8 in [0,15]."""
    lo = w_p4 & jnp.uint8(0xF)
    hi = w_p4 >> 4
    return jnp.concatenate([lo, hi], axis=0)


def dequant_int4(
    w_p4: jnp.ndarray,  # (K/2, N)
    s: jnp.ndarray,  # (G, N)
    zs: jnp.ndarray,  # (G, N)
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Dequantize the canonical packed layout to (K, N) out_dtype."""
    q = unpack_int4(w_p4).astype(jnp.float32)
    k, n = q.shape
    g = s.shape[0]
    gs = k // g
    q = q.reshape(g, gs, n)
    w = q * s[:, None, :].astype(jnp.float32) - zs[:, None, :].astype(jnp.float32)
    return w.reshape(k, n).astype(out_dtype)


# ---------------------------------------------------------------- matmuls

def int4_matmul(
    x: jnp.ndarray,  # (T, K)
    w_p4: jnp.ndarray,  # (K/2, N) or stacked (L, K/2, N) with layer_idx
    s: jnp.ndarray,  # (G, N) / (L, G, N)
    zs: jnp.ndarray,
    perm: Optional[jnp.ndarray] = None,  # (K,) activation reorder (desc_act)
    layer_idx=None,
) -> jnp.ndarray:
    """Group-quantized int4 matmul: y = x[:, perm] @ dequant(w_p4, s, zs).

    Reference math: gemm_half_q_half_gptq_4bit_kernel (q_gemm.cu:179) with the
    exllama activation-permutation scheme folded in at load (we permute rows of
    w at load and keep `perm` for x; the reference instead shuffles w at load
    via gptq_shuffle, q_gemm.cu:2373 region).
    """
    if perm is not None:
        x = jnp.take(x, perm, axis=1)
    k = x.shape[1]
    gs = k // s.shape[-2]
    if (
        _use_pallas()
        and _pallas_tiles_ok(x.shape[0], w_p4.shape[-1])
        and (k // 2) % gs == 0
    ):
        from vllm_metax_tpu.ops.pallas.quant_matmul import int4_matmul_pallas

        return int4_matmul_pallas(x, w_p4, s, zs, layer_idx)
    if layer_idx is not None and w_p4.ndim == 3:
        w_p4 = jax.lax.dynamic_index_in_dim(w_p4, layer_idx, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(s, layer_idx, keepdims=False)
        zs = jax.lax.dynamic_index_in_dim(zs, layer_idx, keepdims=False)
    w = dequant_int4(w_p4, s, zs, x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def int4_matmul_tiled(
    x: jnp.ndarray,  # (T, K)
    w_p4t: jnp.ndarray,  # (L, NT, K/2, TILE_N) pre-tiled stacked bank
    s: jnp.ndarray,  # (L, G, N)
    zs: jnp.ndarray,
    perm: Optional[jnp.ndarray] = None,
    layer_idx=None,
) -> jnp.ndarray:
    """Tiled-layout int4 matmul (see quant_matmul.tile_packed_weight): the
    production path — each weight block is one contiguous HBM run."""
    if perm is not None:
        x = jnp.take(x, perm, axis=1)
    if _use_pallas():
        if envs.METAX_TPU_W4A8:
            from vllm_metax_tpu.ops.pallas.quant_matmul import (
                int4a8_matmul_tiled_pallas,
            )

            return int4a8_matmul_tiled_pallas(x, w_p4t, s, zs, layer_idx)
        from vllm_metax_tpu.ops.pallas.quant_matmul import (
            int4_matmul_tiled_pallas,
        )

        return int4_matmul_tiled_pallas(x, w_p4t, s, zs, layer_idx)
    from vllm_metax_tpu.ops.pallas.quant_matmul import untile_packed_weight

    w_l = jax.lax.dynamic_index_in_dim(w_p4t, layer_idx, keepdims=False)
    s_l = jax.lax.dynamic_index_in_dim(s, layer_idx, keepdims=False)
    zs_l = jax.lax.dynamic_index_in_dim(zs, layer_idx, keepdims=False)
    w = dequant_int4(untile_packed_weight(w_l), s_l, zs_l, x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def int8_wo_matmul(
    x: jnp.ndarray,  # (T, K)
    w_i8: jnp.ndarray,  # (K, N) int8 or stacked (L, K, N)
    s: jnp.ndarray,  # (G, N) or (1, N) f32 scales [stacked: leading L]
    layer_idx=None,
) -> jnp.ndarray:
    """Weight-only int8 (per-channel or grouped symmetric)."""
    if _use_pallas() and _pallas_tiles_ok(x.shape[0], w_i8.shape[-1]):
        from vllm_metax_tpu.ops.pallas.quant_matmul import int8_wo_matmul_pallas

        return int8_wo_matmul_pallas(x, w_i8, s, layer_idx)
    if layer_idx is not None and w_i8.ndim == 3:
        w_i8 = jax.lax.dynamic_index_in_dim(w_i8, layer_idx, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(s, layer_idx, keepdims=False)
    k, n = w_i8.shape
    g = s.shape[0]
    wf = w_i8.astype(jnp.float32)
    if g == 1:
        w = (wf * s.astype(jnp.float32)).astype(x.dtype)
    else:
        w = (wf.reshape(g, k // g, n) * s[:, None, :].astype(jnp.float32)).reshape(
            k, n
        ).astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def quantize_activations_int8(
    x: jnp.ndarray,  # (T, K)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-token symmetric int8 activation quant (ref:
    dynamic_scaled_int8_quant, int8_quant_kernels.cu:455)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / _INT8_MAX, 1e-10)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)
    return q, scale  # (T, K) int8, (T, 1) f32


def w8a8_int8_matmul(
    x: jnp.ndarray,  # (T, K)
    w_i8: jnp.ndarray,  # (K, N) int8
    s: jnp.ndarray,  # (1, N) f32 per-channel weight scales
) -> jnp.ndarray:
    """W8A8: dynamic per-token act quant + int8×int8 matmul with int32
    accumulation and scale epilogue (ref: cutlass_scaled_mm,
    csrc/torch_bindings.cpp:251)."""
    xq, xs = quantize_activations_int8(x)
    acc = jax.lax.dot_general(
        xq,
        w_i8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * s.astype(jnp.float32)
    return y.astype(x.dtype)


def w8a8_stacked_matmul(
    x: jnp.ndarray,  # (T, K)
    w_i8: jnp.ndarray,  # (L, K, N) int8 — prefill-requant bank
    s: jnp.ndarray,  # (L, 1, N) f32
    layer_idx,
) -> jnp.ndarray:
    """Stacked-layer W8A8 for the prefill-requant path
    (envs.METAX_TPU_PREFILL_REQUANT; see int8a8_stacked_matmul_pallas)."""
    if _use_pallas() and _pallas_tiles_ok(x.shape[0], w_i8.shape[-1]):
        from vllm_metax_tpu.ops.pallas.quant_matmul import (
            int8a8_stacked_matmul_pallas,
        )

        return int8a8_stacked_matmul_pallas(x, w_i8, s, layer_idx)
    w_l = jax.lax.dynamic_index_in_dim(w_i8, layer_idx, keepdims=False)
    s_l = jax.lax.dynamic_index_in_dim(s, layer_idx, keepdims=False)
    return w8a8_int8_matmul(x, w_l, s_l)


def fp8_stacked_matmul(
    x: jnp.ndarray,  # (T, K)
    w_f8: jnp.ndarray,  # (L, K, N) float8_e4m3fn
    s: jnp.ndarray,  # (L, 1, N) f32
    layer_idx,
) -> jnp.ndarray:
    """Stacked-layer FP8 W8A8 (Pallas on TPU; per-layer XLA fallback)."""
    if _use_pallas() and _pallas_tiles_ok(x.shape[0], w_f8.shape[-1]):
        from vllm_metax_tpu.ops.pallas.quant_matmul import (
            fp8_stacked_matmul_pallas,
        )

        return fp8_stacked_matmul_pallas(x, w_f8, s, layer_idx)
    w_l = jax.lax.dynamic_index_in_dim(w_f8, layer_idx, keepdims=False)
    s_l = jax.lax.dynamic_index_in_dim(s, layer_idx, keepdims=False)
    return fp8_matmul(x, w_l, s_l)


def quantize_activations_fp8(
    x: jnp.ndarray, static_scale: Optional[jnp.ndarray] = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token dynamic (or per-tensor static) fp8-e4m3 activation quant
    (ref: dynamic_per_token_scaled_fp8_quant, csrc/quantization/fp8/common.cu)."""
    xf = x.astype(jnp.float32)
    if static_scale is not None:
        scale = jnp.broadcast_to(static_scale.astype(jnp.float32), (x.shape[0], 1))
    else:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.maximum(amax / _FP8_MAX, 1e-10)
    q = jnp.clip(xf / scale, -_FP8_MAX, _FP8_MAX).astype(jnp.float8_e4m3fn)
    return q, scale


def fp8_matmul(
    x: jnp.ndarray,  # (T, K)
    w_f8: jnp.ndarray,  # (K, N) float8_e4m3fn
    s: jnp.ndarray,  # (1, N) f32 per-channel weight scales
    act_s: Optional[jnp.ndarray] = None,  # () static act scale, None = dynamic
) -> jnp.ndarray:
    """FP8 W8A8 matmul with f32 accumulation and scale epilogue."""
    xq, xs = quantize_activations_fp8(x, act_s)
    acc = jax.lax.dot_general(
        xq,
        w_f8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = acc * xs * s.astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------- quantizers
# (on-the-fly quantization of bf16 weights; load-time, not in the hot path)

def quantize_int4_grouped(
    w: jnp.ndarray,  # (K, N) float
    group_size: int,
    sym: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (w_p4, s, zs) in the canonical layout."""
    k, n = w.shape
    gs = k if group_size in (-1, 0) else group_size
    assert k % gs == 0, (k, gs)
    g = k // gs
    wf = w.astype(jnp.float32).reshape(g, gs, n)
    if sym:
        amax = jnp.max(jnp.abs(wf), axis=1)  # (G, N)
        s = jnp.maximum(amax / 7.0, 1e-10)
        z = jnp.full_like(s, 8.0)
    else:
        wmin = jnp.min(wf, axis=1)
        wmax = jnp.max(wf, axis=1)
        s = jnp.maximum((wmax - wmin) / 15.0, 1e-10)
        z = jnp.round(-wmin / s)
    q = jnp.clip(jnp.round(wf / s[:, None, :]) + z[:, None, :], 0, 15)
    q = q.reshape(k, n).astype(jnp.uint8)
    return pack_int4(q), s, z * s


def quantize_int8_channel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """→ (w_i8 (K,N), s (1,N)) symmetric per-output-channel."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)  # (1, N)
    s = jnp.maximum(amax / _INT8_MAX, 1e-10)
    q = jnp.clip(jnp.round(wf / s), -128, 127).astype(jnp.int8)
    return q, s


def quantize_fp8_channel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """→ (w_f8 (K,N), s (1,N)) per-output-channel e4m3."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    s = jnp.maximum(amax / _FP8_MAX, 1e-10)
    q = jnp.clip(wf / s, -_FP8_MAX, _FP8_MAX).astype(jnp.float8_e4m3fn)
    return q, s
