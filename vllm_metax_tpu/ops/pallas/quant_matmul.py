"""Pallas fused dequant+matmul kernels (int4 group-quant, int8 weight-only).

TPU-native equivalent of the reference's GPTQ GEMM stack
(csrc/quantization/gptq/q_gemm.cu:179 gemm_half_q_half_gptq_4bit_kernel and the
MACA wave-tiled hgemm_gptq.h kernels): the weight is read from HBM in its
packed form and dequantized in VMEM right before hitting the MXU, so the HBM
traffic is the packed bytes — the whole point of weight-only quantization at
decode time (BASELINE.md: ≥90% of the dequant-GEMM memory roofline).

Tiling:
  grid = (T/TT, N/TN); each cell computes out[TT, TN] over the FULL K via an
  in-kernel chunk loop (KC rows at a time), so no cross-cell accumulation.
  The packed weight block (K/2, TN) streams through VMEM once per T-tile;
  for decode (one T-tile) that is exactly one full read of the weights.

int4 packing is split-halves (ops/quant.py pack_int4): K-chunk c of the
dequantized weight is one contiguous slice of a single nibble plane, so the
unpack is mask+shift with no sublane shuffles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# experiment knobs (None = default); set via tune scripts only
_TN_OVERRIDE = None
_KC_OVERRIDE = None
_BF16_DEQUANT = False

# Pre-tiled packed-weight layout: a (K/2, N) nibble-packed weight becomes
# (N/TILE_N, K/2, TILE_N) so each kernel block is one fully CONTIGUOUS run of
# HBM — the flat layout's (k_half, TN) blocks read 256-byte strided bursts
# and cap the kernel at ~40% of HBM bandwidth (measured).
TILE_N = 256


def tile_packed_weight(w_p4: jnp.ndarray, tp: int = 1) -> jnp.ndarray:
    """(K/2, N) → (N/TILE_N, K/2, TILE_N), rank-major over tp so a contiguous
    split of the tile dim gives each TP rank exactly its N columns."""
    k_half, n = w_p4.shape
    nt_local = n // tp // TILE_N
    w = w_p4.reshape(k_half, tp, nt_local, TILE_N)
    return w.transpose(1, 2, 0, 3).reshape(tp * nt_local, k_half, TILE_N)


def untile_packed_weight(w_p4t: jnp.ndarray) -> jnp.ndarray:
    """(NT, K/2, TILE_N) → (K/2, NT*TILE_N) (single-shard view)."""
    nt, k_half, tn = w_p4t.shape
    return w_p4t.transpose(1, 0, 2).reshape(k_half, nt * tn)


def _choose_tile(dim: int, candidates=(256, 128)) -> int:
    for t in candidates:
        if dim % t == 0:
            return t
    return dim  # caller validates


def _choose_chunk(k_half: int, group_size: int, max_chunk: int = 1024) -> int:
    """Largest KC ≤ max_chunk dividing k_half and a multiple of group_size."""
    kc = min(max_chunk, k_half)
    while kc > 1:
        if k_half % kc == 0 and (group_size <= 0 or kc % group_size == 0):
            return kc
        kc //= 2
    return k_half


def _int4_kernel(x_ref, w_ref, s_ref, zs_ref, out_ref, acc_ref, *, kc, gs):
    """One (TT, TN) output tile; full-K chunked loop.

    x_ref: (TT, K); w_ref: (K/2, TN) packed; s/zs: (G, TN); out: (TT, TN).
    """
    k_half = w_ref.shape[0]
    num_chunks = (2 * k_half) // kc
    half_chunks = k_half // kc
    acc_ref[:] = jnp.zeros_like(acc_ref)
    in_dtype = x_ref.dtype

    for c in range(num_chunks):  # static unroll; K is static
        if c < half_chunks:
            packed = w_ref[c * kc : (c + 1) * kc, :].astype(jnp.int32)
            q = packed & 0xF
        else:
            packed = w_ref[
                (c - half_chunks) * kc : (c - half_chunks + 1) * kc, :
            ].astype(jnp.int32)
            q = (packed >> 4) & 0xF
        g0 = (c * kc) // gs
        ng = kc // gs
        tn = q.shape[1]
        if _BF16_DEQUANT:
            qb = q.astype(jnp.bfloat16)
            s = s_ref[g0 : g0 + ng, :].astype(jnp.bfloat16)
            zs = zs_ref[g0 : g0 + ng, :].astype(jnp.bfloat16)
            w = (
                qb.reshape(ng, gs, tn) * s[:, None, :] - zs[:, None, :]
            ).reshape(kc, tn)
        else:
            s = s_ref[g0 : g0 + ng, :].astype(jnp.float32)
            zs = zs_ref[g0 : g0 + ng, :].astype(jnp.float32)
            w = (
                q.astype(jnp.float32).reshape(ng, gs, tn) * s[:, None, :]
                - zs[:, None, :]
            ).reshape(kc, tn)
        x_chunk = x_ref[:, c * kc : (c + 1) * kc]
        acc_ref[:] += jnp.dot(
            x_chunk, w.astype(in_dtype), preferred_element_type=jnp.float32
        )
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _int4_stacked_kernel(
    lidx_ref, x_ref, w_ref, s_ref, zs_ref, out_ref, acc_ref, *, kc, gs
):
    """Stacked-layer variant: blocks carry a leading singleton layer dim that
    the index maps resolved from the prefetched layer index."""
    _int4_kernel(
        x_ref, w_ref.at[0], s_ref.at[0], zs_ref.at[0], out_ref, acc_ref,
        kc=kc, gs=gs,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul_pallas(
    x: jnp.ndarray,  # (T, K)
    w_p4: jnp.ndarray,  # (K/2, N) or (L, K/2, N) with layer_idx
    s: jnp.ndarray,  # (G, N) or (L, G, N)
    zs: jnp.ndarray,
    layer_idx=None,  # () int32 — selects the layer of a stacked weight bank
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused dequant matmul. With `layer_idx`, the packed weights stay stacked
    (L, K/2, N) and the kernel's BlockSpec index map selects layer blocks via
    a scalar-prefetched index — no XLA dynamic-slice materialization of the
    whole layer (which costs a full extra weight read+write per step when
    called under lax.scan over layers)."""
    stacked = w_p4.ndim == 3
    t, k = x.shape
    k_half, n = w_p4.shape[-2:]
    g = s.shape[-2]
    gs = k // g
    tt = _choose_tile(t, (128, 64, 32, 16, 8))
    tn = _TN_OVERRIDE or _choose_tile(n)
    if t % tt or n % tn or n % 128 or k != 2 * k_half:
        raise ValueError(f"bad tiling: T={t} N={n} K={k}")
    kc = _KC_OVERRIDE or _choose_chunk(k_half, gs)

    grid = (t // tt, n // tn)
    flops = 2 * t * k * n
    bytes_accessed = (
        k_half * n * (t // tt)
        + x.size * x.dtype.itemsize * (n // tn)
        + 2 * g * n * 4
        + t * n * x.dtype.itemsize
    )
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
    )
    if not stacked:
        kernel = functools.partial(_int4_kernel, kc=kc, gs=gs)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tt, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (k_half, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((g, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tt, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((tt, tn), jnp.float32)],
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(x, w_p4, s, zs)

    if layer_idx is None:
        raise ValueError("stacked weights need layer_idx")
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    kernel = functools.partial(_int4_stacked_kernel, kc=kc, gs=gs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tt, k), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, k_half, tn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, g, tn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, g, tn), lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((tt, tn), lambda i, j, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((tt, tn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        grid_spec=grid_spec,
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=interpret,
    )(lidx, x, w_p4, s, zs)


def _int4_tiled_kernel(
    lidx_ref, x_ref, w_ref, s_ref, zs_ref, out_ref, acc_ref, *, kc, gs
):
    """Tiled-layout stacked variant: w block (1, 1, K/2, TN) is one
    contiguous HBM run."""
    _int4_kernel(
        x_ref, w_ref.at[0, 0], s_ref.at[0], zs_ref.at[0], out_ref, acc_ref,
        kc=kc, gs=gs,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul_tiled_pallas(
    x: jnp.ndarray,  # (T, K)
    w_p4t: jnp.ndarray,  # (L, NT, K/2, TILE_N) stacked tiled
    s: jnp.ndarray,  # (L, G, N)
    zs: jnp.ndarray,
    layer_idx,
    interpret: bool = False,
) -> jnp.ndarray:
    t, k = x.shape
    l, nt, k_half, tn = w_p4t.shape
    n = nt * tn
    g = s.shape[-2]
    gs = k // g
    tt = _choose_tile(t, (128, 64, 32, 16, 8))
    if t % tt or k != 2 * k_half:
        raise ValueError(f"bad tiling: T={t} K={k}")
    kc = _KC_OVERRIDE or _choose_chunk(k_half, gs)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    kernel = functools.partial(_int4_tiled_kernel, kc=kc, gs=gs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // tt, nt),
        in_specs=[
            pl.BlockSpec((tt, k), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, 1, k_half, tn), lambda i, j, l: (l[0], j, 0, 0)),
            pl.BlockSpec((1, g, tn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, g, tn), lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((tt, tn), lambda i, j, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((tt, tn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * k * n,
            bytes_accessed=k_half * n * (t // tt) + t * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lidx, x, w_p4t, s, zs)


def _int8_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, kc, gs):
    """Weight-only int8: w (K, TN) int8, s (G, TN) [G may be 1 = per-channel]."""
    k = w_ref.shape[0]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    in_dtype = x_ref.dtype
    per_channel = s_ref.shape[0] == 1
    for c in range(k // kc):
        q = w_ref[c * kc : (c + 1) * kc, :].astype(jnp.float32)
        tn = q.shape[1]
        if per_channel:
            w = q * s_ref[0:1, :].astype(jnp.float32)
        else:
            g0 = (c * kc) // gs
            ng = kc // gs
            s = s_ref[g0 : g0 + ng, :].astype(jnp.float32)
            w = (q.reshape(ng, gs, tn) * s[:, None, :]).reshape(kc, tn)
        x_chunk = x_ref[:, c * kc : (c + 1) * kc]
        acc_ref[:] += jnp.dot(
            x_chunk, w.astype(in_dtype), preferred_element_type=jnp.float32
        )
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _int8_stacked_kernel(lidx_ref, x_ref, w_ref, s_ref, out_ref, acc_ref, *,
                         kc, gs):
    _int8_kernel(x_ref, w_ref.at[0], s_ref.at[0], out_ref, acc_ref, kc=kc, gs=gs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_wo_matmul_pallas(
    x: jnp.ndarray,  # (T, K)
    w_i8: jnp.ndarray,  # (K, N) or (L, K, N) with layer_idx
    s: jnp.ndarray,  # (G, N) or (1, N) [stacked: leading L]
    layer_idx=None,
    interpret: bool = False,
) -> jnp.ndarray:
    stacked = w_i8.ndim == 3
    t, k = x.shape
    n = w_i8.shape[-1]
    g = s.shape[-2]
    gs = k // g if g > 1 else k
    tt = _choose_tile(t, (128, 64, 32, 16, 8))
    tn = _choose_tile(n)
    if t % tt or n % tn or n % 128:
        raise ValueError(f"bad tiling: T={t} N={n}")
    kc = _choose_chunk(k, gs if g > 1 else -1)

    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    cost = pl.CostEstimate(
        flops=2 * t * k * n,
        bytes_accessed=k * n * (t // tt)
        + x.size * x.dtype.itemsize * (n // tn)
        + t * n * x.dtype.itemsize,
        transcendentals=0,
    )
    if not stacked:
        kernel = functools.partial(_int8_kernel, kc=kc, gs=gs)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
            grid=(t // tt, n // tn),
            in_specs=[
                pl.BlockSpec((tt, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tt, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((tt, tn), jnp.float32)],
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(x, w_i8, s)

    if layer_idx is None:
        raise ValueError("stacked weights need layer_idx")
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    kernel = functools.partial(_int8_stacked_kernel, kc=kc, gs=gs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // tt, n // tn),
        in_specs=[
            pl.BlockSpec((tt, k), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, k, tn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, g, tn), lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((tt, tn), lambda i, j, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((tt, tn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        grid_spec=grid_spec,
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=interpret,
    )(lidx, x, w_i8, s)
