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


# experiment knobs (None = default); env-settable for hardware sweeps
import os

_TN_OVERRIDE = int(os.getenv("METAX_TPU_GEMM_TN", "0")) or None
_KC_OVERRIDE = int(os.getenv("METAX_TPU_GEMM_KC", "0")) or None
_BF16_DEQUANT = False
# W4A8 per-group scale-FMA precision: the kernel is VPU-bound on the
# G passes of convert+mul+add over the (TT, TN) accumulator (profiled
# ~61us of the 123us gate_up call); bf16 multiplies run the VPU at 2x.
# Accuracy: group partials |d| <= 128*127*15 ~ 2^18 keep ~8 significant
# bits in bf16 — gate behind an env for PPL validation.
_BF16_SCALE_FMA = os.getenv("METAX_TPU_GEMM_BF16FMA", "0") == "1"

# Pre-tiled packed-weight layout: a (K/2, N) nibble-packed weight becomes
# (N/TILE_N, K/2, TILE_N) so each kernel block is one fully CONTIGUOUS run of
# HBM — the flat layout's (k_half, TN) blocks read 256-byte strided bursts
# and cap the kernel at ~40% of HBM bandwidth (measured). Env-settable for
# hardware sweeps (layout-time: takes effect at engine init). 512 beats 256
# by ~3% e2e at 8B decode (fewer grid cells → less per-cell fixed cost);
# _pick_tile_n falls back per bank when N doesn't divide or the double-
# buffered block would blow VMEM.
TILE_N = int(os.getenv("METAX_TPU_GEMM_TILE_N", "512"))
_TILE_VMEM_BUDGET = 8 * 1024 * 1024  # bytes for the 2x-buffered weight block


def _pick_tile_n(k_half: int, n: int, tp: int = 1) -> int:
    tile = TILE_N
    while tile > 128 and (
        n % (tp * tile) or 2 * k_half * tile > _TILE_VMEM_BUDGET
    ):
        tile //= 2
    return tile


def tile_packed_weight(w_p4: jnp.ndarray, tp: int = 1) -> jnp.ndarray:
    """(K/2, N) → (N/TILE_N, K/2, TILE_N), rank-major over tp so a contiguous
    split of the tile dim gives each TP rank exactly its N columns."""
    k_half, n = w_p4.shape
    tile_n = _pick_tile_n(k_half, n, tp)
    nt_local = n // tp // tile_n
    w = w_p4.reshape(k_half, tp, nt_local, tile_n)
    return w.transpose(1, 2, 0, 3).reshape(tp * nt_local, k_half, tile_n)


def untile_packed_weight(w_p4t: jnp.ndarray) -> jnp.ndarray:
    """(NT, K/2, TILE_N) → (K/2, NT*TILE_N) (single-shard view)."""
    nt, k_half, tn = w_p4t.shape
    return w_p4t.transpose(1, 0, 2).reshape(k_half, nt * tn)


def _choose_tile(dim: int, candidates=(256, 128)) -> int:
    for t in candidates:
        if dim % t == 0:
            return t
    return dim  # caller validates


def _choose_chunk(k_half: int, group_size: int, max_chunk: int = 2048) -> int:
    """Largest KC ≤ max_chunk dividing k_half and a multiple of group_size.
    Default cap 2048: one chunk covers the whole K/2 plane at 8B shapes
    (fewer unrolled loop edges, +1% e2e); METAX_TPU_GEMM_KC is a CAP fed
    through the divisor search, never a raw chunk (a non-divisor KC would
    silently drop K rows)."""
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
    kc = _choose_chunk(k_half, gs, _KC_OVERRIDE or 2048)

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
    kc = _choose_chunk(k_half, gs, _KC_OVERRIDE or 2048)
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


def w4a8_repack(w_p4t: jnp.ndarray) -> jnp.ndarray:
    """Offset-binary repack for the W4A8 kernel: byte XOR 0x80, viewed int8.

    The canonical packed byte is b = q_lo | (q_hi << 4) with both nibbles raw
    [0,15]. XOR 0x80 maps the high nibble to (q_hi - 8) mod 16 (= q_hi XOR 8,
    two's-complement in 4 bits), so in the kernel:
      b & 0x0F  (as int8) == q_lo                 (values 0..15)
      b & 0xF0  (as int8) == 16 * (q_hi - 8)      (exact, sign included)
    i.e. BOTH nibble planes unpack with a single 8-bit AND each — no shifts
    (Mosaic has no 8-bit vector shifts) and no i32 round-trips. The /16 and
    the -8 offset fold into the per-group scale row and the zero-point term.
    """
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_xor(w_p4t.astype(jnp.uint8), jnp.uint8(0x80)), jnp.int8
    )


def _int4a8_kernel(
    xq_ref, xs_ref, sxq_ref, w_ref, s_ref, zs_ref, out_ref, *, kc, gs
):
    """W4A8 tile: int8 activations × int4 weights on the int8 MXU.

    Math (per-group MXU factoring, replacing per-weight VPU dequant):
      y[m,n] = a[m] * ( Σ_g s[g,n]·(xq_g · q_g)_int32  −  Σ_g zs[g,n]·sxq[m,g] )
    where xq = round(x/a) per-token int8, sxq[m,g] = Σ_{k∈g} xq[m,k]
    (precomputed outside, (T, G) f32). The zero-point term is ONE f32
    (TT,G)@(G,TN) MXU dot; the group scales hit the int32 partial products as
    a broadcast row — no per-weight multiply. The int8 dot runs at 2x the
    bf16 MXU rate, which is what breaks the bf16 compute floor that binds the
    exact kernel at decode batch sizes.

    The weight is w4a8_repack format: unpack is one AND per nibble plane.
    Low plane (k < K/2): q_lo = b & 0x0F, scaled by s[g].
    High plane (k >= K/2): (b & 0xF0) == 16*(q_hi - 8) as int8, scaled by
    s[g]/16, with the -8 offset corrected via an extra -8*s[g]*sxq[g] term
    in the zero dot.

    Replaces the reference's fused dequant GEMM role
    (csrc/quantization/gptq/hgemm_gptq.h:852-1029) at the int8 MXU rate.

    Accumulation is by VALUE (vregs / compiler-managed), written to out_ref
    once — per-group read-modify-writes of a VMEM scratch measured 7% SLOWER
    than the exact bf16 kernel.

    xq_ref: (TT, K) int8; xs_ref: (TT, 1) f32; sxq_ref: (TT, G) f32;
    w_ref: (K/2, TN) w4a8-packed int8; s/zs: (G, TN) f32; out: (TT, TN).
    """
    k_half = w_ref.shape[0]
    half_chunks = k_half // kc
    g_half = k_half // gs  # groups in the low plane
    acc = jnp.zeros(out_ref.shape, jnp.float32)

    for c in range(half_chunks):  # static unroll; K is static
        b = w_ref[c * kc : (c + 1) * kc, :]  # int8 (kc, TN)
        q_lo = jnp.bitwise_and(b, jnp.int8(0x0F))
        q_hi16 = jnp.bitwise_and(b, jnp.int8(-16))  # == 16*(q_hi - 8)
        ng = kc // gs
        g0 = (c * kc) // gs
        for gi in range(ng):
            gsl = slice(gi * gs, (gi + 1) * gs)
            d_lo = jax.lax.dot_general(
                xq_ref[:, c * kc + gi * gs : c * kc + (gi + 1) * gs],
                q_lo[gsl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            d_hi = jax.lax.dot_general(
                xq_ref[
                    :, k_half + c * kc + gi * gs : k_half + c * kc + (gi + 1) * gs
                ],
                q_hi16[gsl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if _BF16_SCALE_FMA:
                # bf16 scale multiplies at 2x VPU rate; the f32 adds keep
                # the running sum exact-ish. Group partials are <= 2^18, so
                # the bf16 product keeps 8 significant bits — PPL-gated.
                acc = acc + (
                    d_lo.astype(jnp.bfloat16)
                    * s_ref[g0 + gi, :][None, :].astype(jnp.bfloat16)
                ).astype(jnp.float32)
                acc = acc + (
                    d_hi.astype(jnp.bfloat16)
                    * (
                        s_ref[g_half + g0 + gi, :][None, :]
                        * (1.0 / 16.0)
                    ).astype(jnp.bfloat16)
                ).astype(jnp.float32)
            else:
                acc = acc + d_lo.astype(jnp.float32) * s_ref[g0 + gi, :][
                    None, :
                ]
                acc = acc + d_hi.astype(jnp.float32) * (
                    s_ref[g_half + g0 + gi, :][None, :] * (1.0 / 16.0)
                )

    # zero-point term, plus the high plane's -8 offset correction
    z = jnp.dot(
        sxq_ref[:], zs_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) - 8.0 * jnp.dot(
        sxq_ref[:, g_half:], s_ref[g_half:, :].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = ((acc - z) * xs_ref[:]).astype(out_ref.dtype)


def _int4a8_tiled_kernel(
    lidx_ref, xq_ref, xs_ref, sxq_ref, w_ref, s_ref, zs_ref, out_ref,
    *, kc, gs
):
    _int4a8_kernel(
        xq_ref, xs_ref, sxq_ref, w_ref.at[0, 0], s_ref.at[0], zs_ref.at[0],
        out_ref, kc=kc, gs=gs,
    )


def quantize_activations_int8(x: jnp.ndarray):
    """Per-token symmetric int8 quant: x (T, K) → (xq int8, xs (T,1) f32,
    sxq (T, G-agnostic per-128 sums are computed by the caller))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / xs), -127, 127
    ).astype(jnp.int8)
    return xq, xs


def _act_quant_kernel(x_ref, xq_ref, xs_ref, sxq_ref, *, gs):
    """One pass over a (TT, K) activation tile: per-token amax → int8 quant
    + scale + per-group int sums. Fuses what XLA runs as 3-4 separate
    fusions per linear (the reference fuses act-quant into its GEMM
    prologue the same way, csrc/quantization/fused kernels)."""
    xf = x_ref[...].astype(jnp.float32)
    tt, k = xf.shape
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / xs), -127.0, 127.0)
    xq_ref[...] = q.astype(jnp.int8)
    xs_ref[...] = xs
    sxq_ref[...] = jnp.sum(q.reshape(tt, k // gs, gs), axis=2)


@functools.partial(jax.jit, static_argnames=("gs", "interpret"))
def act_quant_pallas(x: jnp.ndarray, gs: int, interpret: bool = False):
    """Fused per-token int8 activation quant + per-group sums (the W4A8
    GEMM's prologue): x (T, K) → (xq int8, xs (T, 1) f32, sxq (T, K/gs) f32).
    """
    t, k = x.shape
    g = k // gs
    # cap the row tile so the (TT, K) bf16-in + f32-math block stays inside
    # scoped VMEM (prefill tiles at K=14336 OOM'd the 20MB budget at TT=256)
    cands = tuple(
        c for c in (256, 128, 64, 32, 16, 8) if c * k * 6 <= 8 * 1024 * 1024
    ) or (8,)
    tt = _choose_tile(t, cands)
    grid_spec = pl.GridSpec(
        grid=(t // tt,),
        in_specs=[pl.BlockSpec((tt, k), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((tt, k), lambda i: (i, 0)),
            pl.BlockSpec((tt, 1), lambda i: (i, 0)),
            pl.BlockSpec((tt, g), lambda i: (i, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_act_quant_kernel, gs=gs),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, k), jnp.int8),
            jax.ShapeDtypeStruct((t, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, g), jnp.float32),
        ],
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4a8_matmul_tiled_pallas(
    x: jnp.ndarray,  # (T, K) bf16/f32 activations
    w_p4t: jnp.ndarray,  # (L, NT, K/2, TILE_N) stacked tiled w4a8_repack int8
    s: jnp.ndarray,  # (L, G, N) f32
    zs: jnp.ndarray,  # (L, G, N) f32 (= zero*scale)
    layer_idx,
    interpret: bool = False,
) -> jnp.ndarray:
    t, k = x.shape
    l, nt, k_half, tn = w_p4t.shape
    n = nt * tn
    g = s.shape[-2]
    gs = k // g
    tt = _choose_tile(t, (128, 64, 32, 16, 8))
    if w_p4t.dtype != jnp.int8:
        raise ValueError("w4a8 kernel needs a w4a8_repack()ed int8 bank")
    if t % tt or k != 2 * k_half or k_half % gs:
        raise ValueError(f"bad tiling: T={t} K={k} gs={gs}")
    kc = _choose_chunk(k_half, gs, _KC_OVERRIDE or 2048)

    from vllm_metax_tpu import envs

    if envs.METAX_TPU_FUSED_ACT_QUANT and t % 8 == 0:
        xq, xs, sxq = act_quant_pallas(
            x, gs, interpret=jax.devices()[0].platform == "cpu"
        )
    else:
        xq, xs = quantize_activations_int8(x)
        sxq = xq.astype(jnp.float32).reshape(t, g, gs).sum(-1)  # (T, G)

    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    kernel = functools.partial(_int4a8_tiled_kernel, kc=kc, gs=gs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // tt, nt),
        in_specs=[
            pl.BlockSpec((tt, k), lambda i, j, li: (i, 0)),
            pl.BlockSpec((tt, 1), lambda i, j, li: (i, 0)),
            pl.BlockSpec((tt, g), lambda i, j, li: (i, 0)),
            pl.BlockSpec((1, 1, k_half, tn), lambda i, j, li: (li[0], j, 0, 0)),
            pl.BlockSpec((1, g, tn), lambda i, j, li: (li[0], 0, j)),
            pl.BlockSpec((1, g, tn), lambda i, j, li: (li[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((tt, tn), lambda i, j, li: (i, j)),
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
            bytes_accessed=k_half * n * (t // tt) + t * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lidx, xq, xs, sxq, w_p4t, s, zs)


def _int8a8_kernel(xq_ref, xs_ref, w_ref, s_ref, out_ref, *, kc):
    """W8A8 int8-MXU tile: int8 activations x int8 per-channel weights.

    The weight-only int8 kernel dequantizes W on the VPU (2 ops per weight
    element — ~270us at lm_head shapes, the gap from 65% to ~SOL). Here the
    dot runs int8xint8→int32 on the MXU and the only VPU work is the
    (T,1)x(1,N) scale epilogue. Replaces the reference's
    cutlass_scaled_mm int8 path (csrc/quantization/cutlass_w8a8) for the
    quantized lm_head."""
    k = w_ref.shape[0]
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for c in range(k // kc):
        acc = acc + jax.lax.dot_general(
            xq_ref[:, c * kc : (c + 1) * kc],
            w_ref[c * kc : (c + 1) * kc, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    out_ref[:] = (
        acc.astype(jnp.float32) * xs_ref[:] * s_ref[0:1, :].astype(jnp.float32)
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8a8_matmul_pallas(
    x: jnp.ndarray,  # (T, K) bf16/f32
    w_i8: jnp.ndarray,  # (K, N) int8 per-channel
    s: jnp.ndarray,  # (1, N) f32
    interpret: bool = False,
) -> jnp.ndarray:
    t, k = x.shape
    n = w_i8.shape[-1]
    tt = _choose_tile(t, (128, 64, 32, 16, 8))
    tn = _choose_tile(n, (512, 256, 128))
    if t % tt or n % tn or n % 128:
        raise ValueError(f"bad tiling: T={t} N={n}")
    kc = _choose_chunk(k, -1)
    xq, xs = quantize_activations_int8(x)
    return pl.pallas_call(
        functools.partial(_int8a8_kernel, kc=kc),
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        grid=(t // tt, n // tn),
        in_specs=[
            pl.BlockSpec((tt, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((k, tn), lambda i, j: (0, j)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tt, tn), lambda i, j: (i, j)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * k * n,
            bytes_accessed=k * n + t * k + t * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, xs, w_i8, s)


def _int8a8_stacked_kernel(lidx_ref, xq_ref, xs_ref, w_ref, s_ref, out_ref,
                           *, kc):
    _int8a8_kernel(xq_ref, xs_ref, w_ref.at[0], s_ref.at[0], out_ref, kc=kc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8a8_stacked_matmul_pallas(
    x: jnp.ndarray,  # (T, K) bf16/f32
    w_i8: jnp.ndarray,  # (L, K, N) int8 per-channel — prefill-requant bank
    s: jnp.ndarray,  # (L, 1, N) f32
    layer_idx,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stacked-layer W8A8: the PREFILL path for GPTQ/AWQ models when the
    load-time int8-per-channel requant bank is enabled
    (METAX_TPU_PREFILL_REQUANT). Prefill is compute-bound, so the int8-MXU
    dot + single per-channel scale epilogue beats the W4A8 kernel's
    per-group VPU epilogue; decode keeps reading the int4 bank (half the
    weight bytes). Analog of the reference's m-threshold kernel dispatch
    (csrc/quantization/gptq/q_gemm.cu:2373 region — shape-keyed kernel
    selection)."""
    t, k = x.shape
    n = w_i8.shape[-1]
    tt = _choose_tile(t, (256, 128, 64, 32, 16, 8))
    tn = _choose_tile(n, (512, 256, 128))
    if t % tt or n % tn or n % 128:
        raise ValueError(f"bad tiling: T={t} N={n}")
    kc = _choose_chunk(k, -1)
    xq, xs = quantize_activations_int8(x)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // tt, n // tn),
        in_specs=[
            pl.BlockSpec((tt, k), lambda i, j, l: (i, 0)),
            pl.BlockSpec((tt, 1), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, k, tn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, 1, tn), lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((tt, tn), lambda i, j, l: (i, j)),
    )
    return pl.pallas_call(
        functools.partial(_int8a8_stacked_kernel, kc=kc),
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * k * n,
            bytes_accessed=k * n + t * k + t * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lidx, xq, xs, w_i8, s)


def _e4m3_to_bf16(v):
    """Branch-free integer e4m3fn → bf16: Mosaic's float8 astype lowers to
    a ~100-op scalar emulation (measured 74 vs 719 GB/s weight read against
    the int8 kernel); the bit transform is 6 VPU int ops. Exact for normals
    (bf16 exp = E+120, mantissa = M<<4 — no carry since M<<4 < 128);
    subnormals (|x| < 2^-6, under 4e-5 of the e4m3 range) flush to signed
    zero (FTZ), far below the per-channel quantization noise."""
    # int32 arithmetic with constant multiplies (Mosaic legalizes i32 mul/
    # and/add; sub-32-bit shifts it does not), truncating to u16 for the
    # final bitcast
    u = jax.lax.bitcast_convert_type(v, jnp.uint8).astype(jnp.int32)
    sign = (u & 0x80) * 256
    mag = u & 0x7F
    bits = sign + mag * 16 + (120 << 7)
    bits = jnp.where(mag >= 8, bits, sign)  # E==0 → FTZ
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.bfloat16
    )


def _fp8a8_stacked_kernel(lidx_ref, xq_ref, xs_ref, w_ref, s_ref, out_ref,
                          *, kc):
    """Stacked FP8 W8A8 tile: v5e has no fp8 MXU, so both operands convert
    to bf16 in-kernel (per K-chunk — never a materialized dequant copy of
    the bank, which is what the XLA dot lowering allocates) and the dot
    runs bf16 with f32 accumulation + per-token x per-channel epilogue."""
    k = w_ref.shape[1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for c in range(k // kc):
        xc = _e4m3_to_bf16(xq_ref[:, c * kc : (c + 1) * kc])
        wc = _e4m3_to_bf16(w_ref[0, c * kc : (c + 1) * kc, :])
        acc = acc + jnp.dot(xc, wc, preferred_element_type=jnp.float32)
    out_ref[:] = (
        acc * xs_ref[:] * s_ref[0, 0:1, :].astype(jnp.float32)
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fp8_stacked_matmul_pallas(
    x: jnp.ndarray,  # (T, K) bf16/f32
    w_f8: jnp.ndarray,  # (L, K, N) float8_e4m3fn per-channel
    s: jnp.ndarray,  # (L, 1, N) f32
    layer_idx,
    interpret: bool = False,
) -> jnp.ndarray:
    """FP8 W8A8 over a stacked layer bank (ref: cutlass_scaled_mm fp8 —
    which the reference PLATFORM disables, supports_fp8()→False;
    csrc/quantization/fp8/common.cu)."""
    from vllm_metax_tpu.ops.quant import quantize_activations_fp8

    t, k = x.shape
    n = w_f8.shape[-1]
    tt = _choose_tile(t, (256, 128, 64, 32, 16, 8))
    tn = _choose_tile(n, (512, 256, 128))
    if t % tt or n % tn or n % 128:
        raise ValueError(f"bad tiling: T={t} N={n}")
    kc = _choose_chunk(k, -1)
    xq, xs = quantize_activations_fp8(x)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // tt, n // tn),
        in_specs=[
            pl.BlockSpec((tt, k), lambda i, j, l: (i, 0)),
            pl.BlockSpec((tt, 1), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, k, tn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, 1, tn), lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((tt, tn), lambda i, j, l: (i, j)),
    )
    return pl.pallas_call(
        functools.partial(_fp8a8_stacked_kernel, kc=kc),
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * k * n,
            bytes_accessed=k * n + t * k + t * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lidx, xq, xs, w_f8, s)


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
