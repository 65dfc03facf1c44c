"""Pallas grouped dequant-GEMM for quantized MoE expert banks.

TPU-native replacement for the reference's quantized fused-MoE kernel
(vllm_metax/model_executor/layers/fused_moe/fused_moe.py:87
`fused_moe_kernel_gptq_awq` — in-kernel int4/int8 dequant inside the grouped
expert GEMM). The packed expert bank is read from HBM exactly once per decode
step (the whole point of weight-only quantization); the round-1 fallback
dequantized the full (E, K, N) bank densely every forward, paying ~9x the
packed bytes in HBM traffic.

Design (megablox-style aligned dispatch, re-derived for Pallas):

- Tokens are routed/sorted by expert (ops/moe.py). Instead of XLA's
  `ragged_dot` over dense weights, rows are scattered into an ALIGNED slot
  layout: each expert's rows start at a multiple of the row-tile TM, so every
  (TM, K) m-tile belongs to exactly ONE expert. Worst-case padding is
  E_local*(TM-1) rows of static headroom; padded slots carry combine-weight 0.
- A (num_m_tiles,) tile→expert map is scalar-prefetched; the packed-weight
  BlockSpec index map reads it, so tile i streams expert[i]'s packed block
  — same mechanism as the stacked-layer dequant GEMM (quant_matmul.py), with
  the expert index replacing the layer index being the only new ingredient.
- The expert bank stays STACKED over layers (L, E, NT, K/2, TILE_N) and the
  layer index is prefetched too: under the model's lax.scan over layers there
  is no per-layer XLA gather of the packed bank (which would cost a full
  extra read+write of the weights per step).
- Grid is (m_tiles, n_tiles) with n innermost: the x m-tile block stays
  resident across the n sweep, and each m-tile streams its expert's full
  packed (K/2, N) exactly once. Experts with ≤ TM routed rows (the decode
  case) therefore read the bank exactly once per step.

The dequant math (split-halves int4 unpack, per-group scale/zero) is shared
with quant_matmul._int4_kernel / _int8_kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_metax_tpu.ops.pallas.quant_matmul import (
    TILE_N,
    _choose_chunk,
    _int4_kernel,
    _int8_kernel,
    _pick_tile_n,
)


def tile_expert_bank(w: jnp.ndarray, tp: int = 1, axis: str = "n"):
    """Pre-tile a packed expert bank (..., E, K, N) → (..., E, NT, K, TILE_N)
    so each kernel block is one contiguous HBM run.

    axis="n": rank-major over tp on the N tiles (col-parallel gate_up; caller
    has already applied the rank-major column permutation).
    axis="k": plain tiling (row-parallel down; tp shards the K dim)."""
    *lead, k, n = w.shape
    # same per-bank fallback as tile_packed_weight: narrow expert banks
    # (N < TILE_N) tile at the widest 128-multiple that divides N
    tile_n = _pick_tile_n(k, n, tp if axis == "n" else 1)
    nt = n // tile_n
    w = w.reshape(*lead, k, nt, tile_n)
    w = jnp.moveaxis(w, -2, -3)  # (..., NT, K, TILE_N)
    if axis == "n" and tp > 1:
        # NT is rank-major already via the column perm; contiguous NT split
        # over tp is correct as long as NT % tp == 0 (caller validates).
        pass
    return w


def moe_tiling(m: int, e_local: int) -> tuple[int, int]:
    """(TM, M_slots): row tile and the static aligned-slot row count.

    TM targets ~2x the mean rows/expert so the common decode case is one
    m-tile per expert (one packed read of the bank), without exploding the
    padded headroom for many-expert models (DeepSeek: 64-256 experts)."""
    target = max(8, (2 * m) // max(e_local, 1))
    tm = 8
    while tm * 2 <= min(target, 128):
        tm *= 2
    m_slots = m + e_local * (tm - 1)
    m_slots = -(-m_slots // tm) * tm
    return tm, m_slots


def build_aligned_dispatch(
    sorted_token: jnp.ndarray,  # (M,) i32 token row of sorted assignment j
    sorted_weight: jnp.ndarray,  # (M,) f32 combine weight
    counts: jnp.ndarray,  # (E_total,) i32 rows per GLOBAL expert
    e_start: jnp.ndarray,  # () i32 first local expert (EP rank offset)
    e_local: int,
    tm: int,
    m_slots: int,
):
    """Slot layout for the aligned grouped GEMM.

    Returns (slot_token (M_slots,) i32, slot_weight (M_slots,) f32,
    tile_expert (M_slots/TM,) i32 LOCAL expert per m-tile). Rows of experts
    outside [e_start, e_start+e_local) are dropped (EP replicated-dispatch:
    each rank computes only its expert span; the combine psum over ep sums
    the partials)."""
    m = sorted_token.shape[0]
    csum = jnp.cumsum(counts)  # (E_total,) inclusive
    start = csum - counts  # first sorted row of each expert
    local_counts = jax.lax.dynamic_slice(counts, (e_start,), (e_local,))
    local_start = jax.lax.dynamic_slice(start, (e_start,), (e_local,))
    aligned = -(-local_counts // tm) * tm
    acsum = jnp.cumsum(aligned)
    aoff = acsum - aligned  # aligned slot offset per local expert

    j = jnp.arange(m, dtype=jnp.int32)
    # local expert of sorted row j (e_local if j is outside the local span)
    local_csum = jnp.cumsum(local_counts)
    rel = j - jax.lax.dynamic_index_in_dim(local_start, 0, keepdims=False)
    e_of_j = jnp.searchsorted(local_csum, rel, side="right").astype(jnp.int32)
    in_span = (rel >= 0) & (rel < local_csum[-1])
    e_clip = jnp.clip(e_of_j, 0, e_local - 1)
    slot = aoff[e_clip] + (rel - (local_csum[e_clip] - local_counts[e_clip]))
    slot = jnp.where(in_span, slot, m_slots)  # out-of-range → dropped

    slot_token = jnp.zeros((m_slots,), jnp.int32).at[slot].set(
        sorted_token, mode="drop"
    )
    slot_weight = jnp.zeros((m_slots,), jnp.float32).at[slot].set(
        sorted_weight, mode="drop"
    )
    n_tiles = m_slots // tm
    t0 = jnp.arange(n_tiles, dtype=jnp.int32) * tm
    tile_expert = jnp.searchsorted(acsum, t0, side="right").astype(jnp.int32)
    tile_expert = jnp.clip(tile_expert, 0, e_local - 1)
    return slot_token, slot_weight, tile_expert


def _int4_moe_kernel(
    te_ref, li_ref, x_ref, w_ref, s_ref, zs_ref, out_ref, acc_ref, *, kc, gs
):
    _int4_kernel(
        x_ref, w_ref.at[0, 0, 0], s_ref.at[0, 0], zs_ref.at[0, 0],
        out_ref, acc_ref, kc=kc, gs=gs,
    )


def _int8_moe_kernel(
    te_ref, li_ref, x_ref, w_ref, s_ref, out_ref, acc_ref, *, kc, gs
):
    _int8_kernel(
        x_ref, w_ref.at[0, 0, 0], s_ref.at[0, 0], out_ref, acc_ref,
        kc=kc, gs=gs,
    )


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def int4_grouped_matmul_pallas(
    xs: jnp.ndarray,  # (M_slots, K) slot-aligned rows
    w_p4t: jnp.ndarray,  # (L, E, NT, K/2, TILE_N) packed int4 (split-halves)
    s: jnp.ndarray,  # (L, E, G, N)
    zs: jnp.ndarray,  # (L, E, G, N)
    tile_expert: jnp.ndarray,  # (M_slots/TM,) i32
    layer_idx,  # () i32
    tm: int,
    interpret: bool = False,
) -> jnp.ndarray:
    m_slots, k = xs.shape
    l, e, nt, k_half, tn = w_p4t.shape
    n = nt * tn
    g = s.shape[-2]
    gs = k // g
    if k != 2 * k_half or m_slots % tm:
        raise ValueError(f"bad shapes: M={m_slots} TM={tm} K={k}")
    kc = _choose_chunk(k_half, gs)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    kernel = functools.partial(_int4_moe_kernel, kc=kc, gs=gs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(m_slots // tm, nt),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j, te, li: (i, 0)),
            pl.BlockSpec(
                (1, 1, 1, k_half, tn),
                lambda i, j, te, li: (li[0], te[i], j, 0, 0),
            ),
            pl.BlockSpec((1, 1, g, tn), lambda i, j, te, li: (li[0], te[i], 0, j)),
            pl.BlockSpec((1, 1, g, tn), lambda i, j, te, li: (li[0], te[i], 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, te, li: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_slots, n), xs.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_slots * k * n,
            bytes_accessed=(m_slots // tm) * k_half * n
            + xs.size * xs.dtype.itemsize
            + m_slots * n * xs.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_expert, lidx, xs, w_p4t, s, zs)


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def int8_grouped_matmul_pallas(
    xs: jnp.ndarray,  # (M_slots, K)
    w_i8t: jnp.ndarray,  # (L, E, NT, K, TILE_N) int8
    s: jnp.ndarray,  # (L, E, G, N) [G may be 1 = per-channel]
    tile_expert: jnp.ndarray,
    layer_idx,
    tm: int,
    interpret: bool = False,
) -> jnp.ndarray:
    m_slots, k = xs.shape
    l, e, nt, kk, tn = w_i8t.shape
    n = nt * tn
    g = s.shape[-2]
    gs = k // g if g > 1 else k
    if kk != k or m_slots % tm:
        raise ValueError(f"bad shapes: M={m_slots} TM={tm} K={k}")
    kc = _choose_chunk(k, gs if g > 1 else -1)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    kernel = functools.partial(_int8_moe_kernel, kc=kc, gs=gs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(m_slots // tm, nt),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j, te, li: (i, 0)),
            pl.BlockSpec(
                (1, 1, 1, k, tn), lambda i, j, te, li: (li[0], te[i], j, 0, 0)
            ),
            pl.BlockSpec((1, 1, g, tn), lambda i, j, te, li: (li[0], te[i], 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, te, li: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_slots, n), xs.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_slots * k * n,
            bytes_accessed=(m_slots // tm) * k * n
            + xs.size * xs.dtype.itemsize
            + m_slots * n * xs.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_expert, lidx, xs, w_i8t, s)
