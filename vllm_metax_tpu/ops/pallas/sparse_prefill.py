"""Block-sparse prefill attention kernel (vertical-slash serving path).

The XLA consumer in ops/sparse_attention.py materializes per-(head,
q-block) gathers of the selected kv blocks — (HQ, NQB, B, bn, D) f32,
hundreds of MB at flagship geometry — which makes the sparse path SLOWER
than dense below ~32k context (tools/perf/sparse_prefill_bench.py).

This kernel reads each selected kv block exactly once straight from the
context arrays via scalar-prefetched dynamic block indices (the same
page-gated DMA shape as decode_attention.py), with flash-style online
softmax across the selected blocks — no gather materialization, compute
proportional to the kept blocks only.

Ref analog: the sparse kernel consuming convert_vertical_slash_indexes'
index lists (csrc/attention/vertical_slash_index.cu:64-77); the index
LISTS are replaced by a static-budget selection (top-k over the dense
block mask) whose padded tail repeats the last valid id so Pallas's
revisit dedup skips the DMA for pad steps.

Returns (out, lse) so the caller can LSE-merge the (tiny) vertical-column
phase computed in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(
    sel_ref,  # (HQ, NQB, B) i32 kv-block ids (prefetch)
    valid_ref,  # (HQ, NQB, B) i32 0/1 (prefetch)
    seq_ref,  # (1,) i32 true context length (prefetch)
    *refs,  # q, k×NJ, v×NJ, out, lse, acc, m, l
    sm_scale: float,
    ql: int,
    block_n: int,
    nb_j: int,
    nj: int,
):
    q_ref = refs[0]
    k_refs = refs[1 : 1 + nj]
    v_refs = refs[1 + nj : 1 + 2 * nj]
    out_ref, lse_ref, acc_ref, m_ref, l_ref = refs[1 + 2 * nj :]
    h = pl.program_id(0)
    qb = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    seq = seq_ref[0]

    qt = q_ref[0, 0].astype(jnp.float32)  # (BM, D)
    # NJ selected kv blocks concatenated into one wide tile: one (BM, NJ·BN)
    # dot + one online-softmax pass amortizes the per-grid-step fixed cost
    # (the decode kernel's NR-batching lesson)
    kt = jnp.concatenate(
        [r[0].astype(jnp.float32) for r in k_refs], axis=0
    )  # (NJ·BN, D)
    bm = qt.shape[0]
    s = (
        jax.lax.dot_general(
            qt, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * sm_scale
    )  # (BM, NJ·BN)

    # global positions: the q chunk ENDS the context at `seq`
    q_pos = (
        seq - ql + qb * bm
        + jax.lax.broadcasted_iota(jnp.int32, (bm, nj * block_n), 0)
    )
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (bm, block_n), 1)
    k_pos = jnp.concatenate(
        [
            sel_ref[h, qb, j * nj + i] * block_n + col_iota
            for i in range(nj)
        ],
        axis=1,
    )  # (BM, NJ·BN)
    ok = jnp.concatenate(
        [
            jnp.full(
                (bm, block_n), valid_ref[h, qb, j * nj + i] > 0
            )
            for i in range(nj)
        ],
        axis=1,
    )
    mask = (k_pos <= q_pos) & (k_pos < seq) & ok
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    # fully-masked step: m stays _NEG_INF and p must be EXACTLY zero —
    # exp(s - m) would be exp(0)=1 and sweep garbage into acc
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m_prev - m_new)  # 1.0 when both are _NEG_INF
    vt = jnp.concatenate(
        [r[0].astype(jnp.float32) for r in v_refs], axis=0
    )  # (NJ·BN, D)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, vt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = m_new

    @pl.when(j == nb_j - 1)
    def _write():
        l = l_ref[...]
        out_ref[0, 0] = (acc_ref[...] / jnp.maximum(l, 1e-30)).astype(
            out_ref.dtype
        )
        lse_ref[0, 0] = jnp.where(
            l > 0.0, m_ref[...] + jnp.log(jnp.maximum(l, 1e-30)), _NEG_INF
        )


def sparse_block_attention_pallas(
    q: jnp.ndarray,  # (QL, HQ, D) — the chunk ENDS the context
    k: jnp.ndarray,  # (KV, HKV, D)
    v: jnp.ndarray,  # (KV, HKV, D)
    sel: jnp.ndarray,  # (HQ, NQB, B) i32 selected kv-block ids
    sel_valid: jnp.ndarray,  # (HQ, NQB, B) bool
    seq,  # scalar i32 true context length (<= KV)
    sm_scale: float,
    block_m: int = 128,
    block_n: int = 128,
    nj: int = 8,  # selected blocks per grid step (wide-tile batching)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Block phase of sparse prefill: online-softmax attention over ONLY the
    selected kv blocks. Returns (out (QL, HQ, D), lse (QL, HQ) f32); rows
    whose selection is empty get lse=-1e30 and out=0."""
    ql, hq, d = q.shape
    kv, hkv, _ = k.shape
    g = hq // hkv
    nqb = ql // block_m
    b = sel.shape[2]
    assert ql % block_m == 0 and sel.shape[:2] == (hq, nqb)

    # pad kv extent to whole blocks; transpose to (HKV, KVp, D) so each
    # selected block is one contiguous (BN, D) slab
    kvp = -(-kv // block_n) * block_n
    kt = jnp.pad(k, ((0, kvp - kv), (0, 0), (0, 0))).transpose(1, 0, 2)
    vt = jnp.pad(v, ((0, kvp - kv), (0, 0), (0, 0))).transpose(1, 0, 2)
    q4 = q.transpose(1, 0, 2).reshape(hq, nqb, block_m, d)

    # pad the budget to a multiple of nj, then repoint invalid entries
    # (a SUFFIX — top-k rank order) at the last valid id (ids descend, so
    # a running min) — consecutive equal indices make Pallas skip the
    # redundant DMA
    nj = min(nj, b)
    bp = -(-b // nj) * nj
    nkb = kvp // block_n
    if bp != b:
        sel = jnp.pad(sel, ((0, 0), (0, 0), (0, bp - b)))
        sel_valid = jnp.pad(sel_valid, ((0, 0), (0, 0), (0, bp - b)))
    sel_p = jax.lax.cummin(
        jnp.where(sel_valid, sel, nkb), axis=2
    )
    sel_p = jnp.minimum(sel_p, nkb - 1).astype(jnp.int32)

    def kv_spec(i):
        return pl.BlockSpec(
            (1, block_n, d),
            lambda h, qb, j, sel_ref, valid_ref, seq_ref: (
                h // g, sel_ref[h, qb, j * nj + i], 0
            ),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(hq, nqb, bp // nj),
        in_specs=[
            pl.BlockSpec((1, 1, block_m, d), lambda h, qb, j, *_: (h, qb, 0, 0)),
            *[kv_spec(i) for i in range(nj)],
            *[kv_spec(i) for i in range(nj)],
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_m, d), lambda h, qb, j, *_: (h, qb, 0, 0)),
            pl.BlockSpec((1, 1, block_m, 1), lambda h, qb, j, *_: (h, qb, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.float32),
        ],
    )
    out4, lse4 = pl.pallas_call(
        functools.partial(
            _kernel,
            sm_scale=sm_scale,
            ql=ql,
            block_n=block_n,
            nb_j=bp // nj,
            nj=nj,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((hq, nqb, block_m, d), q.dtype),
            jax.ShapeDtypeStruct((hq, nqb, block_m, 1), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        sel_p,
        sel_valid.astype(jnp.int32),
        jnp.asarray(seq, jnp.int32).reshape(1),
        q4,
        *([kt] * nj),
        *([vt] * nj),
    )
    out = out4.reshape(hq, ql, d).transpose(1, 0, 2)
    lse = lse4.reshape(hq, ql).T
    return out, lse
