"""Pallas request-batched paged decode attention.

TPU-native analog of the reference's decode-specialized paged attention
(csrc/attention/paged_attention_v1.cu / v2.cu): when every live request has
exactly ONE query token (the multi-step decode hot loop), the unified ragged
kernel (ops/pallas/ragged_attention.py) wastes a whole grid step per request —
a (TQ*G)-row tile with only G valid rows, and ~15 fixed VPU ops per tile
dominate the step (~77µs/tile measured in round 1).

This kernel packs NR requests into one grid step:
- q: (R, HQ, D) → (R/NR, HKV, NR*G, D); tile t serves requests
  [t*NR, (t+1)*NR) — pure reshape/transpose, no gather/searchsorted.
- per chunk, each request's KV pages are DMA'd into its CKV-wide slice of a
  shared (HKV, NR*CKV, D) buffer (double-buffered); requests whose context is
  already exhausted skip their DMAs.
- ONE batched q@k / p@v pair per chunk covers all NR requests; the block-
  diagonal request mask (row's request == column's request) kills the
  cross-request lanes. The wasted MXU flops are negligible at decode shapes;
  the per-tile fixed op cost is amortized NR-fold.
- online softmax (m/l/acc) exactly as the unified kernel.

Padding requests must carry seq_len == 0 (the runner guarantees this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_metax_tpu.ops.kv_cache import KVCache

_NEG_INF = -1e30

NR = 8  # requests per grid step


def decode_attention_supported(q, kv_cache: KVCache, md, mla: bool = False) -> bool:
    t, hq, d = q.shape
    nb, hkv, bs, dk = kv_cache.k.shape
    r = md.seq_lens.shape[0]
    if kv_cache.quantized and (bs % 128 or mla):
        return False
    if mla and hkv != 1:
        return False
    return (
        (d % 128 == 0 or (mla and d % 8 == 0))
        and hq % hkv == 0
        and bs % 8 == 0
        and t >= r
        and r % NR == 0
    )


def _decode_kernel(
    # scalar prefetch
    seq_lens_ref,  # (R,) i32 (0 for pad rows)
    bt_ref,  # (R*MAXB,) i32 flat block tables
    # array inputs
    q_ref,  # (1, HKV, NR*G, D) VMEM
    k_hbm,  # (NB, HKV, BS, D) ANY
    *rest,  # [v_hbm if not MLA], [ks/vs_hbm if quantized], out, scratch
    sm_scale,
    ckv,
    maxb,
    g,
    sliding_window,
    logits_soft_cap,
    quantized,
    pv_width,
):
    if quantized:
        (v_hbm, ks_hbm, vs_hbm, out_ref, k_buf, v_buf, ks_buf, vs_buf,
         acc_ref, m_ref, l_ref, sem) = rest
    elif pv_width:
        # MLA latent MQA: no separate V — PV reads the first pv_width lanes
        # of the latent K buffer (ref: mla/common.py:1851 _forward_decode)
        (out_ref, k_buf, acc_ref, m_ref, l_ref, sem) = rest
        v_hbm = v_buf = ks_hbm = vs_hbm = ks_buf = vs_buf = None
    else:
        (v_hbm, out_ref, k_buf, v_buf, acc_ref, m_ref, l_ref, sem) = rest
        ks_hbm = vs_hbm = ks_buf = vs_buf = None
    t_idx = pl.program_id(0)
    hkv = k_buf.shape[1]
    d = q_ref.shape[3]
    bs = k_hbm.shape[2]
    ppc = ckv // bs
    rows = NR * g

    req0 = t_idx * NR
    sls = [seq_lens_ref[req0 + rr] for rr in range(NR)]
    max_sl = sls[0]
    for rr in range(1, NR):
        max_sl = jnp.maximum(max_sl, sls[rr])
    num_chunks = (max_sl + ckv - 1) // ckv

    def chunk_dma(c, slot, kind):
        for rr in range(NR):  # static unroll
            base = (req0 + rr) * maxb + c * ppc
            for p in range(ppc):
                # page-level skip: only DMA pages the request's context
                # actually reaches (chunk-level gating alone read the whole
                # CKV span — up to ~45% wasted KV traffic at short contexts)
                @pl.when(c * ckv + p * bs < sls[rr])
                def _(p=p):
                    page = bt_ref[base + p]
                    off = rr * ckv + p * bs
                    dmas = [
                        pltpu.make_async_copy(
                            k_hbm.at[page],
                            k_buf.at[slot, :, pl.ds(off, bs)],
                            sem.at[slot, 0, rr * ppc + p],
                        ),
                    ]
                    if not pv_width:
                        dmas.append(
                            pltpu.make_async_copy(
                                v_hbm.at[page],
                                v_buf.at[slot, :, pl.ds(off, bs)],
                                sem.at[slot, 1, rr * ppc + p],
                            )
                        )
                    if quantized:
                        dmas.append(
                            pltpu.make_async_copy(
                                ks_hbm.at[page],
                                ks_buf.at[slot, :, pl.ds(off, bs)],
                                sem.at[slot, 2, rr * ppc + p],
                            )
                        )
                        dmas.append(
                            pltpu.make_async_copy(
                                vs_hbm.at[page],
                                vs_buf.at[slot, :, pl.ds(off, bs)],
                                sem.at[slot, 3, rr * ppc + p],
                            )
                        )
                    for dma in dmas:
                        if kind == "start":
                            dma.start()
                        else:
                            dma.wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(num_chunks == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # per-row (NR*G,1) seq lens & per-column (1, NR*CKV) request slot
    row_sl = jnp.concatenate(
        [jnp.full((g, 1), sl, jnp.int32) for sl in sls], axis=0
    )  # (NR*G, 1)
    col_sl = jnp.concatenate(
        [jnp.full((1, ckv), sl, jnp.int32) for sl in sls], axis=1
    )  # (1, NR*CKV) — seq len of the COLUMN's request
    col_in_req = jax.lax.broadcasted_iota(jnp.int32, (1, NR * ckv), 1) % ckv
    # 3D copies for the V mask: Mosaic cannot insert a minor dim on i1
    # vectors (tpu.reshape of (1,NR*CKV) bool → (1,NR*CKV,1) fails to
    # compile), so build the comparison directly at the broadcast shape
    col_in_req3 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, NR * ckv, 1), 1) % ckv
    )
    col_sl3 = jnp.concatenate(
        [jnp.full((1, ckv, 1), sl, jnp.int32) for sl in sls], axis=1
    )  # (1, NR*CKV, 1)
    row_rr = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // g
    col_rr = jax.lax.broadcasted_iota(jnp.int32, (1, NR * ckv), 1) // ckv
    same_req = row_rr == col_rr  # (NR*G, NR*CKV)

    @pl.when(num_chunks > 0)
    def _():
        chunk_dma(0, 0, "start")

        def chunk_body(c, _):
            slot = c % 2

            @pl.when(c + 1 < num_chunks)
            def _():
                chunk_dma(c + 1, (c + 1) % 2, "start")

            chunk_dma(c, slot, "wait")

            kv_pos = c * ckv + col_in_req  # (1, NR*CKV)
            # columns whose request skipped this chunk's DMA hold stale/
            # uninitialized buffer data (NaN in interpret mode): p is 0 there
            # via the score mask, but 0*NaN = NaN in the PV matmul, so V (and
            # its scales) must be zeroed on invalid columns too
            col_ok = kv_pos < col_sl  # (1, NR*CKV)
            mask = same_req & (kv_pos < row_sl)  # (NR*G, NR*CKV)
            if sliding_window > 0:
                mask &= kv_pos > (row_sl - 1) - sliding_window
            mask = mask[None]  # (1, NR*G, NR*CKV) broadcasts over HKV

            q_all = q_ref[0]  # (HKV, NR*G, D)
            k_all = k_buf[slot]  # (HKV, NR*CKV, D)
            v_all = k_all[:, :, :pv_width] if pv_width else v_buf[slot]
            if quantized:
                k_all = k_all.astype(q_all.dtype)
            s = jax.lax.dot_general(
                q_all,
                k_all,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (HKV, NR*G, NR*CKV)
            if quantized:
                s = s * ks_buf[slot][:, None, :]
            s = s * sm_scale
            if logits_soft_cap > 0.0:
                s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)
            s = jnp.where(mask, s, _NEG_INF)

            m_prev = m_ref[...]  # (HKV, NR*G, 1)
            l_prev = l_ref[...]
            m_cur = jnp.max(s, axis=2, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[...] = l_prev * alpha + jnp.sum(p, axis=2, keepdims=True)

            if quantized:
                vs = jnp.where(col_ok, vs_buf[slot], 0.0)  # (HKV, NR*CKV)
                p = p * vs[:, None, :]
                v_mm = v_all.astype(q_all.dtype)
            else:
                v_mm = v_all
            col_ok3 = (c * ckv + col_in_req3) < col_sl3  # (1, NR*CKV, 1)
            v_mm = jnp.where(col_ok3, v_mm, jnp.zeros((), v_mm.dtype))
            pv = jax.lax.dot_general(
                p.astype(v_mm.dtype),
                v_mm,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (HKV, NR*G, D)
            acc_ref[...] = acc_ref[...] * alpha + pv
            m_ref[...] = m_new
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

        out_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "sliding_window", "logits_soft_cap", "pv_width", "interpret"
    ),
)
def paged_decode_attention_pallas(
    q: jnp.ndarray,  # (T, HQ, D) with T >= R; row i is request i's token
    kv_cache: KVCache,
    metadata,
    sm_scale: float,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    pv_width: int = 0,  # MLA: PV reads k_buf[..., :pv_width]; out D = pv_width
    interpret: bool = False,
) -> jnp.ndarray:
    t, hq, d = q.shape
    nb, hkv, bs, _ = kv_cache.k.shape
    g = hq // hkv
    d_out = pv_width or d
    r, maxb = metadata.block_tables.shape
    nt = r // NR
    ckv = min(bs * 16, 256)
    if ckv % bs:
        ckv = bs

    # (R, HQ, D) → (NT, HKV, NR*G, D): row rr*G+gi of tile t is request
    # t*NR+rr, group gi — pure transpose, no gathers
    q_tiled = (
        q[:r]
        .reshape(nt, NR, hkv, g, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(nt, hkv, NR * g, d)
    )

    quantized = kv_cache.quantized
    in_specs = [
        pl.BlockSpec((1, hkv, NR * g, d), lambda i, *_: (i, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [
        metadata.seq_lens,
        metadata.block_tables.reshape(-1),
        q_tiled,
        kv_cache.k,
    ]
    scratch = [
        pltpu.VMEM((2, hkv, NR * ckv, d), kv_cache.k.dtype),
    ]
    if not pv_width:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(kv_cache.v)
        scratch.append(pltpu.VMEM((2, hkv, NR * ckv, d), kv_cache.v.dtype))
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ]
        inputs += [kv_cache.k_scale, kv_cache.v_scale]
        scratch += [
            pltpu.VMEM((2, hkv, NR * ckv), jnp.float32),
            pltpu.VMEM((2, hkv, NR * ckv), jnp.float32),
        ]
    scratch += [
        pltpu.VMEM((hkv, NR * g, d_out), jnp.float32),
        pltpu.VMEM((hkv, NR * g, 1), jnp.float32),
        pltpu.VMEM((hkv, NR * g, 1), jnp.float32),
        pltpu.SemaphoreType.DMA(
            (2, 4 if quantized else 2, NR * (ckv // bs))
        ),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hkv, NR * g, d_out), lambda i, *_: (i, 0, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_kernel,
        sm_scale=sm_scale,
        ckv=ckv,
        maxb=maxb,
        g=g,
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        quantized=quantized,
        pv_width=pv_width,
    )
    out_tiled = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, hkv, NR * g, d_out), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    out = (
        out_tiled.reshape(nt, hkv, NR, g, d_out)
        .transpose(0, 2, 1, 3, 4)
        .reshape(r, hq, d_out)
    )
    if t > r:
        out = jnp.concatenate(
            [out, jnp.zeros((t - r, hq, d_out), out.dtype)], axis=0
        )
    return out
