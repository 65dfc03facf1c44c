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

# requests per grid step: more requests amortize the per-tile fixed op cost
# (profiled ~16µs/tile at NR=8) at the price of a bigger shared KV buffer
# (2·HKV·NR·CKV·D per k/v) and more wasted block-diagonal MXU lanes
import os

NR = int(os.getenv("METAX_TPU_DECODE_NR", "8"))


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
    *rest,  # [v_hbm if not MLA], [ks/vs_hbm if quantized],
    #         [kcur/vcur if deferred], out, scratch
    sm_scale,
    ckv,
    maxb,
    g,
    sliding_window,
    logits_soft_cap,
    quantized,
    pv_width,
    fused,
    deferred,
    dcp,
    return_lse,
    skip_scale_dma=False,  # perf-probe ONLY (tools/perf/decode_attn_probe.py):
    # skips the per-page scale DMAs — numerically WRONG output; never set in
    # production (no env knob; must be passed explicitly by the probe)
):
    kcur_ref = vcur_ref = None
    lse_ref = None
    single_kv = pv_width or fused  # one HBM pool / one KV VMEM buffer
    if return_lse:
        # outputs come in declaration order: out_ref then lse_ref, followed
        # by the scratch refs — pull lse out so the unpacks below stay shared
        rest = list(rest)
        n_scratch = (
            (8 if fused else 9) if quantized else (6 if single_kv else 7)
        )  # kv bufs [+ scale bufs] + acc/m/l + sem + g_ref
        lse_ref = rest.pop(-n_scratch - 1)
    if quantized and fused:
        # fused [K‖V] pages: values in one pool/buffer, scales separate.
        # Deferred mode passes ONE kvcur (HKV, NR, 2D) row set.
        if deferred:
            (ks_hbm, vs_hbm, kcur_ref, out_ref, k_buf, ks_buf, vs_buf,
             acc_ref, m_ref, l_ref, sem, g_ref) = rest
        else:
            (ks_hbm, vs_hbm, out_ref, k_buf, ks_buf, vs_buf,
             acc_ref, m_ref, l_ref, sem, g_ref) = rest
        v_hbm = v_buf = None
    elif quantized:
        if deferred:
            (v_hbm, ks_hbm, vs_hbm, kcur_ref, vcur_ref, out_ref, k_buf,
             v_buf, ks_buf, vs_buf, acc_ref, m_ref, l_ref, sem,
             g_ref) = rest
        else:
            (v_hbm, ks_hbm, vs_hbm, out_ref, k_buf, v_buf, ks_buf, vs_buf,
             acc_ref, m_ref, l_ref, sem, g_ref) = rest
    elif single_kv:
        # MLA latent MQA (pv_width: PV reads the first pv_width lanes of the
        # latent K buffer, ref: mla/common.py:1851) or fused [K‖V] pages
        # (K = [..., :D], V = [..., D:]) — either way ONE pool, ONE buffer
        if deferred:
            (kcur_ref, out_ref, k_buf, acc_ref, m_ref, l_ref, sem,
             g_ref) = rest
        else:
            (out_ref, k_buf, acc_ref, m_ref, l_ref, sem, g_ref) = rest
        v_hbm = v_buf = ks_hbm = vs_hbm = ks_buf = vs_buf = None
    else:
        if deferred:
            (v_hbm, kcur_ref, vcur_ref, out_ref, k_buf, v_buf, acc_ref,
             m_ref, l_ref, sem, g_ref) = rest
        else:
            (v_hbm, out_ref, k_buf, v_buf, acc_ref, m_ref, l_ref, sem,
             g_ref) = rest
        ks_hbm = vs_hbm = ks_buf = vs_buf = None
    t_idx = pl.program_id(0)
    hkv = k_buf.shape[1]
    d = q_ref.shape[3]
    bs = k_hbm.shape[2]
    ppc = ckv // bs
    rows = NR * g

    req0 = t_idx * NR
    sls = [seq_lens_ref[req0 + rr] for rr in range(NR)]
    # Deferred mode: the current token (position sl-1) is NOT read from the
    # pool — it gets a closed-form rank-1 online-softmax update after the
    # chunk loop (cheaper than blending the fresh row into the KV buffer:
    # the per-request slab RMW blends cost ~25us/call measured,
    # tools/perf/decode_attn_probe.py). Buffer masks/DMA reach therefore use
    # the context length EXCLUDING the current token.
    ctxs = [jnp.maximum(sl - 1, 0) for sl in sls] if deferred else sls
    max_sl = ctxs[0]
    for rr in range(1, NR):
        max_sl = jnp.maximum(max_sl, ctxs[rr])
    num_chunks = (max_sl + ckv - 1) // ckv

    nb_total = k_hbm.shape[0]

    def chunk_dma_t(tile, c, slot, kind):
        # tile-parametrized so a tile can PREFETCH the NEXT tile's first
        # chunk (cross-tile pipelining): reach conditions read that tile's
        # seq lens straight from the prefetched scalars
        for rr in range(NR):  # static unroll
            base = (tile * NR + rr) * maxb + c * ppc
            for p in range(ppc):
                # page-level skip: only DMA pages the request's context
                # actually reaches (chunk-level gating alone read the whole
                # CKV span — up to ~45% wasted KV traffic at short contexts).
                # DCP: non-local pages carry an out-of-range sentinel
                # (parallel/dcp.py DCP_SENTINEL) — skip those too.
                # Deferred: position sl-1 lives in kcur, not the pool.
                reach = c * ckv + p * bs + (1 if deferred else 0) < (
                    seq_lens_ref[tile * NR + rr]
                )
                if dcp:
                    reach &= bt_ref[base + p] < nb_total

                @pl.when(reach)
                def _(p=p):
                    page = bt_ref[base + p]
                    off = rr * ckv + p * bs
                    # all of a request's page DMAs share one semaphore per
                    # kind (waits are byte-counted, so per-descriptor waits
                    # stay exact) — per-page semaphores blow the 2KB sflag
                    # space at NR=16 (2·kinds·NR·ppc flags)
                    dmas = [
                        pltpu.make_async_copy(
                            k_hbm.at[page],
                            k_buf.at[slot, :, pl.ds(off, bs)],
                            sem.at[slot, 0, rr],
                        ),
                    ]
                    if not single_kv:
                        dmas.append(
                            pltpu.make_async_copy(
                                v_hbm.at[page],
                                v_buf.at[slot, :, pl.ds(off, bs)],
                                sem.at[slot, 1, rr],
                            )
                        )
                    if quantized and not skip_scale_dma:
                        dmas.append(
                            pltpu.make_async_copy(
                                ks_hbm.at[page],
                                ks_buf.at[slot, :, pl.ds(off, bs)],
                                sem.at[slot, 2, rr],
                            )
                        )
                        dmas.append(
                            pltpu.make_async_copy(
                                vs_hbm.at[page],
                                vs_buf.at[slot, :, pl.ds(off, bs)],
                                sem.at[slot, 3, rr],
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

    # Cross-tile pipelining: at 1 chunk/tile (the common decode shape) the
    # old per-tile double buffer had nothing to overlap — every tile paid
    # its full DMA latency serially (~7us/tile measured,
    # tools/perf/decode_attn_probe.py). Chunks now stream through the two
    # buffer slots by GLOBAL parity (g_ref, SMEM, carried across grid
    # steps), and each tile's last chunk prefetches the NEXT tile's first
    # chunk, so tile t+1's KV is in flight during tile t's compute.
    nt_tiles = pl.num_programs(0)

    @pl.when(t_idx == 0)
    def _():
        g_ref[0] = 0
        chunk_dma_t(0, 0, 0, "start")

    g0 = g_ref[0]

    @pl.when(num_chunks == 0)
    def _():
        # keep the prefetch chain alive through all-pad / all-fresh tiles
        @pl.when(t_idx + 1 < nt_tiles)
        def _():
            chunk_dma_t(t_idx + 1, 0, g0 % 2, "start")

    # per-row (NR*G,1) ctx lens & per-column (1, NR*CKV) request slot
    row_sl = jnp.concatenate(
        [jnp.full((g, 1), sl, jnp.int32) for sl in ctxs], axis=0
    )  # (NR*G, 1) — pool positions < row_sl are valid for the row
    row_true = (
        jnp.concatenate(
            [jnp.full((g, 1), sl, jnp.int32) for sl in sls], axis=0
        )
        if deferred
        else row_sl
    )  # true seq lens (window anchor; deferred excludes the fresh token)
    col_sl = jnp.concatenate(
        [jnp.full((1, ckv), sl, jnp.int32) for sl in ctxs], axis=1
    )  # (1, NR*CKV) — ctx len of the COLUMN's request
    col_in_req = jax.lax.broadcasted_iota(jnp.int32, (1, NR * ckv), 1) % ckv
    # 3D copies for the V mask: Mosaic cannot insert a minor dim on i1
    # vectors (tpu.reshape of (1,NR*CKV) bool → (1,NR*CKV,1) fails to
    # compile), so build the comparison directly at the broadcast shape
    col_in_req3 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, NR * ckv, 1), 1) % ckv
    )
    col_sl3 = jnp.concatenate(
        [jnp.full((1, ckv, 1), sl, jnp.int32) for sl in ctxs], axis=1
    )  # (1, NR*CKV, 1)
    row_rr = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // g
    col_rr = jax.lax.broadcasted_iota(jnp.int32, (1, NR * ckv), 1) // ckv
    same_req = row_rr == col_rr  # (NR*G, NR*CKV)

    # int8×int8 QK operands (int8-KV mode): quantize q ONCE per tile —
    # 4K elements — so chunks skip the (HKV, NR*CKV, D) K dequant-convert.
    # fp8 pools keep the convert path (no fp8×int8 MXU mode).
    int8_qk = quantized and k_buf.dtype == jnp.int8
    if int8_qk:
        _qf = q_ref[0].astype(jnp.float32)
        _qamax = jnp.max(jnp.abs(_qf), axis=2, keepdims=True)
        q_scale = jnp.maximum(_qamax, 1e-8) * (1.0 / 127.0)
        q_int8 = jnp.clip(
            jnp.round(_qf / q_scale), -127.0, 127.0
        ).astype(jnp.int8)
    else:
        q_int8 = q_scale = None

    @pl.when(num_chunks > 0)
    def _():
        def chunk_body(c, _):
            slot = (g0 + c) % 2
            nslot = (g0 + c + 1) % 2

            @pl.when(c + 1 < num_chunks)
            def _():
                chunk_dma_t(t_idx, c + 1, nslot, "start")

            @pl.when((c + 1 == num_chunks) & (t_idx + 1 < nt_tiles))
            def _():
                chunk_dma_t(t_idx + 1, 0, nslot, "start")

            chunk_dma_t(t_idx, c, slot, "wait")

            kv_pos = c * ckv + col_in_req  # (1, NR*CKV)
            # columns whose request skipped this chunk's DMA hold stale/
            # uninitialized buffer data (NaN in interpret mode): p is 0 there
            # via the score mask, but 0*NaN = NaN in the PV matmul, so V (and
            # its scales) must be zeroed on invalid columns too
            col_ok = kv_pos < col_sl  # (1, NR*CKV)
            mask = same_req & (kv_pos < row_sl)  # (NR*G, NR*CKV)
            if dcp:
                # only columns whose page this rank owns contribute locally
                # (sentinel pages skipped the DMA → stale buffer data)
                segs = []
                for rr in range(NR):
                    base = (req0 + rr) * maxb + c * ppc
                    for pg in range(ppc):
                        segs.append(
                            jnp.broadcast_to(
                                bt_ref[base + pg], (1, bs)
                            )
                        )
                owned = jnp.concatenate(segs, axis=1) < nb_total  # (1,NR*CKV)
                col_ok &= owned
                mask &= owned
            if sliding_window > 0:
                # window anchored at the TRUE last position (the current
                # token), even when that token itself is handled by the
                # post-loop rank-1 update
                mask &= kv_pos > (row_true - 1) - sliding_window
            mask = mask[None]  # (1, NR*G, NR*CKV) broadcasts over HKV

            q_all = q_ref[0]  # (HKV, NR*G, D)
            k_full = k_buf[slot]  # (HKV, NR*CKV, D | 2D | latent)
            if fused:
                v_all = k_full[:, :, d:]
                k_all = k_full[:, :, :d]
            elif pv_width:
                k_all = k_full
                v_all = k_full[:, :, :pv_width]
            else:
                k_all = k_full
                v_all = v_buf[slot]
            if int8_qk:
                # int8×int8 QK on the MXU (q quantized once per tile above)
                # instead of dequant-converting the whole (HKV, NR*CKV, D)
                # K buffer to bf16 (2.1M VPU converts/tile, the largest
                # single compute term measured by
                # tools/perf/decode_attn_probe.py). s then carries
                # row-scale × col-scale epilogues.
                s = jax.lax.dot_general(
                    q_int8,
                    k_all,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                s = s * ks_buf[slot][:, None, :]
                s = s * (q_scale * sm_scale)
            elif quantized:
                s = jax.lax.dot_general(
                    q_all,
                    k_all.astype(q_all.dtype),
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                s = s * ks_buf[slot][:, None, :]
                s = s * sm_scale
            else:
                s = jax.lax.dot_general(
                    q_all,
                    k_all,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (HKV, NR*G, NR*CKV)
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
                # invalid columns are killed by vs == 0 (p·vs exact 0), and
                # int8→bf16 conversion can never produce NaN — so the
                # (HKV, NR*CKV, D)-wide V zeroing the bf16 path needs is
                # unnecessary here (saves ~2M VPU ops/tile)
                vs = jnp.where(col_ok, vs_buf[slot], 0.0)  # (HKV, NR*CKV)
                p = p * vs[:, None, :]
                v_mm = v_all.astype(q_all.dtype)
            else:
                v_mm = v_all
                col_ok3 = (c * ckv + col_in_req3) < col_sl3  # (1, NR*CKV, 1)
                if dcp:
                    segs3 = []
                    for rr in range(NR):
                        base = (req0 + rr) * maxb + c * ppc
                        for pg in range(ppc):
                            segs3.append(
                                jnp.broadcast_to(bt_ref[base + pg], (1, bs, 1))
                            )
                    col_ok3 &= jnp.concatenate(segs3, axis=1) < nb_total
                # bf16 pools can hold NaN in never-written page slots; a
                # masked p of exact 0 still yields 0*NaN = NaN in the PV
                # matmul, so V must be zeroed on invalid columns
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
        g_ref[0] = (g0 + num_chunks) % 2

    if deferred:
        # Rank-1 online-softmax update for the current token (position
        # sl-1, supplied via kcur/vcur — the pool row is written later by
        # the batched all-layer commit). Mathematically the same online
        # softmax as processing it in-chunk, at ~33K VPU ops instead of
        # per-request slab blends.
        from vllm_metax_tpu.ops.kv_cache import (
            _FP8_E5M2_MAX,
            _FP8_MAX,
            _INT8_MAX,
        )

        def quant_match(x):  # (HKV, NR, Dx) f32 → the values later steps
            # read back from the pool (same formula as ops/kv_cache.py
            # _quantize_kv, then dequantized)
            if not quantized:
                return x
            qmax = (
                _INT8_MAX if k_buf.dtype == jnp.int8
                else _FP8_E5M2_MAX if k_buf.dtype == jnp.float8_e5m2
                else _FP8_MAX
            )
            amax = jnp.max(jnp.abs(x), axis=2, keepdims=True)
            scale = jnp.maximum(amax / qmax, 1e-10)
            qv = x / scale
            if k_buf.dtype == jnp.int8:
                qv = jnp.clip(jnp.round(qv), -_INT8_MAX, _INT8_MAX)
            else:
                qv = qv.astype(k_buf.dtype).astype(jnp.float32)
            return qv * scale

        def rows(x):  # (HKV, NR, Dx) → (HKV, NR*G, Dx), request → its G rows
            parts = [
                jnp.broadcast_to(
                    x[:, rr : rr + 1, :], (x.shape[0], g, x.shape[2])
                )
                for rr in range(NR)
            ]
            return jnp.concatenate(parts, axis=1)

        q_all_f32 = q_ref[0].astype(jnp.float32)  # (HKV, NR*G, D)
        kc_all = kcur_ref[0].astype(jnp.float32)  # (HKV, NR, D | 2D)
        if fused:
            kc = quant_match(kc_all[:, :, :d])
            vc = quant_match(kc_all[:, :, d:])
        elif pv_width:
            kc = kc_all
            vc = kc_all[:, :, :pv_width]
        else:
            kc = quant_match(kc_all)
            vc = quant_match(vcur_ref[0].astype(jnp.float32))

        s_cur = jnp.sum(
            q_all_f32 * rows(kc), axis=2, keepdims=True
        )  # (HKV, NR*G, 1)
        s_cur = s_cur * sm_scale
        if logits_soft_cap > 0.0:
            s_cur = logits_soft_cap * jnp.tanh(s_cur / logits_soft_cap)
        valid = row_true > 0  # (NR*G, 1) — pad rows have no fresh token
        if dcp:
            # only the rank owning the fresh token's page applies the update
            own_parts = []
            for rr in range(NR):
                last = jnp.maximum(sls[rr] - 1, 0)
                pg = bt_ref[(req0 + rr) * maxb + last // bs]
                own_parts.append(
                    jnp.broadcast_to(pg < nb_total, (g, 1))
                )
            valid &= jnp.concatenate(own_parts, axis=0)
        valid3 = valid[None]  # (1, NR*G, 1)
        s_cur = jnp.where(valid3, s_cur, _NEG_INF)
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_new = jnp.maximum(m_prev, s_cur)
        alpha = jnp.exp(m_prev - m_new)
        p_cur = jnp.where(valid3, jnp.exp(s_cur - m_new), 0.0)
        l_ref[...] = l_prev * alpha + p_cur
        acc_ref[...] = acc_ref[...] * alpha + p_cur * rows(vc)
        m_ref[...] = m_new

    out_ref[0] = (
        acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
    ).astype(out_ref.dtype)
    if return_lse:
        l = l_ref[...]
        lse_ref[0] = jnp.where(
            l > 0.0,
            m_ref[...] + jnp.log(jnp.maximum(l, 1e-30)),
            _NEG_INF,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "sliding_window", "logits_soft_cap", "pv_width",
        "dcp", "return_lse", "interpret", "_probe_skip_scale_dma",
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
    k_cur: jnp.ndarray | None = None,  # (T, HKV, D) deferred-write current K
    v_cur: jnp.ndarray | None = None,
    dcp: bool = False,  # block tables hold rank-local ids + OOB sentinels
    return_lse: bool = False,  # also return per-row log-sum-exp (T, HQ) f32
    interpret: bool = False,
    _probe_skip_scale_dma: bool = False,  # perf probe only — WRONG results
):
    t, hq, d = q.shape
    nb, hkv, bs, dk = kv_cache.k.shape
    g = hq // hkv
    d_out = pv_width or d
    r, maxb = metadata.block_tables.shape
    nt = r // NR
    ckv = min(bs * 16, 256)
    if ckv % bs:
        ckv = bs
    deferred = k_cur is not None
    # fused [K‖V] pool: one page DMA delivers both sides (half the DMA
    # descriptors); kernel slices K = [..., :d], V = [..., d:]
    fused = bool(not pv_width and kv_cache.v.shape[-1] == 0 and dk == 2 * d)
    if fused and deferred:
        k_cur = jnp.concatenate([k_cur, v_cur], axis=-1)
        v_cur = None

    # (R, HQ, D) → (NT, HKV, NR*G, D): row rr*G+gi of tile t is request
    # t*NR+rr, group gi — pure transpose, no gathers
    q_tiled = (
        q[:r]
        .reshape(nt, NR, hkv, g, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(nt, hkv, NR * g, d)
    )

    def cur_tiled(x):  # (T, HKV, D) → (NT, HKV, NR, D), same tiling as q
        return x[:r].reshape(nt, NR, hkv, -1).transpose(0, 2, 1, 3)

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
        pltpu.VMEM((2, hkv, NR * ckv, dk), kv_cache.k.dtype),
    ]
    if not pv_width and not fused:
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
    if deferred:
        dc = k_cur.shape[-1]  # D, or 2D for fused [K‖V] rows
        in_specs.append(
            pl.BlockSpec((1, hkv, NR, dc), lambda i, *_: (i, 0, 0, 0))
        )
        inputs.append(cur_tiled(k_cur))
        if not pv_width and not fused:
            in_specs.append(
                pl.BlockSpec((1, hkv, NR, d), lambda i, *_: (i, 0, 0, 0))
            )
            inputs.append(cur_tiled(v_cur))
    scratch += [
        pltpu.VMEM((hkv, NR * g, d_out), jnp.float32),
        pltpu.VMEM((hkv, NR * g, 1), jnp.float32),
        pltpu.VMEM((hkv, NR * g, 1), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 4 if quantized else 2, NR)),
        pltpu.SMEM((1,), jnp.int32),
    ]
    out_specs = pl.BlockSpec(
        (1, hkv, NR * g, d_out), lambda i, *_: (i, 0, 0, 0)
    )
    out_shape = jax.ShapeDtypeStruct((nt, hkv, NR * g, d_out), q.dtype)
    if return_lse:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, hkv, NR * g, 1), lambda i, *_: (i, 0, 0, 0)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((nt, hkv, NR * g, 1), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
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
        fused=fused,
        deferred=deferred,
        dcp=dcp,
        return_lse=return_lse,
        skip_scale_dma=_probe_skip_scale_dma,
    )
    result = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    out_tiled = result[0] if return_lse else result

    out = (
        out_tiled.reshape(nt, hkv, NR, g, d_out)
        .transpose(0, 2, 1, 3, 4)
        .reshape(r, hq, d_out)
    )
    if t > r:
        out = jnp.concatenate(
            [out, jnp.zeros((t - r, hq, d_out), out.dtype)], axis=0
        )
    if not return_lse:
        return out
    lse = (
        result[1]
        .reshape(nt, hkv, NR, g)
        .transpose(0, 2, 1, 3)
        .reshape(r, hq)
    )
    if t > r:
        lse = jnp.concatenate(
            [lse, jnp.full((t - r, hq), _NEG_INF, jnp.float32)], axis=0
        )
    return out, lse
