"""Pallas unified ragged paged attention (mixed prefill+decode, one kernel).

TPU-native replacement for the reference's attention stack:
- kernel_unified_attention_2d (attention/ops/triton_unified_attention.py:57)
  — mixed prefill+decode over a block-table KV cache
- paged_attention_v1/v2 (csrc/attention/paged_attention_v1.cu) — decode
- the varlen FA2 path (v1/attention/backends/flash_attn.py:596)

Design (TPU-first, not a translation):
- The ragged token batch is re-tiled into fixed (TQ)-row q tiles, one grid
  step per (request, q-tile): `tile_req[t]`/`tile_qoff[t]` scalar-prefetch
  arrays drive which request a tile belongs to. Decode rows get TQ=8 tiles
  (one request per tile), prefill chunks get TQ=128 — both from the same
  kernel, selected statically per compiled bucket.
- q is pre-arranged in XLA to (NT, HKV, TQ*G, D) so every kernel operand is a
  direct slice — no in-kernel reshapes (Mosaic relayouts are the enemy).
- KV pages are DMA'd HBM→VMEM by page id from the scalar-prefetched block
  table, CKV tokens (PPC pages) per inner step, double-buffered so the next
  chunk's DMA overlaps the current chunk's compute — the Pallas analog of the
  CUDA kernels' cp.async pipelining.
- Online softmax (flash-style m/l/acc) in f32 VMEM scratch across KV chunks;
  causal + seq-len (+ sliding-window, + soft-cap) masks applied in-kernel.
- The tiled output is scattered back to token rows with one XLA gather.

The XLA reference implementation (ops/attention.py ragged_paged_attention_xla)
defines the exact math; interpret-mode tests compare against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_metax_tpu.ops.kv_cache import KVCache

_NEG_INF = -1e30


def pallas_attention_supported(q, kv_cache: KVCache, md) -> bool:
    t, hq, d = q.shape
    nb, hkv, bs, dk = kv_cache.k.shape
    if kv_cache.quantized and bs % 128:
        # quantized-KV scale pages DMA as 128-lane slices: needs block
        # size a multiple of 128 (config default coerces for quantized KV)
        return False
    return d % 128 == 0 and hq % hkv == 0 and bs % 8 == 0


def _attn_kernel(
    # scalar prefetch
    tile_req_ref,  # (NT,) i32 request per tile (-1 = empty)
    seq_lens_ref,  # (R,) i32
    rs_ref,  # (R,) i32 scheduled-region start (seq_len - n_scheduled)
    bt_ref,  # (R*MAXB,) i32 flat block tables
    tok0_ref,  # (NT,) i32 first token row of each tile (contiguous run)
    # array inputs
    q_hbm,  # (HKV, T+TQ, G, D) ANY — the kernel DMAs its tile's rows
    pos_ref,  # (1, TQ*G, 1) i32 VMEM; -1 on invalid rows
    *rest,  # [bits_ref if tree], k_hbm, v_hbm,
    #         [k_scale_hbm, v_scale_hbm (NB, HKV, BS) ANY,] out, scratch...
    sm_scale,
    ckv,
    maxb,
    sliding_window,
    logits_soft_cap,
    quantized,
    tree,
    fused,
    tq,
):
    bits_ref = None
    rest = list(rest)
    if tree:
        bits_ref = rest.pop(0)
    k_hbm = rest.pop(0)
    # fused [K‖V] pools: one HBM pool of 2D-wide pages, one VMEM buffer,
    # half the DMA descriptors; K/V are lane slices at compute time
    v_hbm = None if fused else rest.pop(0)
    if quantized and fused:
        (ks_hbm, vs_hbm, out_ref, k_buf, ks_buf, vs_buf,
         acc_ref, m_ref, l_ref, state_ref, sem, q_buf, q_sem) = rest
        v_buf = None
    elif quantized:
        (ks_hbm, vs_hbm, out_ref, k_buf, v_buf, ks_buf, vs_buf,
         acc_ref, m_ref, l_ref, state_ref, sem, q_buf, q_sem) = rest
    elif fused:
        (out_ref, k_buf, acc_ref, m_ref, l_ref, state_ref, sem,
         q_buf, q_sem) = rest
        ks_hbm = vs_hbm = ks_buf = vs_buf = v_buf = None
    else:
        (out_ref, k_buf, v_buf, acc_ref, m_ref, l_ref, state_ref,
         sem, q_buf, q_sem) = rest
        ks_hbm = vs_hbm = ks_buf = vs_buf = None
    t_idx = pl.program_id(0)
    req = tile_req_ref[t_idx]
    hkv = k_buf.shape[1]
    rows = out_ref.shape[2]  # TQ*G
    d = out_ref.shape[3]
    bs = k_hbm.shape[2]
    ppc = ckv // bs

    valid_tile = req >= 0

    @pl.when(t_idx == 0)
    def _():
        state_ref[0] = -1

    @pl.when(jnp.logical_not(valid_tile))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(valid_tile)
    def _():
        # each tile's q rows are one CONTIGUOUS run of the token batch —
        # fetched here instead of a host-side gather+retile
        q_dma = pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(tok0_ref[t_idx], tq)], q_buf, q_sem
        )
        q_dma.start()
        seq_len = seq_lens_ref[jnp.maximum(req, 0)]
        qp = pos_ref[0]  # (TQ*G, 1); -1 on invalid rows
        # last valid q position in this tile bounds the causal KV range
        max_q_pos = jnp.max(qp)
        kv_limit = jnp.minimum(seq_len, max_q_pos + 1)
        if tree:
            # tree rows attend ancestor SLOTS which can sit beyond their
            # depth-based position — scan the full context for such tiles
            bits = bits_ref[0]  # (TQ*G, 1) i32 ancestor masks (0 = causal)
            has_tree = jnp.sum((bits != 0).astype(jnp.int32)) > 0
            kv_limit = jnp.where(has_tree, seq_len, kv_limit)
            rs = rs_ref[jnp.maximum(req, 0)]
        num_chunks = jnp.maximum((kv_limit + ckv - 1) // ckv, 1)

        def chunk_dma(c, slot, kind, dma_req=None):
            base = (req if dma_req is None else dma_req) * maxb + (c * ppc)

            for p in range(ppc):  # static unroll: back-to-back DMA issue
                page = bt_ref[base + p]
                dmas = [
                    pltpu.make_async_copy(
                        k_hbm.at[page],
                        k_buf.at[slot, :, pl.ds(p * bs, bs)],
                        sem.at[slot, 0, p],
                    ),
                ]
                if not fused:
                    dmas.append(
                        pltpu.make_async_copy(
                            v_hbm.at[page],
                            v_buf.at[slot, :, pl.ds(p * bs, bs)],
                            sem.at[slot, 1, p],
                        )
                    )
                if quantized:
                    # head-major scale pages (H, BS) land directly in the
                    # (HKV, CKV) orientation the score multiply wants
                    dmas.append(
                        pltpu.make_async_copy(
                            ks_hbm.at[page],
                            ks_buf.at[slot, :, pl.ds(p * bs, bs)],
                            sem.at[slot, 2, p],
                        )
                    )
                    dmas.append(
                        pltpu.make_async_copy(
                            vs_hbm.at[page],
                            vs_buf.at[slot, :, pl.ds(p * bs, bs)],
                            sem.at[slot, 3, p],
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

        # Cross-tile prefetch: the previous tile started our chunk-0 DMA
        # while it was still computing (state_ref = [prefetched_tile, slot],
        # persisted across grid steps), hiding the first-chunk DMA latency
        # that otherwise stalls every tile of a decode batch.
        prefetched = state_ref[0] == t_idx
        slot0 = jnp.where(prefetched, state_ref[1], 0)

        @pl.when(jnp.logical_not(prefetched))
        def _():
            chunk_dma(0, 0, "start")

        q_dma.wait()

        def chunk_body(c, _):
            slot = (slot0 + c) % 2

            @pl.when(c + 1 < num_chunks)
            def _():
                chunk_dma(c + 1, (slot0 + c + 1) % 2, "start")

            chunk_dma(c, slot, "wait")

            kv_pos = c * ckv + jax.lax.broadcasted_iota(
                jnp.int32, (1, rows, ckv), 2
            )  # (1, TQ*G, CKV)
            qp3 = qp[None]  # (1, TQ*G, 1)
            mask = (kv_pos <= qp3) & (kv_pos < seq_len) & (qp3 >= 0)
            if sliding_window > 0:
                mask &= kv_pos > qp3 - sliding_window
            if tree:
                # ancestor-bitmask rows (ref: tree_attn.py): committed
                # context < region_start fully visible; within the region
                # only ancestor slots (bit j of the row's mask)
                bits3 = bits[None]  # (1, TQ*G, 1) i32
                rel = kv_pos - rs
                bit = (
                    jax.lax.shift_right_logical(
                        jnp.broadcast_to(bits3, kv_pos.shape),
                        jnp.clip(rel, 0, 31),
                    )
                    & 1
                )
                tmask = (
                    (kv_pos < rs) | ((rel >= 0) & (rel < 32) & (bit == 1))
                ) & (kv_pos < seq_len) & (qp3 >= 0)
                mask = jnp.where(bits3 != 0, tmask, mask)

            # all kv heads in one batched pass (HKV as the batch dim): one
            # matmul + one softmax-update op sequence instead of HKV small
            # ones — per-op overhead dominated the decode path otherwise
            # (HKV, TQ, G, D) staged rows → (HKV, TQ*G, D): adjacent-dim
            # merge, layout-free
            q_all = q_buf[...].reshape(hkv, rows, d)
            if fused:
                k_full = k_buf[slot]  # (HKV, CKV, 2D) = [K‖V]
                k_all = k_full[:, :, :d]
                v_all = k_full[:, :, d:]
            else:
                k_all = k_buf[slot]  # (HKV, CKV, D)
                v_all = v_buf[slot]
            if quantized:
                # int8/fp8 KV: cast for the MXU; per-token scales fold into
                # the scores (k) and the probabilities (v) — O(CKV) work per
                # head instead of O(CKV*D) dequant
                k_all = k_all.astype(q_all.dtype)
            s = jax.lax.dot_general(
                q_all,
                k_all,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (HKV, TQ*G, CKV)
            if quantized:
                s = s * ks_buf[slot][:, None, :]  # (HKV, 1, CKV)
            s = s * sm_scale
            if logits_soft_cap > 0.0:
                s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)
            s = jnp.where(mask, s, _NEG_INF)

            m_prev = m_ref[...]  # (HKV, TQ*G, 1)
            l_prev = l_ref[...]
            m_cur = jnp.max(s, axis=2, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)  # masked lanes → exp(-inf)=0
            alpha = jnp.exp(m_prev - m_new)
            l_ref[...] = l_prev * alpha + jnp.sum(p, axis=2, keepdims=True)

            if quantized:
                p = p * vs_buf[slot][:, None, :]
                v_mm = v_all.astype(q_all.dtype)
            else:
                v_mm = v_all
            pv = jax.lax.dot_general(
                p.astype(v_mm.dtype),
                v_mm,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (HKV, TQ*G, D)
            acc_ref[...] = acc_ref[...] * alpha + pv
            m_ref[...] = m_new
            return 0

        # start the NEXT tile's chunk-0 DMA into the slot our last chunk
        # didn't occupy, then compute the epilogue while it flies
        last_slot = (slot0 + num_chunks - 1) % 2
        pf_slot = (last_slot + 1) % 2
        nt_total = pl.num_programs(0)
        next_req = jnp.where(
            t_idx + 1 < nt_total,
            tile_req_ref[jnp.minimum(t_idx + 1, nt_total - 1)],
            -1,
        )

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

        @pl.when(next_req >= 0)
        def _():
            chunk_dma(0, pf_slot, "start", dma_req=next_req)
            state_ref[0] = t_idx + 1
            state_ref[1] = pf_slot

        @pl.when(next_req < 0)
        def _():
            state_ref[0] = -1

        out_ref[:, 0] = (
            acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "sliding_window", "logits_soft_cap", "interpret"),
)
def ragged_paged_attention_pallas(
    q: jnp.ndarray,  # (T, HQ, D)
    kv_cache: KVCache,
    metadata,
    sm_scale: float,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    t, hq, d = q.shape
    nb, hkv, bs, dk = kv_cache.k.shape
    g = hq // hkv
    # fused [K‖V] pool: one page DMA delivers both sides
    fused = bool(kv_cache.v.shape[-1] == 0 and dk == 2 * d)
    r, maxb = metadata.block_tables.shape
    qsl = metadata.query_start_loc  # (R+1,)

    # ---- tiled layout (computed in XLA from the metadata; no host round-trip)
    tq = 8 if t <= 2 * r else 128
    nt = r + t // tq  # static upper bound on tiles
    ckv = min(bs * 16, 256)
    if ckv % bs:
        ckv = bs

    qlen = qsl[1:] - qsl[:-1]  # (R,)
    ntiles = (qlen + tq - 1) // tq  # (R,)
    tile_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(ntiles).astype(jnp.int32)]
    )  # (R+1,)
    total_tiles = tile_off[-1]
    slots = jnp.arange(nt, dtype=jnp.int32)
    tile_req = jnp.searchsorted(tile_off[1:], slots, side="right").astype(jnp.int32)
    tile_req = jnp.where(slots < total_tiles, tile_req, -1)

    # gather q into the tiled (NT, HKV, TQ*G, D) layout
    rows = jnp.arange(nt * tq, dtype=jnp.int32)
    row_tile = rows // tq
    row_in_tile = rows % tq
    row_req = tile_req[row_tile]
    row_off = (row_tile - tile_off[jnp.maximum(row_req, 0)]) * tq + row_in_tile
    row_valid = (row_req >= 0) & (row_off < qlen[jnp.maximum(row_req, 0)])
    row_tok = jnp.where(row_valid, qsl[jnp.maximum(row_req, 0)] + row_off, 0)
    # head-major relayout ONLY (tq-row tail pad keeps the kernel's
    # contiguous tile DMA in bounds); the kernel fetches each tile's rows
    # itself — no host-side gather/retile at all (the XLA gather cost
    # ~1ms/layer-call at 4096-token prefill chunks, profile_prefill.py).
    # The token dim stays MAJOR (dim 1) so the slice needs no sublane
    # alignment (tok0 is an arbitrary qsl offset).
    q_pad = jnp.pad(q, ((0, tq), (0, 0), (0, 0)))
    q_t = q_pad.reshape(t + tq, hkv, g, d).transpose(1, 0, 2, 3)
    tile_tok0 = jnp.where(
        tile_req >= 0,
        qsl[jnp.maximum(tile_req, 0)]
        + (slots - tile_off[jnp.maximum(tile_req, 0)]) * tq,
        0,
    ).astype(jnp.int32)
    pos_rows = jnp.where(row_valid, metadata.positions[row_tok], -1).astype(
        jnp.int32
    )
    pos_tiled = jnp.repeat(
        pos_rows.reshape(nt, tq), g, axis=1
    ).reshape(nt, tq * g, 1)
    tree = metadata.tree_bits is not None
    region_start = metadata.seq_lens - qlen.astype(jnp.int32)  # (R,)

    quantized = kv_cache.quantized
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, tq * g, 1), lambda i, *_: (i, 0, 0)),
    ]
    inputs = [
        tile_req,
        metadata.seq_lens,
        region_start,
        metadata.block_tables.reshape(-1),
        tile_tok0,
        q_t,
        pos_tiled,
    ]
    if tree:
        bits_rows = jnp.where(
            row_valid,
            metadata.tree_bits[row_tok].astype(jnp.int32),
            0,
        )
        inputs.append(
            jnp.repeat(bits_rows.reshape(nt, tq), g, axis=1).reshape(
                nt, tq * g, 1
            )
        )
        in_specs.append(pl.BlockSpec((1, tq * g, 1), lambda i, *_: (i, 0, 0)))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    inputs.append(kv_cache.k)
    scratch = [
        pltpu.VMEM((2, hkv, ckv, dk), kv_cache.k.dtype),
    ]
    if not fused:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(kv_cache.v)
        scratch.append(pltpu.VMEM((2, hkv, ckv, d), kv_cache.v.dtype))
    if quantized:
        # scales must stay in HBM: ANY may pick VMEM, where sub-128-lane
        # page slices violate Mosaic tiling
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ]
        inputs += [kv_cache.k_scale, kv_cache.v_scale]
        scratch += [
            pltpu.VMEM((2, hkv, ckv), jnp.float32),
            pltpu.VMEM((2, hkv, ckv), jnp.float32),
        ]
    scratch += [
        pltpu.VMEM((hkv, tq * g, d), jnp.float32),
        pltpu.VMEM((hkv, tq * g, 1), jnp.float32),
        pltpu.VMEM((hkv, tq * g, 1), jnp.float32),
        pltpu.SMEM((2,), jnp.int32),  # cross-tile prefetch state
        pltpu.SemaphoreType.DMA((2, 4 if quantized else 2, ckv // bs)),
        pltpu.VMEM((hkv, tq, g, d), q.dtype),  # in-kernel q staging
        pltpu.SemaphoreType.DMA(()),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (hkv, 1, tq * g, d), lambda i, *_: (0, i, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _attn_kernel,
        sm_scale=sm_scale,
        ckv=ckv,
        maxb=maxb,
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        quantized=quantized,
        tree=tree,
        fused=fused,
        tq=tq,
    )
    out_tiled = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hkv, nt, tq * g, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    # back to token-major: layout-preserving row gather along the token
    # dim, then ONE (T, HQ, D) relayout at the end
    out_rows = out_tiled.reshape(hkv, nt * tq, g, d)
    tok = jnp.arange(t, dtype=jnp.int32)
    tok_req = metadata.req_idx  # (T,)
    tok_off = tok - qsl[tok_req]
    tok_slot = (tile_off[tok_req] + tok_off // tq) * tq + tok_off % tq
    # padding tokens may compute bogus slots; clamp (their output is unused)
    tok_slot = jnp.clip(tok_slot, 0, nt * tq - 1)
    out = out_rows[:, tok_slot]  # (HKV, T, G, D)
    return out.transpose(1, 0, 2, 3).reshape(t, hq, d)
