"""Unified (ragged, paged) attention over the block-table KV cache.

Handles mixed prefill+decode token batches in one call, like the reference's
unified attention path (vllm_metax/attention/ops/triton_unified_attention.py:57
kernel_unified_attention_2d; classic decode analog csrc/attention/
paged_attention_v1.cu).

Two implementations behind one interface:
- XLA reference (this file): gather pages per request, masked softmax. Exact
  math, CPU-testable, used as the ground truth for the Pallas kernel.
- Pallas TPU kernel (ops/pallas/ragged_attention.py): flash-style streaming
  over pages with manual DMA double-buffering — the production path.

All shapes are static (bucketed by the runner); raggedness is expressed via
`seq_lens`, `query_start_loc`, and per-token `req_idx`/`positions` metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_metax_tpu import envs
from vllm_metax_tpu.ops.kv_cache import KVCache, gather_kv_for_requests

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


@jax.tree_util.register_dataclass
@dataclass
class AttentionMetadata:
    """Per-step device metadata built host-side by the runner (analog of the
    reference's FlashAttentionMetadata, v1/attention/backends/flash_attn.py:200).
    """

    slot_mapping: jnp.ndarray  # (T,) int32; pad = num_slots (OOB dropped)
    block_tables: jnp.ndarray  # (R, MAXB) int32
    seq_lens: jnp.ndarray  # (R,) int32 total ctx len incl. this step's tokens
    query_start_loc: jnp.ndarray  # (R+1,) int32 cumulative q counts
    req_idx: jnp.ndarray  # (T,) int32 token→request row (pad rows point at 0)
    positions: jnp.ndarray  # (T,) int32 absolute positions (also for rope)
    num_seqs: jnp.ndarray  # () int32
    # STATIC (host-known, part of the jit cache key): every live request has
    # exactly one query token this step — enables the request-batched decode
    # kernel (pad rows must carry seq_len 0)
    decode_only: bool = field(default=False, metadata=dict(static=True))
    # STATIC: mesh axis name sharding KV pages (decode-context parallelism).
    # When set, block_tables/slot_mapping are rank-LOCAL (parallel/dcp.py
    # localize_metadata) and attention does a distributed softmax over the
    # axis. Non-local blocks carry DCP_SENTINEL and must be masked.
    dcp_axis: Optional[str] = field(default=None, metadata=dict(static=True))
    # per-token LoRA adapter slot (0 = none); models thread it into their
    # apply_linear calls (vllm_metax_tpu/lora.py)
    lora_idx: Optional[jnp.ndarray] = None
    # TREE spec-decode verify (ref: v1/attention/backends/tree_attn.py):
    # per-token uint32 ancestor bitmask over its request's scheduled-region
    # rows (bit j = may attend to scheduled token j; self bit always set).
    # 0 = plain causal row. Limits tree verify regions to 32 rows.
    tree_bits: Optional[jnp.ndarray] = None
    # hybrid linear-attention models: per-request recurrent-state slot into
    # the KVCache lin_state/conv_state pools (padding rows carry RSLOT)
    state_idx: Optional[jnp.ndarray] = None
    # STATIC: vertical-slash sparse prefill (MInference pattern) for this
    # step — set by the runner for single-request long prefill chunks when
    # ModelConfig.sparse_attention == "vertical_slash". Tuple
    # (nnz_v, nnz_s, block_budget, last_w); route in
    # ragged_paged_attention → ops/sparse_attention.sparse_prefill_attention
    # (ref: csrc/attention/vertical_slash_index.cu)
    sparse_prefill: Optional[tuple] = field(
        default=None, metadata=dict(static=True)
    )
    # multimodal (Qwen2-VL family): precomputed image/video embeddings to
    # blend over the token embeddings at placeholder positions, and 3-row
    # t/h/w mrope positions (ops/rope.py mrope_rows). positions (above)
    # stays the SEQUENCE index — attention causality is unchanged; only the
    # rotary angle comes from mrope_positions.
    mm_embeds: Optional[jnp.ndarray] = None  # (T, H)
    mm_mask: Optional[jnp.ndarray] = None  # (T,) bool
    mrope_positions: Optional[jnp.ndarray] = None  # (3, T) int32
    # Qwen3-VL deepstack: per-early-layer visual features added to the
    # hidden states at image positions (K, T, H)
    mm_deepstack: Optional[jnp.ndarray] = None
    # Cascade / shared-prefix decode (ref: flash_attn.py:1013
    # cascade_attention): every live request shares the SAME leading KV
    # pages. cascade_blocks (CB,) holds those page ids (layer-local,
    # bucket-padded; columns >= cascade_len are masked); cascade_tables is
    # block_tables with the shared pages dropped (shifted left);
    # cascade_len () int32 = shared token count. Attention then reads the
    # shared prefix ONCE for the whole batch and LSE-merges with the
    # per-request suffix.
    cascade_blocks: Optional[jnp.ndarray] = None
    cascade_tables: Optional[jnp.ndarray] = None
    cascade_len: Optional[jnp.ndarray] = None


def layer_view(
    md: AttentionMetadata, layer_idx, nb_layer: int, slots_per_layer: int
) -> AttentionMetadata:
    """Rebase the step metadata onto layer `layer_idx`'s page range of the
    flat all-layer block pool (layer l owns pages [l*NB, (l+1)*NB)). Padding
    slots use an >=total sentinel, so the offset keeps them out of bounds."""
    import dataclasses

    return dataclasses.replace(
        md,
        slot_mapping=md.slot_mapping + layer_idx * slots_per_layer,
        block_tables=md.block_tables + layer_idx * nb_layer,
        cascade_blocks=(
            None
            if md.cascade_blocks is None
            else md.cascade_blocks + layer_idx * nb_layer
        ),
        cascade_tables=(
            None
            if md.cascade_tables is None
            else md.cascade_tables + layer_idx * nb_layer
        ),
    )


def defer_kv_supported(
    q: jnp.ndarray, kv_cache: KVCache, metadata: AttentionMetadata
) -> bool:
    """True when this step's attention can consume the current token's K/V
    directly (k_cur/v_cur) so the model may DEFER the cache write to one
    batched all-layer scatter after the layer scan (the per-layer scatter is
    overhead-bound: ~71µs × 2 × L per step). Requires a pure-decode step and
    a path that handles k_cur: the request-batched Pallas decode kernel or
    the XLA reference. DCP keeps eager writes (rank-local page ownership)."""
    if not metadata.decode_only or metadata.dcp_axis is not None:
        return False
    if envs.METAX_TPU_DECODE_EAGER:
        # experiment knob: write KV eagerly per layer (slab-bounce kernel)
        # and skip the in-kernel current-token blend (~25us/call cheaper,
        # tools/perf/decode_attn_probe.py eager vs deferred)
        return False
    impl = envs.METAX_TPU_ATTN_IMPL
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl != "pallas":
        return True  # XLA reference handles k_cur
    from vllm_metax_tpu.ops.pallas.decode_attention import (
        decode_attention_supported,
    )

    return decode_attention_supported(q, kv_cache, metadata)


def _sparse_prefill_route(q, kv_cache, metadata, sm_scale):
    """Vertical-slash sparse prefill for a SINGLE long-prefill chunk (the
    runner sets metadata.sparse_prefill only when the step is one request
    whose chunk fills the whole token bucket, so the q array length IS the
    chunk length and the chunk ends the context). KV context is gathered
    from request 0's pages; compute then drops from QL·CTX to
    QL·(budget·block_n + nnz_v) per head (ops/sparse_attention.py;
    ref: csrc/attention/vertical_slash_index.cu)."""
    from vllm_metax_tpu.ops.kv_cache import kv_fused_width
    from vllm_metax_tpu.ops.sparse_attention import (
        sparse_prefill_attention,
        sparse_prefill_attention_pallas,
    )

    nnz_v, nnz_s, budget, last_w = metadata.sparse_prefill
    t, hq, d = q.shape
    nb = kv_cache.k.shape[0]
    safe_bt = jnp.minimum(metadata.block_tables[:1], nb - 1)
    k_all, v_all = gather_kv_for_requests(
        kv_cache, safe_bt, jnp.float32,
        fused_width=kv_fused_width(kv_cache, d),
    )  # (1, CTX, HKV, D)
    impl = envs.METAX_TPU_SPARSE_IMPL
    on_tpu = jax.devices()[0].platform == "tpu"
    use_pallas = (
        impl == "pallas" or (impl == "auto" and on_tpu)
    ) and d % 128 == 0 and t % 128 == 0
    if use_pallas:
        # block-sparse kernel (128-wide blocks): DMAs each selected block
        # once instead of materializing per-(head, q-block) gathers
        return sparse_prefill_attention_pallas(
            q,
            k_all[0].astype(q.dtype),
            v_all[0].astype(q.dtype),
            sm_scale,
            nnz_v=nnz_v,
            nnz_s=nnz_s,
            block_budget=-(-budget // 2) if budget else 0,  # 64→128 blocks
            last_w=last_w,
            seq=metadata.seq_lens[0],
            interpret=not on_tpu,  # forced-pallas tests run on CPU
        )
    out = sparse_prefill_attention(
        q,
        k_all[0].astype(q.dtype),
        v_all[0].astype(q.dtype),
        sm_scale,
        nnz_v=nnz_v,
        nnz_s=nnz_s,
        block_budget=budget,
        last_w=last_w,
        seq=metadata.seq_lens[0],
    )
    return out


def ragged_paged_attention(
    q: jnp.ndarray,  # (T, HQ, D)
    kv_cache: KVCache,
    metadata: AttentionMetadata,
    sm_scale: float,
    sliding_window: int = 0,  # 0 = disabled
    logits_soft_cap: float = 0.0,  # 0 = disabled
    impl: Optional[str] = None,
    k_cur: Optional[jnp.ndarray] = None,  # (T, HKV, D): deferred-write mode —
    v_cur: Optional[jnp.ndarray] = None,  # current K/V not yet in the pool
) -> jnp.ndarray:
    impl = impl or envs.METAX_TPU_ATTN_IMPL
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if (
        metadata.sparse_prefill is not None
        and not metadata.decode_only
        and metadata.dcp_axis is None
        and metadata.tree_bits is None
        and sliding_window == 0
        and logits_soft_cap == 0.0
        and k_cur is None
    ):
        return _sparse_prefill_route(q, kv_cache, metadata, sm_scale)
    if metadata.tree_bits is not None and impl == "pallas":
        # tree-verify ancestor masks: the unified kernel handles them
        # in-kernel (bits operand); the decode kernel does not
        from vllm_metax_tpu.ops.pallas.ragged_attention import (
            pallas_attention_supported,
            ragged_paged_attention_pallas,
        )

        if k_cur is None and pallas_attention_supported(q, kv_cache, metadata):
            return ragged_paged_attention_pallas(
                q, kv_cache, metadata, sm_scale, sliding_window,
                logits_soft_cap,
            )
        impl = "xla"
    if (
        metadata.cascade_blocks is not None
        and metadata.decode_only
        and metadata.dcp_axis is None
        and metadata.tree_bits is None
        and sliding_window == 0
    ):
        # cascade / shared-prefix decode (ref: flash_attn.py:1013): ONE
        # batched pass over the shared prefix pages + per-request suffix
        # attention over the shifted tables, LSE-merged
        import dataclasses

        out1, lse1 = _cascade_prefix_attention(
            q, kv_cache, metadata, sm_scale, logits_soft_cap
        )
        md_sfx = dataclasses.replace(
            metadata,
            block_tables=metadata.cascade_tables,
            seq_lens=jnp.maximum(
                metadata.seq_lens - metadata.cascade_len, 0
            ),
            positions=jnp.maximum(
                metadata.positions - metadata.cascade_len, 0
            ),
            cascade_blocks=None,
            cascade_tables=None,
            cascade_len=None,
        )
        sfx_pallas = False
        if impl == "pallas":
            from vllm_metax_tpu.ops.pallas.decode_attention import (
                decode_attention_supported,
                paged_decode_attention_pallas,
            )

            sfx_pallas = decode_attention_supported(q, kv_cache, md_sfx)
        if sfx_pallas:
            out2, lse2 = paged_decode_attention_pallas(
                q, kv_cache, md_sfx, sm_scale, 0, logits_soft_cap,
                k_cur=k_cur, v_cur=v_cur, return_lse=True,
            )
        else:
            out2, lse2 = ragged_paged_attention_xla(
                q, kv_cache, md_sfx, sm_scale, 0, logits_soft_cap,
                k_cur=k_cur, v_cur=v_cur, return_lse=True,
            )
        out, _ = merge_attn_states(
            out1.astype(jnp.float32), lse1,
            out2.astype(jnp.float32), lse2,
        )
        return out.astype(q.dtype)
    if metadata.dcp_axis is not None:
        if impl == "pallas" and metadata.decode_only and k_cur is None:
            from vllm_metax_tpu.ops.pallas.decode_attention import (
                decode_attention_supported,
                paged_decode_attention_pallas,
            )

            if decode_attention_supported(q, kv_cache, metadata):
                # rank-local partial attention (sentinel pages masked in
                # kernel) + LSE-weighted distributed-softmax combine over
                # the dcp axis — the SPMD form of merge_attn_states
                # (ref: flash_attn.py:794 _forward_with_dcp)
                out_l, lse_l = paged_decode_attention_pallas(
                    q, kv_cache, metadata, sm_scale, sliding_window,
                    logits_soft_cap, dcp=True, return_lse=True,
                )
                lse_max = jax.lax.pmax(lse_l, metadata.dcp_axis)
                lse_max = jnp.maximum(lse_max, -1e30)
                w = jnp.exp(lse_l - lse_max)  # (T, HQ)
                num = jax.lax.psum(
                    out_l.astype(jnp.float32) * w[..., None],
                    metadata.dcp_axis,
                )
                den = jax.lax.psum(w, metadata.dcp_axis)
                return (num / jnp.maximum(den[..., None], 1e-30)).astype(
                    q.dtype
                )
        # everything else: distributed-softmax XLA reference path
        impl = "xla"
    if impl == "pallas":
        from vllm_metax_tpu.ops.pallas.ragged_attention import (
            ragged_paged_attention_pallas,
            pallas_attention_supported,
        )

        if metadata.decode_only:
            from vllm_metax_tpu.ops.pallas.decode_attention import (
                decode_attention_supported,
                paged_decode_attention_pallas,
            )

            if decode_attention_supported(q, kv_cache, metadata):
                return paged_decode_attention_pallas(
                    q, kv_cache, metadata, sm_scale, sliding_window,
                    logits_soft_cap, k_cur=k_cur, v_cur=v_cur,
                )
        if k_cur is not None:
            raise NotImplementedError(
                "deferred KV mode requires the decode kernel or the XLA "
                "path (gate with defer_kv_supported)"
            )
        if pallas_attention_supported(q, kv_cache, metadata):
            return ragged_paged_attention_pallas(
                q, kv_cache, metadata, sm_scale, sliding_window, logits_soft_cap
            )
    return ragged_paged_attention_xla(
        q, kv_cache, metadata, sm_scale, sliding_window, logits_soft_cap,
        k_cur=k_cur, v_cur=v_cur,
    )


def _on_tpu() -> bool:
    return jax.devices()[0].platform not in ("cpu", "gpu")


def ragged_paged_attention_xla(
    q: jnp.ndarray,
    kv_cache: KVCache,
    metadata: AttentionMetadata,
    sm_scale: float,
    sliding_window: int = 0,
    logits_soft_cap: float = 0.0,
    k_cur: Optional[jnp.ndarray] = None,  # deferred-write current K/V
    v_cur: Optional[jnp.ndarray] = None,
    return_lse: bool = False,
) -> jnp.ndarray:
    """Exact reference implementation (math of tests/kernels/attention/
    test_attention.py:50 ref_masked_attention, extended to paged+ragged)."""
    t, hq, d = q.shape
    r, maxb = metadata.block_tables.shape
    bs = kv_cache.block_size
    hkv = kv_cache.num_kv_heads
    g = hq // hkv
    ctx = maxb * bs

    nb = kv_cache.k.shape[0]
    # non-local DCP blocks carry an out-of-range sentinel: clamp the gather
    # (data is garbage) and kill those columns in the mask below
    safe_bt = jnp.minimum(metadata.block_tables, nb - 1)
    from vllm_metax_tpu.ops.kv_cache import kv_fused_width

    k_all, v_all = gather_kv_for_requests(
        kv_cache, safe_bt, jnp.float32,
        fused_width=kv_fused_width(kv_cache, d),
    )
    # (R, CTX, HKV, D) → per-token context
    k_tok = k_all[metadata.req_idx]  # (T, CTX, HKV, D)
    v_tok = v_all[metadata.req_idx]
    if k_cur is not None:
        # deferred-write decode: the current token's K/V is not in the pool;
        # patch it in at its position — quantize→dequantize first so the
        # value matches what later steps will read back (and what the Pallas
        # decode kernel's in-buffer store computes)
        from vllm_metax_tpu.ops.kv_cache import _quantize_kv, dequantize_kv

        kc, vc = k_cur, v_cur if v_cur is not None else k_cur[..., :0]
        if kv_cache.quantized:
            kq, ks = _quantize_kv(kc, kv_cache.k.dtype)
            kc = dequantize_kv(kq, ks, jnp.float32)
            if vc.size:
                vq, vs = _quantize_kv(vc, kv_cache.k.dtype)
                vc = dequantize_kv(vq, vs, jnp.float32)
        rows = jnp.arange(t, dtype=jnp.int32)
        pos = jnp.minimum(metadata.positions, ctx - 1)
        k_tok = k_tok.at[rows, pos].set(kc.astype(jnp.float32))
        if v_tok.shape[-1]:
            v_tok = v_tok.at[rows, pos].set(vc.astype(jnp.float32))

    qf = q.astype(jnp.float32).reshape(t, hkv, g, d)
    scores = jnp.einsum("thgd,tchd->thgc", qf, k_tok) * sm_scale  # (T,HKV,G,CTX)
    if logits_soft_cap > 0.0:
        scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)

    kv_pos = jnp.arange(ctx, dtype=jnp.int32)[None, :]  # (1, CTX)
    q_pos = metadata.positions[:, None]  # (T, 1)
    seq_len = metadata.seq_lens[metadata.req_idx][:, None]  # (T, 1)
    mask = (kv_pos <= q_pos) & (kv_pos < seq_len)
    if metadata.tree_bits is not None:
        # tree-verify rows (bits != 0): committed context < region_start is
        # fully visible; within the scheduled region only ancestor slots
        # (ref: tree_attn.py — drafts attend along their tree path only)
        n_sched = (
            metadata.query_start_loc[1:] - metadata.query_start_loc[:-1]
        )[metadata.req_idx][:, None]  # (T, 1)
        region_start = seq_len - n_sched
        rel = kv_pos - region_start
        in_region = (rel >= 0) & (rel < 32)
        bit = (
            metadata.tree_bits[:, None]
            >> jnp.clip(rel, 0, 31).astype(jnp.uint32)
        ) & jnp.uint32(1)
        tree_mask = (
            (kv_pos < region_start) | (in_region & (bit == 1))
        ) & (kv_pos < seq_len)
        mask = jnp.where(
            (metadata.tree_bits != 0)[:, None], tree_mask, mask
        )
    if sliding_window > 0:
        mask &= kv_pos > q_pos - sliding_window
    if metadata.dcp_axis is not None:
        # only columns whose block this rank owns contribute locally
        owned = metadata.block_tables < nb  # (R, MAXB)
        owned_cols = jnp.repeat(owned[metadata.req_idx], bs, axis=1)  # (T,CTX)
        mask &= owned_cols
    scores = jnp.where(mask[:, None, None, :], scores, _NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    if metadata.dcp_axis is not None:
        # distributed softmax over the KV-page shards: global row max, then
        # psum of the weighted numerator and denominator (the SPMD form of
        # merge_attn_states over every rank's partial)
        m = jax.lax.pmax(m, metadata.dcp_axis)
        m = jnp.maximum(m, -1e30)
        p = jnp.exp(scores - m)
        num = jnp.einsum("thgc,tchd->thgd", p, v_tok)
        den = jnp.sum(p, axis=-1, keepdims=True)
        num = jax.lax.psum(num, metadata.dcp_axis)
        den = jax.lax.psum(den, metadata.dcp_axis) + 1e-30
        out = num / den  # (T,HKV,G,D) / (T,HKV,G,1)
        return out.reshape(t, hq, d).astype(q.dtype)
    m = jnp.maximum(m, -1e30)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
    p = p / denom
    out = jnp.einsum("thgc,tchd->thgd", p, v_tok)
    out = out.reshape(t, hq, d).astype(q.dtype)
    if return_lse:
        lse = (m + jnp.log(denom)).reshape(t, hq)
        return out, lse
    return out


def _cascade_prefix_attention(
    q: jnp.ndarray,  # (T, HQ, D)
    kv_cache: KVCache,
    metadata: AttentionMetadata,
    sm_scale: float,
    logits_soft_cap: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared-prefix attention computed ONCE for the whole decode batch
    (ref: cascade_attention, v1/attention/backends/flash_attn.py:1013).
    Every query row attends the SAME cascade_blocks pages (all positions
    strictly below every request's current position — no causal mask, only
    the cascade_len bound on bucket padding). Returns normalized (out, lse)
    for merge_attn_states."""
    t, hq, d = q.shape
    bs = kv_cache.block_size
    hkv = kv_cache.num_kv_heads
    g = hq // hkv
    from vllm_metax_tpu.ops.kv_cache import kv_fused_width

    blocks = metadata.cascade_blocks  # (CB,)
    nb = kv_cache.k.shape[0]
    fk = jnp.take(kv_cache.k, jnp.minimum(blocks, nb - 1), axis=0)
    fw = kv_fused_width(kv_cache, d)
    if fw:
        k = fk[..., :fw]
        v = fk[..., fw:]
    else:
        k = fk
        v = jnp.take(kv_cache.v, jnp.minimum(blocks, nb - 1), axis=0)
    if kv_cache.quantized:
        ks = jnp.take(kv_cache.k_scale, jnp.minimum(blocks, nb - 1), axis=0)
        vs = jnp.take(kv_cache.v_scale, jnp.minimum(blocks, nb - 1), axis=0)
        k = k.astype(jnp.float32) * ks[..., None]
        v = v.astype(jnp.float32) * vs[..., None]
    # (CB, H, BS, D) → (H, CB*BS, D)
    p_len = blocks.shape[0] * bs
    k = k.astype(jnp.float32).transpose(1, 0, 2, 3).reshape(hkv, p_len, d)
    v = v.astype(jnp.float32).transpose(1, 0, 2, 3).reshape(hkv, p_len, d)
    qf = (
        q.astype(jnp.float32)
        .reshape(t, hkv, g, d)
        .transpose(1, 0, 2, 3)
        .reshape(hkv, t * g, d)
    )
    s = jnp.einsum("hrd,hcd->hrc", qf, k) * sm_scale  # (H, T*G, P)
    if logits_soft_cap > 0.0:
        s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)
    col_ok = (
        jnp.arange(p_len, dtype=jnp.int32)[None, None, :]
        < metadata.cascade_len
    )
    s = jnp.where(col_ok, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.maximum(m, -1e30)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
    out = jnp.einsum("hrc,hcd->hrd", p / denom, v)  # (H, T*G, D)
    out = (
        out.reshape(hkv, t, g, d).transpose(1, 0, 2, 3).reshape(t, hq, d)
    ).astype(q.dtype)
    lse = (m + jnp.log(denom))[..., 0].reshape(hkv, t, g)
    lse = lse.transpose(1, 0, 2).reshape(t, hq)
    return out, lse


def merge_attn_states(
    out_a: jnp.ndarray,  # (..., D)
    lse_a: jnp.ndarray,  # (...,)
    out_b: jnp.ndarray,
    lse_b: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LSE-weighted merge of two partial attention results over disjoint KV
    ranges (ref: csrc/attention/merge_attn_states.cu). The combine primitive
    for chunked prefill and decode-context-parallel (DCP)."""
    m = jnp.maximum(lse_a, lse_b)
    a = jnp.exp(lse_a - m)
    b = jnp.exp(lse_b - m)
    denom = a + b
    out = (out_a * a[..., None] + out_b * b[..., None]) / denom[..., None]
    return out, m + jnp.log(denom)
