"""DeepSeek V2/V3 family: MLA attention + grouped-top-k MoE.

TPU-native redesign of the reference's largest model stack
(vllm_metax/models/deepseek_v2.py, 1,654 LoC; MLA math documented at
v1/attention/backends/mla/common.py:3-233):

- MLA runs in the **latent MQA formulation for both prefill and decode**:
  queries are absorbed into latent space at runtime (q_nope @ W_UK), the KV
  cache stores one 576-wide latent "head" [c_kv(512) | k_pe(64)] per token
  (ref: concat_and_cache_mla, csrc/cache_kernels.cu:503), attention is MQA
  over the latent, and W_UV projects the latent output per head. This is the
  reference's data-movement-optimal decode path (mla/common.py:1851)
  generalized to all steps — on TPU the extra prefill FLOPs ride the MXU
  while KV bandwidth (the real constraint) stays minimal.
- The latent cache is replicated under TP (one shared head); q/o project-
  ions shard by head; MoE expert banks shard like models/mixtral.py.
- first_k_dense_replace leading dense layers run in a separate lax.scan from
  the MoE layers (two stacked param groups), keeping both scans homogeneous.
- Rope on the 64 rope dims is GPT-J interleaved (is_neox_style=False), the
  HF DeepSeek convention; YaRN mscale is folded into the cos/sin cache and
  the mscale_all_dim² factor into sm_scale.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_metax_tpu.config import ModelConfig, QuantizationConfig
from vllm_metax_tpu.layers.linear import apply_linear
from vllm_metax_tpu.models import llama as _llama
from vllm_metax_tpu.ops.activation import ACT2FN
from vllm_metax_tpu.ops.attention import AttentionMetadata
from vllm_metax_tpu.ops.kv_cache import KVCache, write_to_kv_cache
from vllm_metax_tpu.ops.layernorm import fused_add_rms_norm, rms_norm
from vllm_metax_tpu.ops.moe import fused_experts, fused_topk, grouped_topk
from vllm_metax_tpu.ops.rope import apply_rope, compute_rope_cache

compute_logits = _llama.compute_logits

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def kv_cache_spec(cfg: ModelConfig) -> dict:
    # the MTP spec head is one extra MLA layer with its own KV range
    # (ref: deepseek_mtp.py DeepSeekMultiTokenPredictorLayer.mtp_block)
    spec = {
        "num_layers": cfg.num_hidden_layers + (1 if cfg.mtp_enabled else 0),
        "num_kv_heads": 1,
        "head_dim": cfg.kv_lora_rank + cfg.qk_rope_head_dim,
        "store_v": False,
    }
    if cfg.index_topk:
        # V3.2: the per-token 128-wide indexer K rows ride the (otherwise
        # zero-width) v pool — same paging, one cache manager (ref:
        # DeepseekV32IndexerCache, vllm_metax/models/deepseek_v2.py:562)
        spec["v_dim"] = cfg.index_head_dim
    return spec


def _sm_scale(cfg: ModelConfig) -> float:
    scale = (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim) ** -0.5
    rs = cfg.rope_scaling or {}
    if (rs.get("rope_type") or rs.get("type")) in ("yarn", "deepseek_yarn"):
        m_all = rs.get("mscale_all_dim", 0.0)
        factor = rs.get("factor", 1.0)
        if m_all and factor > 1:
            m = 0.1 * m_all * math.log(factor) + 1.0
            scale = scale * m * m
    return scale


def mla_attention(
    q: jnp.ndarray,  # (T, H_local, 576) = [absorbed nope (512) | rope (64)]
    kv_cache: KVCache,  # k: (NB, 1, BS, 576)
    md: AttentionMetadata,
    sm_scale: float,
    kv_lora_rank: int,
    latent_cur: Optional[jnp.ndarray] = None,  # (T, 1, 576) deferred write
) -> jnp.ndarray:
    """MQA over the latent cache (ref math: mla/common.py:154-233 'Decode'
    derivation). Returns (T, H_local, kv_lora_rank).

    Dispatch: pure-decode steps hit the Pallas request-batched paged kernel
    (ops/pallas/decode_attention.py, pv_width=lora — the analog of the
    reference's FlashMLA decode, mla/flashmla.py:221); everything else runs
    the chunked online-softmax XLA path below. latent_cur: deferred-write
    mode — the current token's latent row is not in the pool yet."""
    from vllm_metax_tpu import envs
    from vllm_metax_tpu.ops.attention import _on_tpu

    impl = envs.METAX_TPU_ATTN_IMPL
    use_pallas = impl == "pallas" or (impl == "auto" and _on_tpu())
    if md.dcp_axis is not None:
        # DCP over the latent cache: rank-local partial MQA over owned pages
        # + LSE-weighted distributed-softmax combine — the latent-cache
        # analog of the reference's dcp seq-len split + cp_gather_cache
        # (mla/common.py:796-883, csrc/cache_kernels.cu:1075). No latent
        # ever moves between ranks; the combine is two small collectives.
        if use_pallas and md.decode_only and latent_cur is None:
            from vllm_metax_tpu.ops.pallas.decode_attention import (
                decode_attention_supported,
                paged_decode_attention_pallas,
            )

            if decode_attention_supported(q, kv_cache, md, mla=True):
                out_l, lse_l = paged_decode_attention_pallas(
                    q, kv_cache, md, sm_scale, pv_width=kv_lora_rank,
                    dcp=True, return_lse=True,
                )
                lse_max = jnp.maximum(
                    jax.lax.pmax(lse_l, md.dcp_axis), -1e30
                )
                w = jnp.exp(lse_l - lse_max)  # (T, H)
                num = jax.lax.psum(
                    out_l.astype(jnp.float32) * w[..., None], md.dcp_axis
                )
                den = jax.lax.psum(w, md.dcp_axis)
                return (num / jnp.maximum(den[..., None], 1e-30)).astype(
                    q.dtype
                )
        return mla_attention_xla_chunked(
            q, kv_cache, md, sm_scale, kv_lora_rank, latent_cur=latent_cur
        )
    if use_pallas and md.decode_only:
        from vllm_metax_tpu.ops.pallas.decode_attention import (
            decode_attention_supported,
            paged_decode_attention_pallas,
        )

        if decode_attention_supported(q, kv_cache, md, mla=True):
            return paged_decode_attention_pallas(
                q, kv_cache, md, sm_scale, pv_width=kv_lora_rank,
                k_cur=latent_cur,
            )
    return mla_attention_xla_chunked(
        q, kv_cache, md, sm_scale, kv_lora_rank, latent_cur=latent_cur
    )


def mla_attention_xla_chunked(
    q: jnp.ndarray,  # (T, H_local, 576)
    kv_cache: KVCache,
    md: AttentionMetadata,
    sm_scale: float,
    kv_lora_rank: int,
    chunk_tokens: int = 256,
    latent_cur: Optional[jnp.ndarray] = None,  # (T, 1, 576) deferred write
) -> jnp.ndarray:
    """Online-softmax over fixed-size context chunks under lax.scan — the
    chunked-workspace strategy of the reference's MLA prefill
    (mla/common.py:507 workspace sizing, :1620 chunked loop): peak
    intermediate is (T, CHUNK, 576), never (T, MAX_CTX, 576)."""
    t, h, dq = q.shape
    r, maxb = md.block_tables.shape
    bs = kv_cache.block_size
    cb = max(1, chunk_tokens // bs)  # blocks per chunk
    nchunks = -(-maxb // cb)
    bt = jnp.pad(md.block_tables, ((0, 0), (0, nchunks * cb - maxb)))
    ckv = cb * bs

    qf = q.astype(jnp.float32)
    q_pos = md.positions[:, None]  # (T, 1)
    seq_len = md.seq_lens[md.req_idx][:, None]  # (T, 1)
    pos_in_chunk = jnp.arange(ckv, dtype=jnp.int32)[None, :]  # (1, CKV)
    t_rows = jnp.arange(t, dtype=jnp.int32)
    cur = None
    if latent_cur is not None:
        cur = latent_cur[:, 0].astype(jnp.float32)  # (T, 576)
        if kv_cache.quantized:
            from vllm_metax_tpu.ops.kv_cache import _quantize_kv

            cq, cs = _quantize_kv(latent_cur, kv_cache.k.dtype)
            cur = (cq[:, 0].astype(jnp.float32) * cs[:, 0, None])

    nb_local = kv_cache.k.shape[0]

    def chunk_step(carry, c):
        m, l, acc = carry
        pages = jax.lax.dynamic_slice_in_dim(bt, c * cb, cb, axis=1)  # (R, CB)
        lat = jnp.take(kv_cache.k, pages, axis=0)  # (R, CB, 1, BS, D)
        if kv_cache.quantized:
            ks = jnp.take(kv_cache.k_scale, pages, axis=0)  # (R, CB, 1, BS)
            lat = lat.astype(jnp.float32) * ks[..., None]
        lat_tok = lat.reshape(r, ckv, dq)[md.req_idx].astype(jnp.float32)
        if cur is not None:
            # deferred write: patch the current token's latent into its
            # in-chunk position (quantize→dequantize above keeps later-step
            # reads identical)
            rel = q_pos[:, 0] - c * ckv
            in_chunk = (rel >= 0) & (rel < ckv)
            idx = jnp.clip(rel, 0, ckv - 1)
            patched = jnp.where(
                in_chunk[:, None], cur, lat_tok[t_rows, idx]
            )
            lat_tok = lat_tok.at[t_rows, idx].set(patched)
        s = jnp.einsum("thd,tcd->thc", qf, lat_tok) * sm_scale  # (T, H, CKV)
        kv_pos = c * ckv + pos_in_chunk
        mask = (kv_pos <= q_pos) & (kv_pos < seq_len)  # (T, CKV)
        if md.dcp_axis is not None:
            # only latent pages this rank owns contribute locally (sentinel
            # page ids clamp in the take above — mask them out)
            owned = jnp.repeat(pages < nb_local, bs, axis=1)  # (R, CKV)
            mask &= owned[md.req_idx]
        s = jnp.where(mask[:, None, :], s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        # masked columns must contribute EXACTLY 0: when a chunk is fully
        # masked (a dcp rank owning no pages of it), m_new stays -inf and
        # exp(s - m_new) = exp(0) = 1 would sweep in stale/NaN pool data —
        # and 0 x NaN = NaN, so the latent values are zeroed there too
        p = jnp.where(mask[:, None, :], jnp.exp(s - m_new), 0.0)
        v_lat = jnp.where(
            mask[:, :, None], lat_tok[..., :kv_lora_rank], 0.0
        )
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum("thc,tcd->thd", p, v_lat)
        return (m_new, l_new, acc_new), None

    carry0 = (
        jnp.full((t, h, 1), -1e30, jnp.float32),
        jnp.zeros((t, h, 1), jnp.float32),
        jnp.zeros((t, h, kv_lora_rank), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(
        chunk_step, carry0, jnp.arange(nchunks, dtype=jnp.int32)
    )
    if md.dcp_axis is not None:
        # distributed softmax over the page shards: global row max, psum of
        # weighted numerator/denominator (SPMD merge_attn_states)
        m_g = jnp.maximum(jax.lax.pmax(m, md.dcp_axis), -1e30)
        w = jnp.exp(m - m_g)
        num = jax.lax.psum(acc * w, md.dcp_axis)
        den = jax.lax.psum(l * w, md.dcp_axis)
        return (num / jnp.maximum(den, 1e-30)).astype(q.dtype)
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


# -------------------------------------------------- V3.2 sparse indexer

def indexer_topk(
    q_idx: jnp.ndarray,  # (T, NH, DI) roped indexer queries
    w_idx: jnp.ndarray,  # (T, NH) fully-scaled head weights
    kv_cache: KVCache,  # v pool holds the (NB, 1, BS, DI) indexer K rows
    md: AttentionMetadata,
    topk: int,
    chunk_tokens: int = 256,
) -> jnp.ndarray:
    """DeepSeek V3.2 "lightning indexer": logits[t,s] = Σ_h w[t,h]·relu(q·k_s)
    over the causal context, then top-k token positions per query row.

    Ref math: deep_gemm bf16_mqa_logits consumed by sparse_attn_indexer
    (vllm_metax/models/deepseek_v2.py:585-727, utils/deep_gemm.py:53).
    Chunked over the context like mla_attention_xla_chunked — peak
    intermediate is (T, NH, CKV), never (T, NH, CTX). Returns (T, K) absolute
    positions, -1 where fewer than K causal tokens exist.

    DCP: each rank scores only the indexer-K rows it owns (non-local pages
    are sentinel-masked to -inf), then a pmax over the dcp axis reconstructs
    the EXACT global logits row — every position is owned by exactly one
    rank — so all ranks select the same global top-k. SPMD analog of the
    reference's cp_gather_indexer_k_quant_cache + global top-k
    (csrc/cache_kernels.cu:1274, models/deepseek_v2.py:585-727).
    """
    t, nh, di = q_idx.shape
    r, maxb = md.block_tables.shape
    bs = kv_cache.block_size
    cb = max(1, chunk_tokens // bs)
    nchunks = -(-maxb // cb)
    bt = jnp.pad(md.block_tables, ((0, 0), (0, nchunks * cb - maxb)))
    ckv = cb * bs

    qf = q_idx.astype(jnp.float32)
    wf = w_idx.astype(jnp.float32)
    q_pos = md.positions[:, None]
    seq_len = md.seq_lens[md.req_idx][:, None]
    pos_in_chunk = jnp.arange(ckv, dtype=jnp.int32)[None, :]
    nb_local = kv_cache.v.shape[0]

    def chunk_step(_, c):
        pages = jax.lax.dynamic_slice_in_dim(bt, c * cb, cb, axis=1)
        rows = jnp.take(kv_cache.v, pages, axis=0)  # (R, CB, 1, BS, DI)
        rows_tok = rows.reshape(r, ckv, di)[md.req_idx].astype(jnp.float32)
        kv_pos = c * ckv + pos_in_chunk
        mask = (kv_pos <= q_pos) & (kv_pos < seq_len)
        if md.dcp_axis is not None:
            # only score rows this rank owns (sentinel pages clamp in the
            # take above; garbage they read is masked AND zeroed)
            owned = jnp.repeat(pages < nb_local, bs, axis=1)  # (R, CKV)
            mask &= owned[md.req_idx]
            rows_tok = jnp.where(mask[:, :, None], rows_tok, 0.0)
        s = jnp.einsum("thd,tcd->thc", qf, rows_tok)  # (T, NH, CKV)
        s = jnp.einsum("th,thc->tc", wf, jax.nn.relu(s))  # (T, CKV)
        return 0, jnp.where(mask, s, _NEG_INF)

    _, logits = jax.lax.scan(
        chunk_step, 0, jnp.arange(nchunks, dtype=jnp.int32)
    )  # (NCHUNKS, T, CKV)
    logits = jnp.transpose(logits, (1, 0, 2)).reshape(t, nchunks * ckv)
    if md.dcp_axis is not None:
        # each position is -inf on every rank but its owner → pmax rebuilds
        # the exact single-device logits row on all ranks, so the top-k
        # below is globally identical (no gather of indexer-K rows needed)
        logits = jax.lax.pmax(logits, md.dcp_axis)
    k = min(topk, nchunks * ckv)
    vals, idx = jax.lax.top_k(logits, k)  # positions ARE column indices
    return jnp.where(vals > _NEG_INF / 2, idx.astype(jnp.int32), -1)


def mla_sparse_attention_xla(
    q: jnp.ndarray,  # (T, H_local, 576)
    kv_cache: KVCache,
    md: AttentionMetadata,
    sm_scale: float,
    kv_lora_rank: int,
    topk_pos: jnp.ndarray,  # (T, K) absolute positions, -1 = invalid
) -> jnp.ndarray:
    """MQA over only the indexer-selected latent rows (ref:
    flashmla_sparse.py:506 — topk indices → gathered sparse attention).

    DCP: topk_pos is globally identical on every rank (see indexer_topk);
    each rank attends over the selected rows IT owns (non-local pages are
    sentinel — masked and zeroed) and the partials merge via the same
    distributed softmax as mla_attention_xla_chunked."""
    t, h, dq = q.shape
    bs = kv_cache.block_size
    safe = jnp.maximum(topk_pos, 0)
    pages = jnp.take_along_axis(
        md.block_tables[md.req_idx], safe // bs, axis=1
    )  # (T, K)
    valid = topk_pos >= 0
    if md.dcp_axis is not None:
        # clamp BEFORE the flat-index multiply: the DCP sentinel (2**28)
        # times block_size would overflow int32
        local = pages < kv_cache.k.shape[0]
        valid &= local
        pages = jnp.where(local, pages, 0)
    flat = (pages * bs + safe % bs).reshape(-1)
    rows = kv_cache.k.reshape(-1, dq)[flat].reshape(t, -1, dq)  # (T, K, 576)
    if kv_cache.quantized:
        scale = kv_cache.k_scale.reshape(-1)[flat].reshape(t, -1)
        rows = rows.astype(jnp.float32) * scale[..., None]
    rows = rows.astype(jnp.float32)
    if md.dcp_axis is not None:
        rows = jnp.where(valid[:, :, None], rows, 0.0)
    s = jnp.einsum("thd,tkd->thk", q.astype(jnp.float32), rows) * sm_scale
    s = jnp.where(valid[:, None, :], s, _NEG_INF)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=-1, keepdims=True)
    num = jnp.einsum("thk,tkd->thd", p, rows[..., :kv_lora_rank])
    if md.dcp_axis is not None:
        m_g = jnp.maximum(jax.lax.pmax(m, md.dcp_axis), -1e30)
        w = jnp.exp(m - m_g)
        num = jax.lax.psum(num * w, md.dcp_axis)
        den = jax.lax.psum(den * w, md.dcp_axis)
    out = num / jnp.maximum(den, 1e-30)
    return out.astype(q.dtype)


def _v32_sparse_attend(
    q_full: jnp.ndarray,  # (T, H, 576)
    qi: jnp.ndarray,  # (T, NH, DI) indexer queries
    w_idx: jnp.ndarray,  # (T, NH)
    kv_l: KVCache,
    md: AttentionMetadata,
    cfg: ModelConfig,
    chunk_q: int = 64,
) -> jnp.ndarray:
    """Indexer top-k + sparse MLA, chunked over QUERY tokens so the peak
    intermediate is (CHUNK, topk, 576) / (CHUNK, padded_ctx) — never
    (T, ...); the same workspace discipline as mla_attention_xla_chunked
    (ref: mla/common.py:507 workspace sizing)."""
    import dataclasses

    t = q_full.shape[0]
    if t <= chunk_q:
        topk_pos = indexer_topk(qi, w_idx, kv_l, md, cfg.index_topk)
        return mla_sparse_attention_xla(
            q_full, kv_l, md, _sm_scale(cfg), cfg.kv_lora_rank, topk_pos
        )
    pad = (-t) % chunk_q
    nc = (t + pad) // chunk_q

    def pad_to(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    qf = pad_to(q_full).reshape(nc, chunk_q, *q_full.shape[1:])
    qic = pad_to(qi).reshape(nc, chunk_q, *qi.shape[1:])
    wc = pad_to(w_idx).reshape(nc, chunk_q, *w_idx.shape[1:])
    posc = pad_to(md.positions).reshape(nc, chunk_q)
    reqc = pad_to(md.req_idx).reshape(nc, chunk_q)

    def one_chunk(args):
        qf_c, qi_c, w_c, pos_c, req_c = args
        md_c = dataclasses.replace(md, positions=pos_c, req_idx=req_c)
        topk_pos = indexer_topk(qi_c, w_c, kv_l, md_c, cfg.index_topk)
        return mla_sparse_attention_xla(
            qf_c, kv_l, md_c, _sm_scale(cfg), cfg.kv_lora_rank, topk_pos
        )

    out = jax.lax.map(one_chunk, (qf, qic, wc, posc, reqc))
    return out.reshape(nc * chunk_q, *out.shape[2:])[:t]


def _mla_block(lp, normed, kv_l, md, cfg: ModelConfig, hq_local, rope_cache,
               maybe_psum, defer: bool = False, axis_name=None):
    eps = cfg.rms_norm_eps
    nope, rope_d = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    lora = cfg.kv_lora_rank
    t = normed.shape[0]

    if "q_a" in lp:
        cq = rms_norm(apply_linear(lp["q_a"], normed), lp["q_a_norm"], eps)
        q = apply_linear(lp["q_b"], cq)
    else:
        q = apply_linear(lp["q"], normed)
    q = q.reshape(t, hq_local, nope + rope_d)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    ckv_kpe = apply_linear(lp["kv_a"], normed)  # (T, lora + rope_d)
    ckv = rms_norm(ckv_kpe[:, :lora], lp["kv_a_norm"], eps)
    k_pe = ckv_kpe[:, None, lora:]  # (T, 1, rope_d)

    q_pe, k_pe = apply_rope(
        q_pe, k_pe, md.positions, rope_cache, is_neox_style=False
    )
    # runtime weight absorption (ref: process_weights_after_loading,
    # mla/common.py:1115): q_nope → latent space
    q_abs = jnp.einsum(
        "thn,hnk->thk", q_nope.astype(jnp.float32),
        lp["w_uk"].astype(jnp.float32),
    ).astype(normed.dtype)
    q_full = jnp.concatenate([q_abs, q_pe], axis=-1)  # (T, H, lora+rope)

    latent = jnp.concatenate([ckv, k_pe[:, 0]], axis=-1)[:, None, :]  # (T,1,D)

    if cfg.index_topk:
        # V3.2 lightning indexer (ref: deepseek_v2.py:769 Indexer.forward):
        # 64 query heads over a single 128-wide indexer K row per token;
        # rope on the LEADING rope_d dims (split order [pe|nope]), GPT-J style
        from vllm_metax_tpu.ops.layernorm import layer_norm

        idx = lp["indexer"]
        nh, di = cfg.index_n_heads, cfg.index_head_dim
        qi = apply_linear(idx["wq_b"], cq).reshape(t, nh, di)
        ki = layer_norm(
            apply_linear(idx["wk"], normed), idx["k_norm"], idx["k_norm_b"],
            eps=1e-6,
        )
        qi_pe, ki_pe = apply_rope(
            qi[..., :rope_d], ki[:, None, :rope_d], md.positions, rope_cache,
            is_neox_style=False,
        )
        qi = jnp.concatenate([qi_pe, qi[..., rope_d:]], axis=-1)
        ki = jnp.concatenate([ki_pe[:, 0], ki[:, rope_d:]], axis=-1)
        w_idx = apply_linear(idx["weights_proj"], normed) * (
            di**-0.5 * nh**-0.5
        )
        # indexer K rows ride the v pool (kv_cache_spec v_dim)
        kv_l = write_to_kv_cache(
            kv_l, latent, ki[:, None, :], md.slot_mapping
        )
        attn_lat = _v32_sparse_attend(q_full, qi, w_idx, kv_l, md, cfg)
    elif defer:
        # pure-decode: the latent write is deferred to ONE batched all-layer
        # commit after the layer scan (see models/llama.py run_layers);
        # attention reads the fresh row via latent_cur
        attn_lat = mla_attention(
            q_full, kv_l, md, _sm_scale(cfg), lora, latent_cur=latent
        )
    else:
        kv_l = write_to_kv_cache(
            kv_l, latent, jnp.zeros((t, 1, 0), latent.dtype), md.slot_mapping
        )
        attn_lat = mla_attention(q_full, kv_l, md, _sm_scale(cfg), lora)
    attn = jnp.einsum(
        "thk,hkv->thv", attn_lat.astype(jnp.float32),
        lp["w_uv"].astype(jnp.float32),
    ).astype(normed.dtype)  # (T, H, v_head)
    out = maybe_psum(
        apply_linear(lp["o"], attn.reshape(t, hq_local * cfg.v_head_dim),
                     gather_axis=axis_name)
    )
    if defer:
        return out, kv_l, latent
    return out, kv_l


def _moe_block(lp, normed, cfg: ModelConfig, act_fn, axis_name, ep_axis_name,
               layer_idx=None):
    logits = jnp.dot(
        normed, lp["router"]["w"], preferred_element_type=jnp.float32
    )
    bias = lp.get("router_bias")
    if cfg.n_group > 1:
        weights, ids = grouped_topk(
            logits,
            cfg.num_experts_per_tok,
            cfg.n_group,
            cfg.topk_group,
            renormalize=cfg.norm_topk_prob,
            scoring_func=cfg.scoring_func,
            e_score_correction_bias=bias,
            routed_scaling_factor=cfg.routed_scaling_factor,
        )
    else:
        if cfg.scoring_func == "sigmoid":
            scores = jax.nn.sigmoid(logits)
            if bias is not None:
                sel = scores + bias.astype(jnp.float32)
            else:
                sel = scores
            _, ids = jax.lax.top_k(sel, cfg.num_experts_per_tok)
            weights = jnp.take_along_axis(scores, ids, axis=1)
            if cfg.norm_topk_prob:
                weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
            weights = weights * cfg.routed_scaling_factor
            ids = ids.astype(jnp.int32)
        else:
            weights, ids = fused_topk(
                logits, cfg.num_experts_per_tok, cfg.norm_topk_prob
            )
            weights = weights * cfg.routed_scaling_factor
    if "expert_map" in lp:
        # EPLB rebalanced placement (parallel/eplb.py)
        ids = lp["expert_map"][ids]
    y = fused_experts(
        normed, lp["experts_gate_up"], lp["experts_down"], weights, ids,
        act_fn, cfg.num_experts, ep_axis=ep_axis_name, layer_idx=layer_idx,
    )
    axes = tuple(a for a in (ep_axis_name, axis_name) if a)
    if axes:
        y = jax.lax.psum(y, axes)
    if "gate_up_shared" in lp:
        shared = apply_linear(
            lp["down_shared"],
            act_fn(apply_linear(lp["gate_up_shared"], normed)),
            gather_axis=axis_name,
        )
        if axis_name:
            shared = jax.lax.psum(shared, axis_name)
        y = y + shared
    return y


def forward(
    params: dict,
    input_ids: jnp.ndarray,
    kv_cache: KVCache,
    md: AttentionMetadata,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,
):
    hq = num_q_heads or cfg.num_q_heads
    eps = cfg.rms_norm_eps
    act_fn = ACT2FN[cfg.hidden_act]
    rope_cache = params["rope_cache"]
    k_dense = cfg.first_k_dense_replace

    hidden = jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)

    def maybe_psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    from vllm_metax_tpu.ops.attention import layer_view

    n_kv_layers = cfg.num_hidden_layers + (1 if cfg.mtp_enabled else 0)
    nb_layer = kv_cache.k.shape[0] // n_kv_layers
    slots_per_layer = nb_layer * kv_cache.block_size

    # pure-decode steps defer the per-layer latent write to one batched
    # all-layer commit per scan group (see models/llama.py run_layers; the
    # MLA decode kernel / chunked XLA path read the fresh row via latent_cur)
    defer = bool(md.decode_only and md.dcp_axis is None and not cfg.index_topk)

    def dense_layer(carry, l):
        if defer:
            hidden, residual = carry
            kv = kv_cache
        else:
            hidden, residual, kv = carry
        layers = params["dense_layers"]
        lp = jax.tree_util.tree_map(lambda a: a[l], layers)
        md_l = layer_view(md, l, nb_layer, slots_per_layer)
        normed, residual = fused_add_rms_norm(hidden, residual, lp["ln1"], eps)
        if defer:
            attn_out, kv, latent = _mla_block(
                lp, normed, kv, md_l, cfg, hq, rope_cache, maybe_psum,
                defer=True, axis_name=axis_name,
            )
        else:
            attn_out, kv = _mla_block(
                lp, normed, kv, md_l, cfg, hq, rope_cache, maybe_psum,
                axis_name=axis_name,
            )
        normed, residual = fused_add_rms_norm(attn_out, residual, lp["ln2"], eps)
        mlp = maybe_psum(
            apply_linear(layers["down"],
                         act_fn(apply_linear(layers["gate_up"], normed,
                                             layer_idx=l)),
                         layer_idx=l, gather_axis=axis_name)
        )
        if defer:
            return (mlp, residual), latent
        return (mlp, residual, kv), None

    def moe_layer(carry, l):
        if defer:
            hidden, residual = carry
            kv = kv_cache
        else:
            hidden, residual, kv = carry
        ml = params["moe_layers"]
        # tiled quantized expert banks stay stacked — the grouped kernel
        # prefetches the layer index (see models/mixtral.py layer_fn)
        tiled = (
            "w_p4t" in ml["experts_gate_up"] or "w_i8t" in ml["experts_gate_up"]
        )
        stacked_keys = ("experts_gate_up", "experts_down") if tiled else ()
        lp = jax.tree_util.tree_map(
            lambda a: a[l - k_dense],
            {k: v for k, v in ml.items() if k not in stacked_keys},
        )
        for k in stacked_keys:
            lp[k] = ml[k]
        md_l = layer_view(md, l, nb_layer, slots_per_layer)
        normed, residual = fused_add_rms_norm(hidden, residual, lp["ln1"], eps)
        if defer:
            attn_out, kv, latent = _mla_block(
                lp, normed, kv, md_l, cfg, hq, rope_cache, maybe_psum,
                defer=True, axis_name=axis_name,
            )
        else:
            attn_out, kv = _mla_block(
                lp, normed, kv, md_l, cfg, hq, rope_cache, maybe_psum,
                axis_name=axis_name,
            )
        normed, residual = fused_add_rms_norm(attn_out, residual, lp["ln2"], eps)
        moe = _moe_block(
            lp, normed, cfg, act_fn, axis_name, ep_axis_name,
            layer_idx=l - k_dense,
        )
        if defer:
            return (moe, residual), latent
        return (moe, residual, kv), None

    residual = jnp.zeros_like(hidden)
    if defer:
        from vllm_metax_tpu.ops.kv_cache import write_all_layers_to_kv_cache

        t = hidden.shape[0]
        carry = (hidden, residual)
        new_kv = kv_cache

        def zero_v(lat):  # (L, T, 1, 576) → matching zero-width v
            return jnp.zeros(lat.shape[:3] + (0,), lat.dtype)

        if k_dense > 0:
            carry, lat_dense = jax.lax.scan(
                dense_layer, carry, jnp.arange(k_dense, dtype=jnp.int32)
            )
            new_kv = write_all_layers_to_kv_cache(
                new_kv, lat_dense, zero_v(lat_dense), md.slot_mapping,
                nb_layer, first_layer=0,
            )
        carry, lat_moe = jax.lax.scan(
            moe_layer,
            carry,
            jnp.arange(k_dense, cfg.num_hidden_layers, dtype=jnp.int32),
        )
        new_kv = write_all_layers_to_kv_cache(
            new_kv, lat_moe, zero_v(lat_moe), md.slot_mapping, nb_layer,
            first_layer=k_dense,
        )
        hidden, residual = carry
    else:
        carry = (hidden, residual, kv_cache)
        if k_dense > 0:
            carry, _ = jax.lax.scan(
                dense_layer, carry, jnp.arange(k_dense, dtype=jnp.int32)
            )
        carry, _ = jax.lax.scan(
            moe_layer,
            carry,
            jnp.arange(k_dense, cfg.num_hidden_layers, dtype=jnp.int32),
        )
        hidden, residual, new_kv = carry
    hidden = (hidden.astype(jnp.float32) + residual.astype(jnp.float32)).astype(
        cfg.dtype
    )
    return hidden, new_kv


def mtp_forward(
    params: dict,
    input_ids: jnp.ndarray,  # (T,) NEXT token per row (sampled/ground truth)
    prev_hidden: jnp.ndarray,  # (T, E) main model's output hidden
    kv_cache: KVCache,
    md: AttentionMetadata,  # UN-rebased step metadata (global layer 0 view)
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,
):
    """DeepSeek MTP spec head: one extra decoder layer predicting token t+2
    from (hidden_t, emb(token_{t+1})).

    Ref: deepseek_mtp.py DeepSeekMultiTokenPredictorLayer.forward —
    enorm(emb) ++ hnorm(hidden) → eh_proj → mtp_block; embeddings at
    position 0 are zeroed (:81). The block's KV lives in the pool's LAST
    layer range (kv_cache_spec adds it when cfg.mtp_enabled).

    Returns (mtp hidden (T, E) pre-shared-head-norm, new kv_cache); the
    caller selects draft rows and applies mtp_compute_logits."""
    from vllm_metax_tpu.ops.attention import layer_view

    mp = params["mtp"]
    hq = num_q_heads or cfg.num_q_heads
    eps = cfg.rms_norm_eps
    act_fn = ACT2FN[cfg.hidden_act]

    def maybe_psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    emb_table = mp.get("embed", params["embed"])
    emb = jnp.take(emb_table, input_ids, axis=0).astype(cfg.dtype)
    emb = jnp.where(md.positions[:, None] == 0, 0, emb)
    # model.forward returns the PRE-final-norm hidden; the reference's MTP
    # consumes the model output (post final norm), so apply it here
    prev = rms_norm(prev_hidden, params["final_norm"], eps)
    x = jnp.concatenate(
        [rms_norm(emb, mp["enorm"], eps), rms_norm(prev, mp["hnorm"], eps)],
        axis=-1,
    )
    hidden = apply_linear(mp["eh_proj"], x)  # (T, E)

    n_kv_layers = cfg.num_hidden_layers + 1
    nb_layer = kv_cache.k.shape[0] // n_kv_layers
    md_l = layer_view(
        md, cfg.num_hidden_layers, nb_layer, nb_layer * kv_cache.block_size
    )
    lp = mp["layer"]
    normed, residual = fused_add_rms_norm(
        hidden, jnp.zeros_like(hidden), lp["ln1"], eps
    )
    attn_out, kv_cache = _mla_block(
        lp, normed, kv_cache, md_l, cfg, hq, params["rope_cache"], maybe_psum,
        axis_name=axis_name,
    )
    normed, residual = fused_add_rms_norm(attn_out, residual, lp["ln2"], eps)
    if "experts_gate_up" in lp:
        mlp = _moe_block(lp, normed, cfg, act_fn, axis_name, ep_axis_name)
    else:
        mlp = maybe_psum(
            apply_linear(lp["down"], act_fn(apply_linear(lp["gate_up"], normed)))
        )
    hidden = (
        mlp.astype(jnp.float32) + residual.astype(jnp.float32)
    ).astype(cfg.dtype)
    return hidden, kv_cache


def mtp_compute_logits(
    params: dict,
    hidden: jnp.ndarray,  # (R, E) — already gathered at draft rows
    cfg: ModelConfig,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """shared_head: norm + lm head (ref: deepseek_mtp.py SharedHead).
    Falls back to the main lm_head when the checkpoint has no
    shared_head.head weights."""
    mp = params["mtp"]
    normed = rms_norm(hidden, mp["final_norm"], cfg.rms_norm_eps)
    head = mp.get("head", params.get("lm_head"))
    if head is None:  # tied embeddings — replicated
        logits = jnp.dot(
            normed, params["embed"].T, preferred_element_type=jnp.float32
        )
    else:
        logits = jnp.dot(normed, head, preferred_element_type=jnp.float32)
        if axis_name:  # vocab-sharded head: gather shards → full vocab
            logits = jax.lax.all_gather(logits, axis_name, axis=-1, tiled=True)
    return logits[:, : cfg.vocab_size]


# ---------------------------------------------------------------- params

def _split_kv_b(kv_b_w: jnp.ndarray, cfg: ModelConfig):
    """kv_b_proj (lora, HQ*(nope+v)) → absorbed W_UK (HQ, nope, lora) and
    W_UV (HQ, lora, v)."""
    lora, _ = kv_b_w.shape
    nope, v = cfg.qk_nope_head_dim, cfg.v_head_dim
    hq = cfg.num_q_heads
    w = kv_b_w.reshape(lora, hq, nope + v)
    w_uk = jnp.transpose(w[:, :, :nope], (1, 2, 0))  # (HQ, nope, lora)
    w_uv = jnp.transpose(w[:, :, nope:], (1, 0, 2))  # (HQ, lora, v)
    return w_uk, w_uv


def init_params(
    cfg: ModelConfig,
    quant_cfg: Optional[QuantizationConfig] = None,
    seed: int = 0,
) -> dict:
    import itertools

    key = jax.random.PRNGKey(seed)
    counter = itertools.count()
    dt = cfg.dtype
    e = cfg.hidden_size
    nope, rope_d = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    lora = cfg.kv_lora_rank
    hq = cfg.num_q_heads
    im = cfg.moe_intermediate_size or cfg.intermediate_size
    quantize = _llama._layer_quantizer(quant_cfg)

    def dense(shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[0]))
        k = jax.random.fold_in(key, next(counter))
        return (jax.random.normal(k, shape, dtype=jnp.float32) * scale).astype(dt)

    def attn_params():
        lp = {
            "kv_a": {"w": dense((e, lora + rope_d))},
            "kv_a_norm": jnp.ones((lora,), dt),
            "o": quantize({"w": dense((hq * cfg.v_head_dim, e))}),
            "w_uk": dense((hq, nope, lora)),
            "w_uv": dense((hq, lora, cfg.v_head_dim)),
        }
        if cfg.q_lora_rank:
            lp["q_a"] = {"w": dense((e, cfg.q_lora_rank))}
            lp["q_a_norm"] = jnp.ones((cfg.q_lora_rank,), dt)
            lp["q_b"] = quantize({"w": dense((cfg.q_lora_rank, hq * (nope + rope_d)))})
        else:
            lp["q"] = quantize({"w": dense((e, hq * (nope + rope_d)))})
        if cfg.index_topk:
            if not cfg.q_lora_rank:
                raise ValueError("V3.2 indexer requires q_lora_rank")
            nh, di = cfg.index_n_heads, cfg.index_head_dim
            lp["indexer"] = {
                "wq_b": {"w": dense((cfg.q_lora_rank, nh * di))},
                "wk": {"w": dense((e, di))},
                "k_norm": jnp.ones((di,), dt),
                "k_norm_b": jnp.zeros((di,), dt),
                "weights_proj": {"w": dense((e, nh))},
            }
        return lp

    def dense_layer():
        lp = attn_params()
        lp["ln1"] = jnp.ones((e,), dt)
        lp["ln2"] = jnp.ones((e,), dt)
        lp["gate_up"] = quantize({"w": dense((e, 2 * cfg.intermediate_size))})
        lp["down"] = quantize({"w": dense((cfg.intermediate_size, e))})
        return lp

    def quantize_bank(bank):
        if quant_cfg is None or not quant_cfg.enabled:
            return bank
        from vllm_metax_tpu.quantization import quantize_linear

        return jax.vmap(lambda w: quantize_linear({"w": w}, quant_cfg))(bank["w"])

    def moe_layer():
        lp = attn_params()
        lp["ln1"] = jnp.ones((e,), dt)
        lp["ln2"] = jnp.ones((e,), dt)
        lp["router"] = {"w": dense((e, cfg.num_experts))}
        if cfg.scoring_func == "sigmoid":
            lp["router_bias"] = jnp.zeros((cfg.num_experts,), jnp.float32)
        lp["experts_gate_up"] = quantize_bank(
            {"w": dense((cfg.num_experts, e, 2 * im))}
        )
        lp["experts_down"] = quantize_bank({"w": dense((cfg.num_experts, im, e))})
        if cfg.num_shared_experts:
            isz = im * cfg.num_shared_experts
            lp["gate_up_shared"] = quantize({"w": dense((e, 2 * isz))})
            lp["down_shared"] = quantize({"w": dense((isz, e))})
        return lp

    k_dense = cfg.first_k_dense_replace
    stack = lambda ls: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ls)
    params = {
        "embed": dense((cfg.vocab_size, e), scale=0.02),
        "moe_layers": stack(
            [moe_layer() for _ in range(cfg.num_hidden_layers - k_dense)]
        ),
        "final_norm": jnp.ones((e,), dt),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings, rope_d, cfg.rope_theta, cfg.rope_scaling
        ),
    }
    if k_dense > 0:
        params["dense_layers"] = stack([dense_layer() for _ in range(k_dense)])
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense((e, cfg.vocab_size), scale=0.02)
    if cfg.mtp_enabled:
        layer = moe_layer() if cfg.num_experts else dense_layer()
        params["mtp"] = {
            "enorm": jnp.ones((e,), dt),
            "hnorm": jnp.ones((e,), dt),
            "eh_proj": {"w": dense((2 * e, e))},
            "final_norm": jnp.ones((e,), dt),
            "layer": layer,
        }
    return params


def load_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    from vllm_metax_tpu.weights.loader import CheckpointReader

    reader = CheckpointReader(path)
    dt = cfg.dtype
    quantize = _llama._layer_quantizer(quant_cfg)
    nope, rope_d = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    lora = cfg.kv_lora_rank
    im = cfg.moe_intermediate_size or cfg.intermediate_size

    def get(name):
        return jnp.asarray(reader.get(name), dtype=dt)

    def getw(name):
        # fp8 checkpoints (per-channel weight_scale or DeepSeek-native
        # 128x128-block weight_scale_inv) dequantize at read; re-encoded
        # by quantize() where quantization is enabled
        return _llama.fp8_dequant_read(reader, name, dt)

    def get_linear(prefix):
        return {"w": getw(f"{prefix}.weight").T}

    def attn_params(pre):
        kv_b = getw(f"{pre}.self_attn.kv_b_proj.weight").T  # (lora, HQ*(nope+v))
        w_uk, w_uv = _split_kv_b(kv_b, cfg)
        lp = {
            "kv_a": get_linear(f"{pre}.self_attn.kv_a_proj_with_mqa"),
            "kv_a_norm": get(f"{pre}.self_attn.kv_a_layernorm.weight"),
            "o": quantize(get_linear(f"{pre}.self_attn.o_proj")),
            "w_uk": w_uk,
            "w_uv": w_uv,
        }
        if cfg.q_lora_rank:
            lp["q_a"] = get_linear(f"{pre}.self_attn.q_a_proj")
            lp["q_a_norm"] = get(f"{pre}.self_attn.q_a_layernorm.weight")
            lp["q_b"] = quantize(get_linear(f"{pre}.self_attn.q_b_proj"))
        else:
            lp["q"] = quantize(get_linear(f"{pre}.self_attn.q_proj"))
        if cfg.index_topk:
            ip = f"{pre}.self_attn.indexer"
            lp["indexer"] = {
                "wq_b": get_linear(f"{ip}.wq_b"),
                "wk": get_linear(f"{ip}.wk"),
                "k_norm": get(f"{ip}.k_norm.weight"),
                "k_norm_b": get(f"{ip}.k_norm.bias"),
                "weights_proj": get_linear(f"{ip}.weights_proj"),
            }
        return lp

    def expert_bank(pre):
        gus, downs = [], []
        for j in range(cfg.num_experts):
            base = f"{pre}.mlp.experts.{j}"
            gate = getw(f"{base}.gate_proj.weight").T
            up = getw(f"{base}.up_proj.weight").T
            gus.append(jnp.concatenate([gate, up], axis=-1))
            downs.append(getw(f"{base}.down_proj.weight").T)
        gu, dn = {"w": jnp.stack(gus)}, {"w": jnp.stack(downs)}
        if quant_cfg is not None and quant_cfg.enabled:
            from vllm_metax_tpu.quantization import quantize_linear

            gu = jax.vmap(lambda w: quantize_linear({"w": w}, quant_cfg))(gu["w"])
            dn = jax.vmap(lambda w: quantize_linear({"w": w}, quant_cfg))(dn["w"])
        return gu, dn

    k_dense = cfg.first_k_dense_replace
    dense_layers, moe_layers = [], []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        lp = attn_params(pre)
        lp["ln1"] = get(f"{pre}.input_layernorm.weight")
        lp["ln2"] = get(f"{pre}.post_attention_layernorm.weight")
        if i < k_dense:
            lp["gate_up"] = quantize(
                {
                    "w": jnp.concatenate(
                        [
                            getw(f"{pre}.mlp.gate_proj.weight").T,
                            getw(f"{pre}.mlp.up_proj.weight").T,
                        ],
                        axis=-1,
                    )
                }
            )
            lp["down"] = quantize(get_linear(f"{pre}.mlp.down_proj"))
            dense_layers.append(lp)
        else:
            lp["router"] = get_linear(f"{pre}.mlp.gate")
            if reader.has(f"{pre}.mlp.gate.e_score_correction_bias"):
                lp["router_bias"] = jnp.asarray(
                    reader.get(f"{pre}.mlp.gate.e_score_correction_bias"),
                    jnp.float32,
                )
            gu, dn = expert_bank(pre)
            lp["experts_gate_up"] = gu
            lp["experts_down"] = dn
            if cfg.num_shared_experts:
                lp["gate_up_shared"] = quantize(
                    {
                        "w": jnp.concatenate(
                            [
                                getw(f"{pre}.mlp.shared_experts.gate_proj.weight").T,
                                getw(f"{pre}.mlp.shared_experts.up_proj.weight").T,
                            ],
                            axis=-1,
                        )
                    }
                )
                lp["down_shared"] = quantize(
                    get_linear(f"{pre}.mlp.shared_experts.down_proj")
                )
            moe_layers.append(lp)

    stack = lambda ls: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ls)
    params = {
        "embed": get("model.embed_tokens.weight"),
        "moe_layers": stack(moe_layers),
        "final_norm": get("model.norm.weight"),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings, rope_d, cfg.rope_theta, cfg.rope_scaling
        ),
    }
    if dense_layers:
        params["dense_layers"] = stack(dense_layers)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = get("lm_head.weight").T
    if cfg.mtp_enabled:
        # MTP spec layer lives at index num_hidden_layers in the checkpoint
        # (ref: deepseek_mtp.py mtp_start_layer_idx; weights model.layers.{L}.
        # enorm/hnorm/eh_proj/shared_head/embed_tokens + a full decoder layer)
        if cfg.num_nextn_predict_layers < 1:
            raise ValueError(
                "speculative method 'mtp' but the checkpoint has no MTP "
                "layers (num_nextn_predict_layers == 0)"
            )
        pre = f"model.layers.{cfg.num_hidden_layers}"
        lp = attn_params(pre)
        lp["ln1"] = get(f"{pre}.input_layernorm.weight")
        lp["ln2"] = get(f"{pre}.post_attention_layernorm.weight")
        if reader.has(f"{pre}.mlp.gate.weight"):
            lp["router"] = get_linear(f"{pre}.mlp.gate")
            if reader.has(f"{pre}.mlp.gate.e_score_correction_bias"):
                lp["router_bias"] = jnp.asarray(
                    reader.get(f"{pre}.mlp.gate.e_score_correction_bias"),
                    jnp.float32,
                )
            gu, dn = expert_bank(pre)
            lp["experts_gate_up"] = gu
            lp["experts_down"] = dn
            if cfg.num_shared_experts:
                lp["gate_up_shared"] = quantize(
                    {
                        "w": jnp.concatenate(
                            [
                                getw(f"{pre}.mlp.shared_experts.gate_proj.weight").T,
                                getw(f"{pre}.mlp.shared_experts.up_proj.weight").T,
                            ],
                            axis=-1,
                        )
                    }
                )
                lp["down_shared"] = quantize(
                    get_linear(f"{pre}.mlp.shared_experts.down_proj")
                )
        else:
            lp["gate_up"] = quantize(
                {
                    "w": jnp.concatenate(
                        [
                            getw(f"{pre}.mlp.gate_proj.weight").T,
                            getw(f"{pre}.mlp.up_proj.weight").T,
                        ],
                        axis=-1,
                    )
                }
            )
            lp["down"] = quantize(get_linear(f"{pre}.mlp.down_proj"))
        mtp = {
            "enorm": get(f"{pre}.enorm.weight"),
            "hnorm": get(f"{pre}.hnorm.weight"),
            "eh_proj": get_linear(f"{pre}.eh_proj"),
            "final_norm": get(f"{pre}.shared_head.norm.weight"),
            "layer": lp,
        }
        if reader.has(f"{pre}.embed_tokens.weight"):
            mtp["embed"] = get(f"{pre}.embed_tokens.weight")
        if reader.has(f"{pre}.shared_head.head.weight"):
            mtp["head"] = get(f"{pre}.shared_head.head.weight").T
        params["mtp"] = mtp
    return params


# ---------------------------------------------------------------- sharding

def param_specs(cfg: ModelConfig, quant_cfg=None) -> dict:
    def linear_spec(shard_axis):
        col = P(None, None, "tp") if shard_axis == 1 else P(None, "tp", None)
        p4t = (
            P(None, "tp", None, None)
            if shard_axis == 1
            else P(None, None, "tp", None)
        )
        return {
            "w": col, "w_i8": col, "w_p4": col, "w_p4t": p4t, "w_f8": col,
            "s": col, "zs": col, "a8": P(),
            "b": P(None, "tp") if shard_axis == 1 else P(None, None),
        }

    def bank_spec(shard_axis):
        col = (
            P(None, "ep", None, "tp")
            if shard_axis == 1
            else P(None, "ep", "tp", None)
        )
        tiled = (
            P(None, "ep", "tp", None, None)
            if shard_axis == 1
            else P(None, "ep", None, "tp", None)
        )
        return {"w": col, "w_i8": col, "w_p4": col, "w_f8": col, "s": col,
                "zs": col, "w_p4t": tiled, "w_i8t": tiled}

    attn = {
        "kv_a": {"w": P(None, None, None)},
        "kv_a_norm": P(None, None),
        "o": linear_spec(0),
        "w_uk": P(None, "tp", None, None),  # (L, HQ, nope, lora) by head
        "w_uv": P(None, "tp", None, None),
        "q_a": {"w": P(None, None, None)},
        "q_a_norm": P(None, None),
        "q_b": linear_spec(1),
        "q": linear_spec(1),
        # V3.2 indexer is replicated — "no tensor parallel, just replicated"
        # (ref: deepseek_v2.py:791 ReplicatedLinear)
        "indexer": {
            "wq_b": {"w": P(None, None, None)},
            "wk": {"w": P(None, None, None)},
            "k_norm": P(None, None),
            "k_norm_b": P(None, None),
            "weights_proj": {"w": P(None, None, None)},
        },
    }
    layer = {
        **attn,
        "ln1": P(None, None),
        "ln2": P(None, None),
    }
    dense_layer = {
        **layer,
        "gate_up": linear_spec(1),
        "down": linear_spec(0),
    }
    moe_layer = {
        **layer,
        "router": {"w": P(None, None, None)},
        "router_bias": P(None, None),
        "experts_gate_up": bank_spec(1),
        "experts_down": bank_spec(0),
        "gate_up_shared": linear_spec(1),
        "down_shared": linear_spec(0),
        "expert_map": P(None, None),
    }
    specs = {
        "embed": P(None, None),
        "dense_layers": dense_layer,
        "moe_layers": moe_layer,
        "final_norm": P(None),
        "rope_cache": P(None, None),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")
    if cfg.mtp_enabled:
        # MTP layer params are UNSTACKED (no leading L axis): strip the
        # leading spec entry of the per-layer specs
        strip = lambda sp: P(*tuple(sp)[1:])  # noqa: E731
        layer_specs = jax.tree_util.tree_map(
            strip,
            moe_layer if cfg.num_experts else dense_layer,
            is_leaf=lambda x: isinstance(x, P),
        )
        specs["mtp"] = {
            "enorm": P(None),
            "hnorm": P(None),
            "eh_proj": {"w": P(None, None)},
            "final_norm": P(None),
            "layer": layer_specs,
            "embed": P(None, None),
            "head": P(None, "tp"),
        }
    return specs


def prepare_for_tp(params: dict, cfg: ModelConfig, tp: int) -> dict:
    """q_b/q (head-major columns) and o (head-major rows) split cleanly on
    contiguous head boundaries, so only the merged gate_up columns and the
    packed-int4 row-parallel weights need adjusting."""
    if tp == 1:
        return params
    im = cfg.moe_intermediate_size or cfg.intermediate_size

    def fix_group(layers, moe: bool):
        layers = dict(layers)
        if moe:
            layers["experts_gate_up"] = _llama._permute_cols(
                layers["experts_gate_up"], _llama._rank_major_perm([im, im], tp)
            )
            if "gate_up_shared" in layers:
                isz = im * cfg.num_shared_experts
                layers["gate_up_shared"] = _llama._permute_cols(
                    layers["gate_up_shared"],
                    _llama._rank_major_perm([isz, isz], tp),
                )
                layers["down_shared"] = _llama._repack_p4_for_shards(
                    layers["down_shared"], tp
                )
        else:
            i = cfg.intermediate_size
            layers["gate_up"] = _llama._permute_cols(
                layers["gate_up"], _llama._rank_major_perm([i, i], tp)
            )
            layers["down"] = _llama._repack_p4_for_shards(layers["down"], tp)
        layers["o"] = _llama._repack_p4_for_shards(layers["o"], tp)
        return layers

    out = dict(params)
    if "dense_layers" in params:
        out["dense_layers"] = fix_group(params["dense_layers"], moe=False)
    out["moe_layers"] = fix_group(params["moe_layers"], moe=True)
    if "mtp" in params:
        mtp = dict(params["mtp"])
        mtp["layer"] = fix_group(
            params["mtp"]["layer"], moe="experts_gate_up" in params["mtp"]["layer"]
        )
        out["mtp"] = mtp
    return out
