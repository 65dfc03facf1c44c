"""Paged KV-cache storage and write ops.

Reference equivalents: csrc/cache_kernels.cu — reshape_and_cache_flash (:450),
indexer_k_quant_and_cache (:1145, per-block quant + scales). TPU-native design:
the cache is a pytree of jax arrays threaded functionally through the jitted
step (donated, so XLA updates in place); the write is a flat scatter over
slot indices, which XLA lowers to an in-place dynamic-update on TPU.

Layout: (num_blocks, block_size, num_kv_heads, head_dim); for TP the
num_kv_heads axis is sharded on the mesh "tp" axis.

Quantized KV (int8 / fp8-e4m3): values stored in the quant dtype with
per-token-per-head scales of shape (num_blocks, block_size, num_kv_heads).
This goes beyond the reference, whose MACA fp8-KV dispatch is stubbed off
(csrc/quantization/fp8/metax/quant_utils.cuh:29-43).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_INT8_MAX = 127.0
_FP8_MAX = 448.0  # e4m3 finite max
_FP8_E5M2_MAX = 57344.0


class KVCache(NamedTuple):
    """Paged KV cache (a pytree leaf group).

    Layout is HEAD-MAJOR within a page — (NB, H, BS, D) — so one page DMA
    delivers a (H, BS, D) block the attention kernel consumes per-head
    without transposition (ragged_attention.py keeps (HKV, rows, D) operands
    throughout)."""

    k: jnp.ndarray  # (NB, H, BS, D) model dtype or int8/fp8
    v: jnp.ndarray
    # scales are head-major like the values — (NB, H, BS) — so a quantized
    # page DMA lands scale rows in the exact (HKV, CKV) orientation the
    # kernel multiplies with (no transpose); Mosaic lane alignment then
    # requires block_size % 128 == 0 for the native quantized path
    k_scale: Optional[jnp.ndarray] = None  # (NB, H, BS) f32 if quantized
    v_scale: Optional[jnp.ndarray] = None
    # hybrid linear-attention models (Qwen3-Next gated DeltaNet): per-request
    # recurrent fast-weight state and causal-conv history, indexed by the
    # runner's per-request state slot (NOT paged)
    lin_state: Optional[jnp.ndarray] = None  # (NLIN, RSLOT, Hv, Dk, Dv) f32
    conv_state: Optional[jnp.ndarray] = None  # (NLIN, RSLOT, K-1, CONVDIM)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def block_size(self) -> int:
        return self.k.shape[2]

    @property
    def num_kv_heads(self) -> int:
        return self.k.shape[1]

    @property
    def num_slots(self) -> int:
        return self.k.shape[0] * self.k.shape[2]


def new_kv_cache(
    num_blocks: int,
    block_size: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    model_dtype=jnp.bfloat16,
    store_v: bool = True,
    v_dim: Optional[int] = None,
    fused: bool = False,
) -> KVCache:
    """store_v=False → zero-width v (MLA latent caches keep [ckv|k_pe] in k
    only, ref: concat_and_cache_mla, csrc/cache_kernels.cu:503). v_dim
    overrides the v width: DeepSeek V3.2 stores the 128-wide indexer K rows
    in the v pool alongside the 576-wide latents in k (ref:
    DeepseekV32IndexerCache, vllm_metax/models/deepseek_v2.py:562).

    fused=True (standard-attention pools): K and V live side by side in the
    `k` array as (NB, H, BS, 2D) = [K‖V]; v is zero-width. One page DMA then
    delivers both (half the attention descriptors) and the decode-step
    commit is ONE row scatter of 2D-wide rows instead of two D-wide ones —
    the TPU scatter costs per ROW (~75ns regardless of width ≤512B,
    tools/perf/scatter_probe.py), so fusing halves the dominant commit cost.
    Consumers detect fused-ness structurally: k.shape[-1] == 2 * q-width
    with a zero-width v (MLA latent pools have k-width == q-width)."""
    if v_dim is None:
        v_dim = head_dim if store_v else 0
    quantized = dtype in (jnp.int8, jnp.float8_e4m3fn, jnp.float8_e5m2)
    if fused:
        if not store_v or v_dim != head_dim:
            raise ValueError("fused KV needs symmetric K/V widths")
        k = jnp.zeros(
            (num_blocks, num_kv_heads, block_size, 2 * head_dim), dtype=dtype
        )
        v = jnp.zeros((num_blocks, num_kv_heads, block_size, 0), dtype=dtype)
        if quantized:
            s = jnp.ones(
                (num_blocks, num_kv_heads, block_size), dtype=jnp.float32
            )
            return KVCache(k, v, s, s)
        return KVCache(k, v)
    shape = (num_blocks, num_kv_heads, block_size, head_dim)
    v_shape = (num_blocks, num_kv_heads, block_size, v_dim)
    k = jnp.zeros(shape, dtype=dtype)
    # the V3.2 indexer-K side pool stays bf16 (scales don't apply to it)
    v = jnp.zeros(v_shape, dtype=model_dtype if (not store_v and v_dim) else dtype)
    if quantized:
        s = jnp.ones((num_blocks, num_kv_heads, block_size), dtype=jnp.float32)
        return KVCache(k, v, s, s)
    return KVCache(k, v)


def kv_fused_width(kv_cache: KVCache, q_width: int) -> int:
    """Half-width D if the pool is a fused [K‖V] pool for q of width D,
    else 0. Static shapes → static Python int at trace time."""
    if (
        kv_cache.v is not None
        and kv_cache.v.shape[-1] == 0
        and kv_cache.k.shape[-1] == 2 * q_width
    ):
        return q_width
    return 0


def _quantize_kv(x: jnp.ndarray, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token-per-head symmetric quant. x: (T, H, D) → (values, scales)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # (T, H)
    if dtype == jnp.int8:
        qmax = _INT8_MAX
    elif dtype == jnp.float8_e5m2:
        qmax = _FP8_E5M2_MAX
    else:
        qmax = _FP8_MAX
    scale = jnp.maximum(amax / qmax, 1e-10)
    q = x.astype(jnp.float32) / scale[..., None]
    if dtype == jnp.int8:
        q = jnp.clip(jnp.round(q), -_INT8_MAX, _INT8_MAX)
    return q.astype(dtype), scale


def dequantize_kv(values: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """values: (..., H, D), scale: (..., H) → model-dtype values."""
    return (values.astype(jnp.float32) * scale[..., None]).astype(dtype)


def write_to_kv_cache(
    kv_cache: KVCache,
    k: jnp.ndarray,
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,
    unique_pages: bool = False,
) -> KVCache:
    """Scatter new K/V (T, H, D) into cache slots (ref: reshape_and_cache_flash,
    csrc/cache_kernels.cu:450).

    slot_mapping: (T,) int32 of block_id*block_size+offset; padding tokens use
    an out-of-range sentinel (>= num_slots) which the scatter drops. NOTE:
    negative padding indices would wrap in JAX — callers must use OOB values.

    Fused [K‖V] pools (new_kv_cache fused=True): one scatter of 2D-wide rows
    covers both; scales stay separate.
    """
    nb, h, bs, d = kv_cache.k.shape
    cache_dtype = kv_cache.k.dtype
    fused = (
        v.size
        and kv_cache.v.shape[-1] == 0
        and d == k.shape[-1] + v.shape[-1]
    )
    import jax as _jax

    from vllm_metax_tpu import envs

    if (
        unique_pages  # the slab RMW races if two tokens share a page —
        # only pure-decode steps (one token per request, exclusive last
        # pages) may set this
        and envs.METAX_TPU_KV_COMMIT == "pallas"
        and _jax.devices()[0].platform not in ("cpu", "gpu")
        and bs % 8 == 0
        and d % 128 == 0
        and k.shape[0] <= 256
    ):
        # decode-shaped writes ride the slab-bounce commit kernel as a
        # single-layer commit — the XLA row scatter costs ~70ns per
        # (token, head) ROW (ops/pallas/kv_commit.py); slot_mapping here is
        # already GLOBAL, so nb_layer = the whole pool
        return _write_all_layers_pallas(
            kv_cache, k[None], v[None], slot_mapping, nb, 0, fused
        )
    block_idx = slot_mapping // bs
    off_idx = slot_mapping % bs
    # flat row addressing: row(t, head) = (block*H + head)*BS + off. A plain
    # 1-D row scatter aliases in place inside the layer loop; the equivalent
    # advanced-index form at[block, :, off] made XLA copy the whole cache at
    # the loop boundary (profiled: 2×2.5s per step at 8B).
    rows = (
        (block_idx[:, None] * h + jnp.arange(h, dtype=jnp.int32)[None, :]) * bs
        + off_idx[:, None]
    )  # (T, H)
    rows = jnp.where(
        (slot_mapping >= nb * bs)[:, None], nb * h * bs, rows
    )

    def scatter(cache_arr, vals):
        # cache (NB, H, BS, ...) viewed as (NB*H*BS, ...); vals (T, H, ...)
        if cache_arr.size == 0:  # zero-width v of MLA latent caches
            return cache_arr
        tail = cache_arr.shape[3:]
        flat = cache_arr.reshape((nb * h * bs,) + tail)
        flat = flat.at[rows.reshape(-1)].set(
            vals.reshape((-1,) + tail),
            mode="drop",
            unique_indices=True,
            indices_are_sorted=False,
        )
        return flat.reshape(cache_arr.shape)

    def scatter_scale(scale_arr, vals):
        # head-major scales (NB, H, BS): same flat-row addressing as values
        flat = scale_arr.reshape(nb * h * bs)
        flat = flat.at[rows.reshape(-1)].set(
            vals.reshape(-1),
            mode="drop",
            unique_indices=True,
            indices_are_sorted=False,
        )
        return flat.reshape(scale_arr.shape)

    if kv_cache.quantized:
        kq, ks = _quantize_kv(k, cache_dtype)
        vq, vs = _quantize_kv(v, cache_dtype)
        if fused:
            return kv_cache._replace(
                k=scatter(kv_cache.k, jnp.concatenate([kq, vq], axis=-1)),
                k_scale=scatter_scale(kv_cache.k_scale, ks),
                v_scale=scatter_scale(kv_cache.v_scale, vs),
            )
        return kv_cache._replace(
            k=scatter(kv_cache.k, kq),
            v=scatter(kv_cache.v, vq),
            k_scale=scatter_scale(kv_cache.k_scale, ks),
            v_scale=scatter_scale(kv_cache.v_scale, vs),
        )
    if fused:
        return kv_cache._replace(
            k=scatter(
                kv_cache.k,
                jnp.concatenate([k, v], axis=-1).astype(cache_dtype),
            ),
        )
    return kv_cache._replace(
        k=scatter(kv_cache.k, k.astype(cache_dtype)),
        v=scatter(kv_cache.v, v.astype(cache_dtype)),
    )


def write_all_layers_to_kv_cache(
    kv_cache: KVCache,
    k: jnp.ndarray,  # (L, T, H, D) — per-layer new K, stacked by lax.scan
    v: jnp.ndarray,  # (L, T, H, D)
    slot_mapping: jnp.ndarray,  # (T,) LAYER-LOCAL slots (layer 0's range)
    nb_layer: int,  # blocks per layer in the flat all-layer pool
    first_layer: int = 0,  # pool layer index of k/v's layer 0 (scan groups)
) -> KVCache:
    """One batched BLOCK-granularity write for every layer's K/V of a decode
    step: gather the L·T touched blocks, blend the new token row into each,
    scatter whole blocks back.

    TPU scatter cost is per-ROW (~70ns measured regardless of row width), so
    the natural token-row form (L·T·H rows of 256B) burns ~4.5ms/step at 8B
    shapes. Whole (H, BS, D) blocks cut the row count H-fold and ride the
    memory system at block width; the 2·L·T·H·BS·D read/write amplification
    is bandwidth-cheap (~0.6ms at L=32, T=128, BS=32). Each decode step
    touches exactly one block per (layer, request) and live requests never
    share a block, so the RMW is race-free.
    (ref layout: csrc/cache_kernels.cu:450 reshape_and_cache_flash)

    METAX_TPU_KV_COMMIT selects the lowering:
      pallas (default on TPU) — slab-bounce Pallas kernel: one (L, H, 8, TD)
        DMA-in / blend / DMA-out per token + whole-lane scale rows
        (ops/pallas/kv_commit.py; 0.42ms vs 3.0ms for the scatters at 8B
        flagship shapes).
      rows — one-shot token-row scatter (L*T*H rows; scatter overhead is
        per ROW, ~70ns measured).
      dus — per-token dynamic_update_slice loop on a 5-D
        (L, nb_layer, H, BS, D) view (all layers share the token's
        layer-local slot, so one strided DUS covers every layer). Measured
        SLOWER than rows on v5e (2287 vs 5031 tok/s e2e): the T-iteration
        fori_loop serializes what the scatter runs as one parallel op.
      block — gather-blend-scatter whole blocks; would cut the row count
        H-fold but was observed to hang the TPU compiler on some toolchains
        (2026-08-18 axon v5e incident).
    """
    import jax as _jax

    from vllm_metax_tpu import envs

    nb, h, bs, d = kv_cache.k.shape
    fused = bool(
        v.size and kv_cache.v.shape[-1] == 0 and d == k.shape[3] + v.shape[3]
    )
    on_tpu = _jax.devices()[0].platform not in ("cpu", "gpu")
    if (
        envs.METAX_TPU_KV_COMMIT == "pallas"
        and on_tpu
        and bs % 8 == 0
        and d % 128 == 0
    ):
        return _write_all_layers_pallas(
            kv_cache, k, v, slot_mapping, nb_layer, first_layer, fused
        )
    if fused or envs.METAX_TPU_KV_COMMIT in ("rows", "pallas"):
        # fused [K‖V] pools always take the rows form: ONE scatter of
        # 2D-wide rows commits both sides (scatter cost is per ROW)
        return _write_all_layers_rows(
            kv_cache, k, v, slot_mapping, nb_layer, first_layer
        )
    if envs.METAX_TPU_KV_COMMIT != "block":
        return _write_all_layers_dus(
            kv_cache, k, v, slot_mapping, nb_layer, first_layer
        )
    cache_dtype = kv_cache.k.dtype
    n_layers = k.shape[0]
    block_idx = slot_mapping // bs  # (T,) layer-local
    off_idx = slot_mapping % bs
    pad = slot_mapping >= nb_layer * bs  # (T,)
    gb = jnp.where(
        pad[None, :],
        nb,  # OOB sentinel — scatter drops, gather is clamped
        block_idx[None, :]
        + (first_layer + jnp.arange(n_layers, dtype=jnp.int32))[:, None]
        * nb_layer,
    )  # (L, T) global block ids
    safe = jnp.minimum(gb, nb - 1).reshape(-1)
    sel = (
        jnp.arange(bs, dtype=jnp.int32)[None, None, None, :]
        == off_idx[None, :, None, None]
    )  # (1, T, 1, BS)

    def rmw(cache_arr, vals):  # vals (L, T, H, Dv) or (L, T, H) for scales
        if cache_arr.size == 0:
            return cache_arr
        blocks = jnp.take(cache_arr, safe, axis=0).reshape(
            (n_layers, slot_mapping.shape[0]) + cache_arr.shape[1:]
        )  # (L, T, H, BS[, Dv])
        s = sel if cache_arr.ndim == 3 else sel[..., None]
        nv = vals[:, :, :, None] if cache_arr.ndim == 3 else vals[:, :, :, None, :]
        merged = jnp.where(s, nv.astype(cache_arr.dtype), blocks)
        return cache_arr.at[gb.reshape(-1)].set(
            merged.reshape((-1,) + cache_arr.shape[1:]),
            mode="drop",
            unique_indices=True,
            indices_are_sorted=False,
        )

    if kv_cache.quantized:
        kq, ks = _quantize_kv(k, cache_dtype)
        if v.size:  # zero-width v (MLA latent pools): leave v/v_scale alone
            vq, vs = _quantize_kv(v, cache_dtype)
            return kv_cache._replace(
                k=rmw(kv_cache.k, kq),
                v=rmw(kv_cache.v, vq),
                k_scale=rmw(kv_cache.k_scale, ks),
                v_scale=rmw(kv_cache.v_scale, vs),
            )
        return kv_cache._replace(
            k=rmw(kv_cache.k, kq),
            k_scale=rmw(kv_cache.k_scale, ks),
        )
    return kv_cache._replace(
        k=rmw(kv_cache.k, k.astype(cache_dtype)),
        v=rmw(kv_cache.v, v.astype(cache_dtype)),
    )


def _write_all_layers_pallas(
    kv_cache: KVCache,
    k: jnp.ndarray,  # (L, T, H, D)
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # (T,) layer-local; OOB sentinel = pad
    nb_layer: int,
    first_layer: int,
    fused: bool,
) -> KVCache:
    """Slab-bounce Pallas form of the batched all-layer commit — see
    write_all_layers_to_kv_cache and ops/pallas/kv_commit.py."""
    from vllm_metax_tpu.ops.pallas.kv_commit import commit_token_rows_pallas

    cache_dtype = kv_cache.k.dtype

    def scales_arr(parts):  # list of (L, T, H) → (T, NS, L, H)
        return jnp.stack(parts, axis=0).transpose(2, 0, 1, 3)

    if kv_cache.quantized:
        kq, ks = _quantize_kv(k, cache_dtype)
        if fused:
            vq, vs = _quantize_kv(v, cache_dtype)
            pool, (nks, nvs) = commit_token_rows_pallas(
                kv_cache.k,
                jnp.concatenate([kq, vq], axis=-1),
                slot_mapping,
                (kv_cache.k_scale, kv_cache.v_scale),
                scales_arr([ks, vs]),
                nb_layer,
                first_layer,
            )
            return kv_cache._replace(k=pool, k_scale=nks, v_scale=nvs)
        if v.size:  # separate quantized k/v pools
            vq, vs = _quantize_kv(v, cache_dtype)
            kp, (nks,) = commit_token_rows_pallas(
                kv_cache.k, kq, slot_mapping, (kv_cache.k_scale,),
                scales_arr([ks]), nb_layer, first_layer,
            )
            vp, (nvs,) = commit_token_rows_pallas(
                kv_cache.v, vq, slot_mapping, (kv_cache.v_scale,),
                scales_arr([vs]), nb_layer, first_layer,
            )
            return kv_cache._replace(
                k=kp, v=vp, k_scale=nks, v_scale=nvs
            )
        # zero-width v (MLA latent pools): k side only
        kp, (nks,) = commit_token_rows_pallas(
            kv_cache.k, kq, slot_mapping, (kv_cache.k_scale,),
            scales_arr([ks]), nb_layer, first_layer,
        )
        return kv_cache._replace(k=kp, k_scale=nks)
    if fused:
        pool, _ = commit_token_rows_pallas(
            kv_cache.k,
            jnp.concatenate([k, v], axis=-1).astype(cache_dtype),
            slot_mapping, (), None, nb_layer, first_layer,
        )
        return kv_cache._replace(k=pool)
    kp, _ = commit_token_rows_pallas(
        kv_cache.k, k.astype(cache_dtype), slot_mapping, (), None,
        nb_layer, first_layer,
    )
    if v.size:
        vp, _ = commit_token_rows_pallas(
            kv_cache.v, v.astype(cache_dtype), slot_mapping, (), None,
            nb_layer, first_layer,
        )
        return kv_cache._replace(k=kp, v=vp)
    return kv_cache._replace(k=kp)


def _write_all_layers_dus(
    kv_cache: KVCache,
    k: jnp.ndarray,  # (L, T, H, D)
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # (T,) layer-local; OOB sentinel = pad
    nb_layer: int,
    first_layer: int = 0,
) -> KVCache:
    """dynamic_update_slice form of the batched all-layer commit — see
    write_all_layers_to_kv_cache. One (L, 1, H, 1, D) strided update per
    token covers every layer's K row (all layers share the layer-local
    slot), so the per-step cost is T update ops + the raw ~L·T·H·D bytes,
    not L·T·H scatter-row overheads."""
    nb, h, bs, d = kv_cache.k.shape
    cache_dtype = kv_cache.k.dtype
    n_layers, t = k.shape[0], k.shape[1]
    l_tot = nb // nb_layer
    block_idx = slot_mapping // bs  # (T,) layer-local
    off_idx = slot_mapping % bs
    pad = slot_mapping >= nb_layer * bs

    if kv_cache.quantized:
        kq, ks = _quantize_kv(k, cache_dtype)
        if v.size:
            vq, vs = _quantize_kv(v, cache_dtype)
        else:
            vq = vs = None
    else:
        kq, vq = k.astype(cache_dtype), v.astype(cache_dtype)
        ks = vs = None

    def vals5(arr):  # (L, T, H, Dv) → (T, L, 1, H, 1, Dv) update slabs
        return arr.transpose(1, 0, 2, 3)[:, :, None, :, None, :]

    def scales4(arr):  # (L, T, H) → (T, L, 1, H, 1)
        return arr.transpose(1, 0, 2)[:, :, None, :, None]

    carry = {
        "k": kv_cache.k.reshape(l_tot, nb_layer, h, bs, d),
    }
    upds = {"k": vals5(kq)}
    if vq is not None and vq.size:
        carry["v"] = kv_cache.v.reshape(l_tot, nb_layer, h, bs, vq.shape[-1])
        upds["v"] = vals5(vq)
    if ks is not None:
        carry["ks"] = kv_cache.k_scale.reshape(l_tot, nb_layer, h, bs)
        upds["ks"] = scales4(ks)
        if vs is not None:
            carry["vs"] = kv_cache.v_scale.reshape(l_tot, nb_layer, h, bs)
            upds["vs"] = scales4(vs)

    def body(i, c):
        b = block_idx[i]
        off = off_idx[i]

        def write(c):
            out = dict(c)
            for name, pool in c.items():
                u = jax.lax.dynamic_slice_in_dim(upds[name], i, 1, 0)[0]
                start = (first_layer, b, 0, off) + (
                    (0,) if pool.ndim == 5 else ()
                )
                out[name] = jax.lax.dynamic_update_slice(pool, u, start)
            return out

        return jax.lax.cond(pad[i], lambda c: c, write, c)

    carry = jax.lax.fori_loop(0, t, body, carry)
    return kv_cache._replace(
        k=carry["k"].reshape(kv_cache.k.shape),
        v=carry["v"].reshape(kv_cache.v.shape) if "v" in carry else kv_cache.v,
        k_scale=carry["ks"].reshape(kv_cache.k_scale.shape)
        if "ks" in carry
        else kv_cache.k_scale,
        v_scale=carry["vs"].reshape(kv_cache.v_scale.shape)
        if "vs" in carry
        else kv_cache.v_scale,
    )


def _write_all_layers_rows(
    kv_cache: KVCache,
    k: jnp.ndarray,
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,
    nb_layer: int,
    first_layer: int = 0,
) -> KVCache:
    """Token-row form of the batched all-layer commit (one scatter of
    L·T·H rows) — see write_all_layers_to_kv_cache.

    Deliberately ONE unconditional scatter: a sorted-indices fast path
    behind a `lax.cond(sortable, ...)` measures ~2x faster per row in
    isolation (70 → 36 ns/row, tools/perf/scatter_probe.py) but the cond
    blocks XLA's input/output aliasing of the multi-GB pool inside the
    decode-window while-loop, so each scatter materializes a full pool
    copy (~9.8ms vs ~2.3ms at 8B shapes, profile_step.py). In-place beats
    sorted; keep this branch-free.

    A cond-free always-sorted variant (pads routed to reserved in-bounds
    trash slots + argsort) was also tried and is WORSE at real pool sizes:
    indices_are_sorted=True scatters on a multi-GB pool lower to a slow
    path (~9.8ms/scatter e2e, 3.1k vs 5.0k tok/s; the 2x-faster-sorted
    probe result only holds on ~100MB pools —
    tools/perf/scatter_inplace_probe.py)."""
    nb, h, bs, d = kv_cache.k.shape
    cache_dtype = kv_cache.k.dtype
    n_layers, t = k.shape[0], k.shape[1]
    fused = bool(
        v.size and kv_cache.v.shape[-1] == 0 and d == k.shape[3] + v.shape[3]
    )

    def build_rows(slots):
        block_idx = slots // bs
        off_idx = slots % bs
        rows0 = (
            (block_idx[:, None] * h + jnp.arange(h, dtype=jnp.int32)[None, :])
            * bs
            + off_idx[:, None]
        )  # (T, H) — layer-0 rows
        rows0 = jnp.where(
            (slots >= nb_layer * bs)[:, None], nb * h * bs, rows0
        )
        layer_off = (
            (first_layer + jnp.arange(n_layers, dtype=jnp.int32))[
                :, None, None
            ]
            * (nb_layer * h * bs)
        )
        return jnp.where(
            rows0[None] >= nb * h * bs, nb * h * bs, rows0[None] + layer_off
        ).reshape(-1)

    rows = build_rows(slot_mapping)

    def scatter(cache_arr, vals):
        if cache_arr.size == 0:
            return cache_arr
        tail = cache_arr.shape[3:]
        flat = cache_arr.reshape((nb * h * bs,) + tail)
        flat = flat.at[rows].set(
            vals.reshape((-1,) + tail),
            mode="drop",
            unique_indices=True,
            indices_are_sorted=False,
        )
        return flat.reshape(cache_arr.shape)

    if kv_cache.quantized:
        kq, ks = _quantize_kv(k, cache_dtype)
        if fused:
            vq, vs = _quantize_kv(v, cache_dtype)
            return kv_cache._replace(
                k=scatter(kv_cache.k, jnp.concatenate([kq, vq], axis=-1)),
                k_scale=scatter(
                    kv_cache.k_scale[..., None], ks[..., None]
                )[..., 0],
                v_scale=scatter(
                    kv_cache.v_scale[..., None], vs[..., None]
                )[..., 0],
            )
        if v.size:  # zero-width v (MLA latent pools): leave v/v_scale alone
            vq, vs = _quantize_kv(v, cache_dtype)
            return kv_cache._replace(
                k=scatter(kv_cache.k, kq),
                v=scatter(kv_cache.v, vq),
                k_scale=scatter(
                    kv_cache.k_scale[..., None], ks[..., None]
                )[..., 0],
                v_scale=scatter(
                    kv_cache.v_scale[..., None], vs[..., None]
                )[..., 0],
            )
        return kv_cache._replace(
            k=scatter(kv_cache.k, kq),
            k_scale=scatter(
                kv_cache.k_scale[..., None], ks[..., None]
            )[..., 0],
        )
    if fused:
        return kv_cache._replace(
            k=scatter(
                kv_cache.k,
                jnp.concatenate([k, v], axis=-1).astype(cache_dtype),
            ),
        )
    return kv_cache._replace(
        k=scatter(kv_cache.k, k.astype(cache_dtype)),
        v=scatter(kv_cache.v, v.astype(cache_dtype)),
    )


def gather_kv_for_requests(
    kv_cache: KVCache, block_tables: jnp.ndarray, out_dtype,
    fused_width: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather + dequantize full per-request context KV.

    block_tables: (R, MAXB) — padding entries may be any in-range id; callers
    mask by seq_len. Returns (R, MAXB*BS, H, D) k and v in out_dtype.
    fused_width: half-width D of a fused [K‖V] pool (kv_fused_width) — the
    gathered pages are split back into k and v.
    Reference analog: gather_and_maybe_dequant_cache (cache_kernels.cu:725).
    """
    r, maxb = block_tables.shape
    nb, h, bs, d = kv_cache.k.shape
    fk = jnp.take(kv_cache.k, block_tables, axis=0)  # (R, MAXB, H, BS, D)
    if fused_width:
        k = fk[..., :fused_width]
        v = fk[..., fused_width:]
    else:
        k = fk
        v = jnp.take(kv_cache.v, block_tables, axis=0)
    if kv_cache.quantized:
        ks = jnp.take(kv_cache.k_scale, block_tables, axis=0)  # (R, MAXB, H, BS)
        vs = jnp.take(kv_cache.v_scale, block_tables, axis=0)
        k = k.astype(jnp.float32) * ks[..., None]
        v = v.astype(jnp.float32) * vs[..., None]
    k = jnp.transpose(k, (0, 1, 3, 2, 4)).astype(out_dtype)  # (R,MAXB,BS,H,D)
    v = jnp.transpose(v, (0, 1, 3, 2, 4)).astype(out_dtype)
    return (
        k.reshape(r, maxb * bs, h, k.shape[-1]),
        v.reshape(r, maxb * bs, h, v.shape[-1]),
    )


def move_kv_slots(
    kv_cache: KVCache,
    src_slots: jnp.ndarray,  # (M,) layer-LOCAL token slots; OOB = skip
    dst_slots: jnp.ndarray,  # (M,)
    nb_layer: int,
) -> KVCache:
    """Copy token rows src→dst across EVERY layer of the flat pool — the
    tree-spec KV compaction: accepted tree nodes sit at their list-order
    slots and must land at their path-depth slots before the next step
    (the tree-attn analog of the reference's accepted-path gather,
    v1/attention/backends/tree_attn.py)."""
    nb, h, bs, d = kv_cache.k.shape
    n_layers = nb // nb_layer
    m = src_slots.shape[0]
    layer_off = (
        jnp.arange(n_layers, dtype=jnp.int32)[:, None] * (nb_layer * bs)
    )
    ok = (src_slots < nb_layer * bs) & (dst_slots < nb_layer * bs)
    src = jnp.where(ok[None, :], src_slots[None] + layer_off, 0).reshape(-1)
    dst = jnp.where(
        ok[None, :], dst_slots[None] + layer_off, nb * bs
    ).reshape(-1)  # OOB rows dropped

    def flat_rows(slots):  # (L*M,) token slots → (L*M, H) flat rows
        blk, off = slots // bs, slots % bs
        return (
            (blk[:, None] * h + jnp.arange(h, dtype=jnp.int32)[None, :]) * bs
            + off[:, None]
        )

    src_rows = flat_rows(src).reshape(-1)
    dst_rows = jnp.where(
        (dst >= nb * bs)[:, None], nb * h * bs, flat_rows(dst)
    ).reshape(-1)

    def mv(arr):
        if arr is None or arr.size == 0:
            return arr
        tail = arr.shape[3:]
        flat = arr.reshape((nb * h * bs,) + tail)
        vals = flat[src_rows]
        return flat.at[dst_rows].set(vals, mode="drop").reshape(arr.shape)

    return kv_cache._replace(
        k=mv(kv_cache.k),
        v=mv(kv_cache.v),
        k_scale=None
        if kv_cache.k_scale is None
        else mv(kv_cache.k_scale[..., None])[..., 0],
        v_scale=None
        if kv_cache.v_scale is None
        else mv(kv_cache.v_scale[..., None])[..., 0],
    )


def swap_blocks(src: KVCache, dst: KVCache, src_to_dst: jnp.ndarray) -> KVCache:
    """Copy whole blocks src→dst by (src_id, dst_id) pairs (ref: swap_blocks,
    csrc/cache_kernels.cu:18). Used for CPU offload tiers."""
    s_idx, d_idx = src_to_dst[:, 0], src_to_dst[:, 1]

    def copy(dst_arr, src_arr):
        return dst_arr.at[d_idx].set(src_arr[s_idx], mode="drop")

    return KVCache(
        copy(dst.k, src.k),
        copy(dst.v, src.v),
        None if dst.k_scale is None else copy(dst.k_scale, src.k_scale),
        None if dst.v_scale is None else copy(dst.v_scale, src.v_scale),
    )
