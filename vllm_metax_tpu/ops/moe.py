"""Fused MoE: routing + grouped expert GEMMs.

TPU-native replacement for the reference's fused-MoE stack
(vllm_metax/model_executor/layers/fused_moe/fused_moe.py — Triton
fused_moe_kernel :352, topk :1150/1188, moe_align_block_size, and the native
mcblasFusedMoe grouped GEMM csrc/moe/moe_ops.cpp:16):

- routing (softmax/sigmoid top-k, DeepSeek grouped top-k) in plain XLA
- the expert GEMMs via `jax.lax.ragged_dot` — XLA's grouped-matmul primitive
  (megablox-style): tokens are sorted by expert, per-expert group sizes drive
  one ragged GEMM per projection. This replaces moe_align_block_size + the
  chunked Triton kernel loop (fused_moe.py:1916) with a single dropless
  sorted-scatter formulation — no capacity factor, no token dropping.
- quantized experts: tiled int4/int8 banks run the Pallas aligned-slot grouped
  dequant-GEMM (ops/pallas/moe_gmm.py — packed bank read once per step);
  non-tiled banks dequantize on the fly in the same pass.
- EP dispatch: DROPLESS token-sharded all-to-all by default for batches
  past the bandwidth crossover (size-exchanged capacity buffers + exact
  replicated fallback on overflow, _fused_experts_a2a); replicated
  dispatch below the crossover / for quantized tiled banks
  (METAX_TPU_EP_DISPATCH=auto|a2a|replicated).

TP: expert weights shard on the intermediate dim (rank-major for the merged
gate|up), psum after w_down — same pattern as the dense MLP path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def fused_topk(
    gating: jnp.ndarray,  # (T, E) router logits
    top_k: int,
    renormalize: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Standard softmax top-k routing (ref: fused_topk, fused_moe.py:1150).
    Returns (weights (T,K) f32, ids (T,K) i32)."""
    probs = jax.nn.softmax(gating.astype(jnp.float32), axis=-1)
    weights, ids = jax.lax.top_k(probs, top_k)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, ids.astype(jnp.int32)


def grouped_topk(
    gating: jnp.ndarray,  # (T, E)
    top_k: int,
    num_groups: int,
    topk_group: int,
    renormalize: bool = True,
    scoring_func: str = "softmax",
    e_score_correction_bias: Optional[jnp.ndarray] = None,  # (E,)
    routed_scaling_factor: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DeepSeek grouped top-k (ref: grouped_topk, fused_moe.py:1188): experts
    are split into groups; only the best `topk_group` groups compete."""
    t, e = gating.shape
    if scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(gating.astype(jnp.float32))
    else:
        scores = jax.nn.softmax(gating.astype(jnp.float32), axis=-1)
    original = scores
    if e_score_correction_bias is not None:
        scores = scores + e_score_correction_bias.astype(jnp.float32)
    gsz = e // num_groups
    grouped = scores.reshape(t, num_groups, gsz)
    if e_score_correction_bias is not None:
        # group score = sum of top-2 expert scores in the group (DeepSeek-V3)
        top2, _ = jax.lax.top_k(grouped, 2)
        group_scores = jnp.sum(top2, axis=-1)
    else:
        group_scores = jnp.max(grouped, axis=-1)  # (T, G)
    _, top_groups = jax.lax.top_k(group_scores, topk_group)  # (T, KG)
    group_mask = jnp.zeros((t, num_groups), bool).at[
        jnp.arange(t)[:, None], top_groups
    ].set(True)
    expert_mask = jnp.repeat(group_mask, gsz, axis=1)  # (T, E)
    masked = jnp.where(expert_mask, scores, -jnp.inf)
    _, ids = jax.lax.top_k(masked, top_k)
    # weights come from the ORIGINAL (bias-free) scores
    weights = jnp.take_along_axis(original, ids, axis=1)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights * routed_scaling_factor, ids.astype(jnp.int32)


def _dequant_bank(bank: dict, dtype) -> jnp.ndarray:
    """Expert weight bank dict → dense (E, K, N) weights."""
    if "w" in bank:
        return bank["w"].astype(dtype)
    if "w_i8" in bank:
        from vllm_metax_tpu.ops.quant import int8_wo_matmul  # noqa: F401

        w = bank["w_i8"].astype(jnp.float32)
        s = bank["s"].astype(jnp.float32)  # (E, G, N)
        e, k, n = w.shape
        g = s.shape[1]
        return (w.reshape(e, g, k // g, n) * s[:, :, None, :]).reshape(
            e, k, n
        ).astype(dtype)
    if "w_p4" in bank:
        from vllm_metax_tpu.ops.quant import dequant_int4

        return jax.vmap(lambda p, s, z: dequant_int4(p, s, z, dtype))(
            bank["w_p4"], bank["s"], bank["zs"]
        )
    if "w_f8" in bank:
        w = bank["w_f8"].astype(jnp.float32) * bank["s"].astype(jnp.float32)
        return w.astype(dtype)
    raise ValueError(f"unknown expert bank keys {list(bank)}")


def _combine_rows(ys: jnp.ndarray, row_token: jnp.ndarray, t: int):
    """Per-token sum of `ys` rows; row_token maps each row to its token id
    (out-of-range ids drop). TPU scatter cost is per ROW, so decode-scale
    waves route the combine through a one-hot MXU matmul instead —
    measured 4.6x faster at T=128 (0.007 vs 0.032 ms) and still ahead at
    T=1024; large prefill waves keep the scatter. HIGHEST precision keeps
    the f32 sums exact to rounding (the products are 0/1 gated)."""
    if t <= 1024:
        p = (
            row_token[None, :]
            == jnp.arange(t, dtype=row_token.dtype)[:, None]
        ).astype(jnp.float32)
        return jax.lax.dot(p, ys, precision=jax.lax.Precision.HIGHEST)
    return jnp.zeros((t, ys.shape[1]), jnp.float32).at[row_token].add(
        ys, mode="drop"
    )


def _expert_lora_delta(xs, sorted_token, sorted_expert, lora_idx, bank):
    """Per-assignment expert-weight LoRA delta: row m (token t routed to
    expert e, adapter slot s = lora_idx[t]) gains
    scale[s] * (xs[m] @ A[s, e]) @ B[s, e]. Banks: lora_A (n, E, K, R),
    lora_B (n, E, R, N), lora_s (n,) with slot 0 = no adapter.
    Ref surface: LoRA over MoE expert weights
    (lora_with_quantization_inference.py semantics extended to experts)."""
    a = bank["lora_A"].astype(jnp.float32)
    b = bank["lora_B"].astype(jnp.float32)
    slot = lora_idx[sorted_token]  # (M,)
    a_rows = a[slot, sorted_expert]  # (M, K, R)
    b_rows = b[slot, sorted_expert]  # (M, R, N)
    xa = jnp.einsum("mk,mkr->mr", xs.astype(jnp.float32), a_rows)
    xa = xa * bank["lora_s"][slot][:, None]
    return jnp.einsum("mr,mrn->mn", xa, b_rows)


def fused_experts(
    x: jnp.ndarray,  # (T, H)
    gate_up_bank: dict,  # {(E_local, H, 2I) layouts; tiled: leading L}
    down_bank: dict,  # {(E_local, I, H) layouts; tiled: leading L}
    topk_weights: jnp.ndarray,  # (T, K) f32
    topk_ids: jnp.ndarray,  # (T, K) i32 GLOBAL expert ids
    act_fn,
    num_experts: int,  # global count
    ep_axis: Optional[str] = None,  # mesh axis sharding the expert dim
    layer_idx=None,  # () i32 — required for stacked tiled banks
    lora_idx: Optional[jnp.ndarray] = None,  # (T,) adapter slot per token
) -> jnp.ndarray:
    """Dropless sorted ragged-GEMM MoE (ref: fused_experts_impl,
    fused_moe.py:1716).

    Expert parallelism (replicated-dispatch): every rank routes all tokens,
    but holds only E/ep experts. The global sort puts each rank's expert span
    CONTIGUOUSLY in the sorted assignment, so a dynamic roll aligns the local
    span to row 0 for the local ragged GEMMs; non-local rows are masked out of
    the combine and the final psum (over ep, done by the caller with the tp
    reduction) sums the per-rank partials. Weight traffic — the decode
    bottleneck — is cut by ep; the collective is the psum the MoE output
    needs anyway (no all-to-all, cf. the reference's all2all backends gate,
    platform.py:202-217)."""
    t, h = x.shape
    k = topk_ids.shape[1]
    dtype = x.dtype

    if (
        ep_axis is not None
        and "w" in gate_up_bank
        and gate_up_bank["w"].shape[0] != num_experts
        and t % jax.lax.axis_size(ep_axis) == 0
    ):
        from vllm_metax_tpu import envs

        mode = envs.METAX_TPU_EP_DISPATCH
        ep = jax.lax.axis_size(ep_axis)
        # "auto" (default): dropless a2a once the batch is large enough for
        # the bandwidth win (a2a moves ~2·T·K·H/ep per rank vs the
        # replicated path's full-batch activation read + (T,H) psum);
        # tiny batches stay replicated (lower latency, no crossover yet)
        has_expert_lora = (
            lora_idx is not None and "lora_A" in gate_up_bank
        )
        if not has_expert_lora and (
            mode == "a2a" or (mode == "auto" and t >= 16 * ep)
        ):
            return _fused_experts_a2a(
                x, gate_up_bank, down_bank, topk_weights, topk_ids,
                act_fn, num_experts, ep_axis,
            )
    elif ep_axis is not None:
        from vllm_metax_tpu import envs

        if envs.METAX_TPU_EP_DISPATCH == "a2a":
            import logging

            logging.getLogger(__name__).warning(
                "METAX_TPU_EP_DISPATCH=a2a requested but unsupported here "
                "(quantized tiled banks or T %% ep != 0) — using "
                "replicated dispatch"
            )

    flat_expert = topk_ids.reshape(-1)  # (T*K,)
    flat_token = jnp.repeat(jnp.arange(t, dtype=jnp.int32), k)
    flat_weight = topk_weights.reshape(-1)

    order = jnp.argsort(flat_expert, stable=True)
    sorted_expert = flat_expert[order]
    sorted_token = flat_token[order]
    sorted_weight = flat_weight[order]

    counts = jnp.zeros(num_experts, jnp.int32).at[flat_expert].add(1)

    if "w_p4t" in gate_up_bank or "w_i8t" in gate_up_bank:
        # fused grouped dequant-GEMM: packed bank read once, no dense
        # (E, K, N) intermediate (ops/pallas/moe_gmm.py)
        return _fused_experts_gmm(
            x, gate_up_bank, down_bank, sorted_token, sorted_weight,
            counts, act_fn, ep_axis, layer_idx,
        )

    w1 = _dequant_bank(gate_up_bank, dtype)  # (E_local, H, 2I)
    w2 = _dequant_bank(down_bank, dtype)  # (E_local, I, H)
    lora = None
    if lora_idx is not None and "lora_A" in gate_up_bank:
        lora = (gate_up_bank, down_bank, lora_idx)
    return _replicated_partial(
        x, w1, w2, sorted_token, sorted_weight, sorted_expert, counts,
        act_fn, num_experts, ep_axis, lora=lora,
    )


def _replicated_partial(
    x, w1, w2, sorted_token, sorted_weight, sorted_expert, counts,
    act_fn, num_experts, ep_axis, lora=None,
):
    """Replicated-dispatch partial over this rank's expert span (the
    caller's psum over ep/tp completes the combine). Dropless by
    construction — also serves as the exact fallback branch of the
    size-exchanged a2a dispatch."""
    t, h = x.shape
    dtype = x.dtype
    xs = x[sorted_token]  # (T*K, H)
    e_local = w1.shape[0]

    if ep_axis is not None and e_local != num_experts:
        rank = jax.lax.axis_index(ep_axis)
        e0 = rank * e_local
        span_start = jnp.sum(jnp.where(jnp.arange(num_experts) < e0, counts, 0))
        local_sizes = jax.lax.dynamic_slice(counts, (e0,), (e_local,))
        xs_l = jnp.roll(xs, -span_start, axis=0)
        hdn = jax.lax.ragged_dot(xs_l, w1, local_sizes)
        hdn = act_fn(hdn)
        ys = jax.lax.ragged_dot(hdn.astype(dtype), w2, local_sizes)
        ys = jnp.roll(ys, span_start, axis=0)
        local = (sorted_expert >= e0) & (sorted_expert < e0 + e_local)
        weight = jnp.where(local, sorted_weight, 0.0)
    else:
        hdn = jax.lax.ragged_dot(xs, w1, counts)
        if lora is not None:
            gu_bank, down_bank, lora_idx = lora
            hdn = (
                hdn.astype(jnp.float32)
                + _expert_lora_delta(
                    xs, sorted_token, sorted_expert, lora_idx, gu_bank
                )
            ).astype(hdn.dtype)
        hdn = act_fn(hdn)
        ys = jax.lax.ragged_dot(hdn.astype(dtype), w2, counts)
        if lora is not None:
            ys = (
                ys.astype(jnp.float32)
                + _expert_lora_delta(
                    hdn, sorted_token, sorted_expert, lora_idx, down_bank
                )
            ).astype(ys.dtype)
        weight = sorted_weight

    ys = ys.astype(jnp.float32) * weight[:, None]
    out = _combine_rows(ys, sorted_token, t)
    return out.astype(dtype)


def _fused_experts_a2a(
    x: jnp.ndarray,  # (T, H) — REPLICATED over the ep axis
    gate_up_bank: dict,
    down_bank: dict,
    topk_weights: jnp.ndarray,  # (T, K)
    topk_ids: jnp.ndarray,  # (T, K) global expert ids
    act_fn,
    num_experts: int,
    ep_axis: str,
    capacity_factor: float = 2.0,
) -> jnp.ndarray:
    """Token-sharded all-to-all EP dispatch (the analog of the reference's
    all2all backends, vllm_metax/platform.py:202-217 VLLM_ALL2ALL_BACKEND).

    Each ep rank routes/dispatches only its T/ep token slice: tokens travel
    to their experts' owner ranks over ICI (lax.all_to_all), the grouped
    GEMM runs on ~T·K/ep rows per rank, and results return by a second
    all_to_all. Rank r contributes rows [r·T/ep, (r+1)·T/ep) of a zero
    (T, H) canvas — the caller's existing psum over (ep, tp) assembles the
    full batch, so the call signature stays drop-in with the replicated
    path.

    DROPLESS: per-destination capacity = ceil(T/ep·K/ep·cf) sizes the
    static a2a buffers; a size exchange (pmax of each rank's would-drop
    flag) detects overflow EXACTLY, and the whole layer falls back to the
    replicated-dispatch branch (same math, dropless) via lax.cond — the
    'over-provisioned + exact fallback' form of the reference's dropless
    deepep backends (platform.py:202-217). With EPLB keeping expert loads
    balanced, the fallback fires only on adversarial routing, so the
    common case keeps the ~2·T·K·H/ep-per-rank a2a volume."""
    t, h = x.shape
    k = topk_ids.shape[1]
    dtype = x.dtype
    ep = jax.lax.axis_size(ep_axis)
    rank = jax.lax.axis_index(ep_axis)
    tl = t // ep

    w1 = _dequant_bank(gate_up_bank, dtype)  # (E_local, H, 2I)
    w2 = _dequant_bank(down_bank, dtype)
    e_local = w1.shape[0]

    x_r = jax.lax.dynamic_slice_in_dim(x, rank * tl, tl, 0)
    ids_r = jax.lax.dynamic_slice_in_dim(topk_ids, rank * tl, tl, 0)
    w_r = jax.lax.dynamic_slice_in_dim(topk_weights, rank * tl, tl, 0)

    flat_ids = ids_r.reshape(-1)  # (tl*k,) global expert ids
    dest = flat_ids // e_local  # owner rank per assignment
    cap = max(8, -(-int(tl * k * capacity_factor) // ep // 8) * 8)

    # slot within each destination's capacity window (cumcount of dest)
    hit = dest[:, None] == jnp.arange(ep, dtype=jnp.int32)[None, :]
    pos = jnp.cumsum(hit, axis=0) - 1  # (tl*k, ep)
    slot = jnp.sum(jnp.where(hit, pos, 0), axis=1)
    # size exchange: would ANY rank overflow its send capacity? (uniform
    # predicate — every rank takes the same branch)
    overflow = jax.lax.pmax(
        jnp.any(slot >= cap).astype(jnp.int32), ep_axis
    ) > 0

    def a2a_branch(_):
        send_idx = dest * cap + slot  # no drops in this branch
        src_row = jnp.repeat(jnp.arange(tl, dtype=jnp.int32), k)

        send_x = jnp.zeros((ep * cap, h), dtype).at[send_idx].set(
            x_r[src_row], mode="drop"
        )
        send_eid = jnp.full((ep * cap,), e_local, jnp.int32).at[send_idx].set(
            flat_ids % e_local, mode="drop"
        )  # pad slots carry e_local (sorts past every real expert)
        send_w = jnp.zeros((ep * cap,), jnp.float32).at[send_idx].set(
            w_r.reshape(-1), mode="drop"
        )

        recv_x = jax.lax.all_to_all(
            send_x.reshape(ep, cap, h), ep_axis, 0, 0
        ).reshape(ep * cap, h)
        recv_eid = jax.lax.all_to_all(
            send_eid.reshape(ep, cap, 1), ep_axis, 0, 0
        ).reshape(ep * cap)

        order = jnp.argsort(recv_eid, stable=True)  # pads sort last
        counts = (
            jnp.zeros(e_local + 1, jnp.int32).at[recv_eid].add(1)[:e_local]
        )
        xs = recv_x[order]
        hdn = act_fn(jax.lax.ragged_dot(xs, w1, counts))
        ys = jax.lax.ragged_dot(hdn.astype(dtype), w2, counts)
        out_slots = jnp.zeros_like(ys).at[order].set(ys)  # to slot layout

        back = jax.lax.all_to_all(
            out_slots.reshape(ep, cap, h), ep_axis, 0, 0
        ).reshape(ep * cap, h)
        yb = back.astype(jnp.float32) * send_w[:, None]  # pads: weight 0
        scatter_row = (
            jnp.full((ep * cap,), tl, jnp.int32)
            .at[send_idx]
            .set(src_row, mode="drop")
        )  # slot → source token row
        y_r = _combine_rows(yb, scatter_row, tl)
        out = jax.lax.dynamic_update_slice(
            jnp.zeros((t, h), jnp.float32), y_r, (rank * tl, 0)
        )
        return out.astype(dtype)

    def replicated_branch(_):
        # exact dropless fallback: identical math to the replicated path
        flat_expert = topk_ids.reshape(-1)
        flat_token = jnp.repeat(jnp.arange(t, dtype=jnp.int32), k)
        order = jnp.argsort(flat_expert, stable=True)
        counts = jnp.zeros(num_experts, jnp.int32).at[flat_expert].add(1)
        return _replicated_partial(
            x, w1, w2, flat_token[order], topk_weights.reshape(-1)[order],
            flat_expert[order], counts, act_fn, num_experts, ep_axis,
        )

    return jax.lax.cond(overflow, replicated_branch, a2a_branch, 0)


def _bank_gmm(xs, bank, tile_expert, layer_idx, tm, interpret):
    """One grouped dequant-GEMM over a tiled stacked expert bank."""
    if "w_p4t" in bank:
        from vllm_metax_tpu.ops.pallas.moe_gmm import int4_grouped_matmul_pallas

        return int4_grouped_matmul_pallas(
            xs, bank["w_p4t"], bank["s"], bank["zs"], tile_expert,
            layer_idx, tm, interpret=interpret,
        )
    from vllm_metax_tpu.ops.pallas.moe_gmm import int8_grouped_matmul_pallas

    return int8_grouped_matmul_pallas(
        xs, bank["w_i8t"], bank["s"], tile_expert, layer_idx, tm,
        interpret=interpret,
    )


def _fused_experts_gmm(
    x, gate_up_bank, down_bank, sorted_token, sorted_weight, counts,
    act_fn, ep_axis, layer_idx,
):
    """Aligned-slot grouped GEMM path for quantized expert banks (replaces
    the reference's fused_moe_kernel_gptq_awq, fused_moe.py:87). Rows land in
    per-expert TM-aligned slots so each (TM, K) m-tile maps to one expert;
    the packed bank streams through the kernel once. EP: each rank computes
    only its expert span (rows outside it are dropped from the slot layout);
    the caller's psum over ep sums the partial combines."""
    import jax as _jax

    from vllm_metax_tpu.ops.pallas.moe_gmm import (
        build_aligned_dispatch,
        moe_tiling,
    )

    if layer_idx is None:
        raise ValueError("tiled expert banks need layer_idx")
    t, h = x.shape
    dtype = x.dtype
    m = sorted_token.shape[0]
    wt = gate_up_bank.get("w_p4t", gate_up_bank.get("w_i8t"))
    e_local = wt.shape[1]
    num_experts = counts.shape[0]
    tm, m_slots = moe_tiling(m, e_local)
    if ep_axis is not None and e_local != num_experts:
        e_start = jax.lax.axis_index(ep_axis) * e_local
    else:
        e_start = jnp.int32(0)
    slot_token, slot_weight, tile_expert = build_aligned_dispatch(
        sorted_token, sorted_weight, counts, e_start, e_local, tm, m_slots
    )
    interpret = _jax.devices()[0].platform == "cpu"
    xs = x[slot_token]  # (M_slots, H); padded slots read row 0, weight 0
    hdn = act_fn(_bank_gmm(xs, gate_up_bank, tile_expert, layer_idx, tm,
                           interpret))
    ys = _bank_gmm(hdn.astype(dtype), down_bank, tile_expert, layer_idx, tm,
                   interpret)
    ys = ys.astype(jnp.float32) * slot_weight[:, None]
    out = _combine_rows(ys, slot_token, t)
    return out.astype(dtype)
