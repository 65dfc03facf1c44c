"""Qwen3-Next: hybrid Gated-DeltaNet (linear attention) + gated full
attention, with Qwen2-MoE-style sparse MLP.

Reference analogs: the reference ships Qwen3-Next through its FLA kernel
patch (vllm_metax/patch/model_executor/kernel/fla.py) over the HF
architecture (transformers/models/qwen3_next/modeling_qwen3_next.py — the
behavioral spec for every formula below). TPU-native design:

- full_attention layers use the shared paged KV pool (layer_view over the
  layer's FULL-ATTENTION ordinal — linear layers own no pages);
- linear_attention layers keep per-request recurrent fast-weight state and
  causal-conv history in the KVCache's lin_state/conv_state side pools,
  indexed by the runner's per-request state slot (md.state_idx). A request
  whose chunk starts at position 0 resets its slots (preemption-by-recompute
  and slot reuse need no explicit zeroing).
- pure-decode steps run the fully-vectorized single-step delta rule
  (ops/gdn.py gdn_step); ragged prefill/mixed steps run a per-token
  lax.scan (exact; the chunked grid kernel ops/gdn.py gdn_chunked is the
  tested fast path for future batched prefill).
- norms are zero-centered ((1+w), Gemma-style) — folded into the weights at
  load; the linear-attention output norm is gated RMS (norm, *w, *silu(z)).

Tensor parallelism: params are replicated in v1 (specs are all-None);
hybrid sharding is future work.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_metax_tpu.config import ModelConfig, QuantizationConfig
from vllm_metax_tpu.layers.linear import apply_linear
from vllm_metax_tpu.models import llama as _llama
from vllm_metax_tpu.ops.activation import ACT2FN
from vllm_metax_tpu.ops.attention import (
    AttentionMetadata,
    layer_view,
    ragged_paged_attention,
)
from vllm_metax_tpu.ops.gdn import causal_conv1d, gdn_step, l2norm
from vllm_metax_tpu.ops.kv_cache import KVCache, write_to_kv_cache
from vllm_metax_tpu.ops.layernorm import fused_add_rms_norm, rms_norm
from vllm_metax_tpu.ops.moe import fused_experts, fused_topk
from vllm_metax_tpu.ops.rope import apply_rope, compute_rope_cache

compute_logits = _llama.compute_logits

# ragged GDN prefill: grid path when the padded (R+1, T, conv_dim) scratch
# fits; per-token scan otherwise (tests pin both paths)
_GDN_GRID_MAX_BYTES = 64 * 1024 * 1024


def _hp(cfg: ModelConfig) -> dict:
    hc = cfg.hf_config or {}
    return {
        "layer_types": hc.get(
            "layer_types", ["full_attention"] * cfg.num_hidden_layers
        ),
        "nk": hc.get("linear_num_key_heads", 2),
        "nv": hc.get("linear_num_value_heads", 4),
        "dk": hc.get("linear_key_head_dim", 32),
        "dv": hc.get("linear_value_head_dim", 32),
        "ck": hc.get("linear_conv_kernel_dim", 4),
        "rot": hc.get("partial_rotary_factor", 0.25),
        "shared_im": hc.get("shared_expert_intermediate_size", 0),
        "sparse_step": hc.get("decoder_sparse_step", 1),
        "mlp_only": set(hc.get("mlp_only_layers", [])),
    }


def kv_cache_spec(cfg: ModelConfig) -> dict:
    hp = _hp(cfg)
    n_full = sum(t == "full_attention" for t in hp["layer_types"])
    n_lin = len(hp["layer_types"]) - n_full
    conv_dim = 2 * hp["nk"] * hp["dk"] + hp["nv"] * hp["dv"]
    return {
        "num_layers": max(n_full, 1),
        "num_kv_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "linear_layers": n_lin,
        "linear_state_shape": (hp["nv"], hp["dk"], hp["dv"]),
        "conv_state_shape": (hp["ck"] - 1, conv_dim),
    }


def _split_qkvz_ba(qkvz, ba, hp, t):
    """fix_query_key_value_ordering (modeling_qwen3_next.py:631): the fused
    projections interleave per KEY-head [q | k | v-group | z-group]."""
    nk, nv, dk, dv = hp["nk"], hp["nv"], hp["dk"], hp["dv"]
    gvk = nv // nk
    m = qkvz.reshape(t, nk, 2 * dk + 2 * gvk * dv)
    q = m[:, :, :dk]
    k = m[:, :, dk : 2 * dk]
    v = m[:, :, 2 * dk : 2 * dk + gvk * dv].reshape(t, nv, dv)
    z = m[:, :, 2 * dk + gvk * dv :].reshape(t, nv, dv)
    mb = ba.reshape(t, nk, 2 * gvk)
    b = mb[:, :, :gvk].reshape(t, nv)
    a = mb[:, :, gvk:].reshape(t, nv)
    return q, k, v, z, b, a


def _gdn_qkv(lp, normed, hp):
    """Projections + β/g for one linear-attention layer (pre-conv)."""
    t = normed.shape[0]
    q, k, v, z, b, a = _split_qkvz_ba(
        apply_linear(lp["in_qkvz"], normed),
        apply_linear(lp["in_ba"], normed),
        hp, t,
    )
    mixed = jnp.concatenate(
        [q.reshape(t, -1), k.reshape(t, -1), v.reshape(t, -1)], axis=-1
    )
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    g = -jnp.exp(lp["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + lp["dt_bias"].astype(jnp.float32)
    )
    return mixed, z, beta, g


def _gdn_split_mixed(mixed, hp, t):
    nk, nv, dk, dv = hp["nk"], hp["nv"], hp["dk"], hp["dv"]
    q = mixed[:, : nk * dk].reshape(t, nk, dk)
    k = mixed[:, nk * dk : 2 * nk * dk].reshape(t, nk, dk)
    v = mixed[:, 2 * nk * dk :].reshape(t, nv, dv)
    rep = nv // nk
    if rep > 1:
        q = jnp.repeat(q, rep, axis=1)
        k = jnp.repeat(k, rep, axis=1)
    return q, k, v


def _gdn_norm_out(lp, core, z, eps):
    """Gated RMS norm (Qwen3NextRMSNormGated): norm → *w → *silu(z)."""
    cf = core.astype(jnp.float32)
    var = jnp.mean(cf * cf, axis=-1, keepdims=True)
    cf = cf * jax.lax.rsqrt(var + eps) * lp["gdn_norm"].astype(jnp.float32)
    return cf * jax.nn.silu(z.astype(jnp.float32))


def _linear_attn_block(lp, normed, kv, md, cfg, hp, lin_idx):
    """One Gated-DeltaNet layer over the step's token batch."""
    t = normed.shape[0]
    eps = cfg.rms_norm_eps
    nv, dk, dv = hp["nv"], hp["dk"], hp["dv"]
    ck = hp["ck"]
    mixed, z, beta, g = _gdn_qkv(lp, normed, hp)
    conv_w = lp["conv_w"]  # (K, conv_dim)
    lin_state = kv.lin_state  # (NLIN, RSLOT, Hv, Dk, Dv)
    conv_state = kv.conv_state  # (NLIN, RSLOT, K-1, CONV)
    rslot = lin_state.shape[1]
    slots = md.state_idx  # (R,) int32; padding rows carry RSLOT (OOB)
    # bucket-padding TOKENS carry req_idx 0 — routing them by req_idx would
    # corrupt request 0's state (their position-0 even RESETS it). The OOB
    # slot_mapping sentinel identifies them; send them to the scratch slot.
    tok_pad = md.slot_mapping >= kv.k.shape[0] * kv.block_size
    tok_slot = jnp.where(tok_pad, rslot, slots[md.req_idx])  # (T,)

    if md.decode_only:
        # vectorized single-step path: row i IS request i
        r = slots.shape[0]
        safe = jnp.minimum(slots, rslot - 1)
        hist = conv_state[lin_idx][safe]  # (R, K-1, CONV)
        x = mixed[:r][:, None, :]  # (R, 1, CONV)
        y, hist_new = causal_conv1d(x, hist, conv_w)
        q, k, v = _gdn_split_mixed(y[:, 0].astype(normed.dtype), hp, r)
        state = lin_state[lin_idx][safe]
        out, state_new = gdn_step(q, k, v, g[:r], beta[:r], state)
        ok = slots < rslot
        lin_state = lin_state.at[lin_idx, jnp.where(ok, slots, rslot)].set(
            state_new, mode="drop"
        )
        conv_state = conv_state.at[lin_idx, jnp.where(ok, slots, rslot)].set(
            hist_new.astype(conv_state.dtype), mode="drop"
        )
        core = out
        if t > r:
            core = jnp.concatenate(
                [core, jnp.zeros((t - r, nv, dv), jnp.float32)], axis=0
            )
    elif (
        (slots.shape[0] + 1) * t * mixed.shape[1] * mixed.dtype.itemsize
        <= _GDN_GRID_MAX_BYTES
    ):
        # ragged prefill/mixed batch, grid path: scatter tokens into
        # per-request (R+1, T) padded grids (β=0/g=0 pads are state no-ops —
        # ops/gdn.py) and run the CHUNKED delta rule — the batched analog of
        # the reference's varlen FLA prefill. Row R is the scratch row for
        # bucket-padding tokens.
        r = slots.shape[0]
        qsl = md.query_start_loc
        col = jnp.arange(t, dtype=jnp.int32) - qsl[md.req_idx]
        row = jnp.where(tok_pad, r, md.req_idx)
        grid_x = jnp.zeros((r + 1, t, mixed.shape[1]), mixed.dtype).at[
            row, col
        ].set(mixed, mode="drop")
        grid_g = jnp.zeros((r + 1, t, nv), jnp.float32).at[row, col].set(
            g, mode="drop"
        )
        grid_b = jnp.zeros((r + 1, t, nv), jnp.float32).at[row, col].set(
            beta, mode="drop"
        )
        first_pos = md.positions[jnp.minimum(qsl[:-1], t - 1)]  # (R,)
        safe = jnp.minimum(slots, rslot - 1)
        fresh = (first_pos == 0)[:, None]
        h0 = jnp.where(
            fresh[..., None], 0.0, conv_state[lin_idx][safe]
        ).astype(conv_state.dtype)
        s0 = jnp.where(
            fresh[..., None, None], 0.0, lin_state[lin_idx][safe]
        )
        h0 = jnp.concatenate(
            [h0, jnp.zeros((1,) + h0.shape[1:], h0.dtype)], axis=0
        )
        s0 = jnp.concatenate(
            [s0, jnp.zeros((1,) + s0.shape[1:], s0.dtype)], axis=0
        )
        y, _ = causal_conv1d(grid_x, h0, conv_w)
        from vllm_metax_tpu.ops.gdn import gdn_chunked

        qg, kg, vg = _gdn_split_mixed(
            y.reshape((r + 1) * t, -1).astype(normed.dtype), hp, (r + 1) * t
        )
        qg = qg.reshape(r + 1, t, nv, dk)
        kg = kg.reshape(r + 1, t, nv, dk)
        vg = vg.reshape(r + 1, t, nv, dv)
        out_grid, s1 = gdn_chunked(qg, kg, vg, grid_g, grid_b, s0)
        core = out_grid[row, col]  # (T, Hv, Dv) — pads read scratch garbage
        # conv history: last K-1 REAL inputs per request from [h0 | grid_x]
        window = jnp.concatenate([h0, grid_x.astype(h0.dtype)], axis=1)
        n_r = (qsl[1:] - qsl[:-1])[:r]  # scheduled tokens per request
        hist_idx = n_r[:, None] + jnp.arange(ck - 1, dtype=jnp.int32)[None]
        h1 = jnp.take_along_axis(
            window[:r], hist_idx[..., None], axis=1
        )  # (R, K-1, CONV)
        ok = slots < rslot
        wslot = jnp.where(ok, slots, rslot)
        lin_state = lin_state.at[lin_idx, wslot].set(s1[:r], mode="drop")
        conv_state = conv_state.at[lin_idx, wslot].set(
            h1.astype(conv_state.dtype), mode="drop"
        )
    else:
        # ragged prefill/mixed batch: exact per-token scan. Position-0
        # tokens reset their slots (fresh request / recompute-after-preempt).
        def tok_step(carry, xs):
            st, cv = carry  # (RSLOT+1, Hv, Dk, Dv), (RSLOT+1, K-1, CONV)
            mixed_t, g_t, b_t, slot, pos = xs
            fresh = pos == 0
            s0 = jnp.where(fresh, 0.0, st[slot])
            h0 = jnp.where(fresh, 0.0, cv[slot])
            y, h1 = causal_conv1d(
                mixed_t[None, None, :], h0[None], conv_w
            )
            q, k, v = _gdn_split_mixed(y[:, 0].astype(mixed_t.dtype), hp, 1)
            out, s1 = gdn_step(q, k, v, g_t[None], b_t[None], s0[None])
            st = st.at[slot].set(s1[0])
            cv = cv.at[slot].set(h1[0].astype(cv.dtype))
            return (st, cv), out[0]

        # append one scratch slot so padding rows (slot == RSLOT) are inert
        st0 = jnp.concatenate(
            [lin_state[lin_idx],
             jnp.zeros((1,) + lin_state.shape[2:], lin_state.dtype)], axis=0
        )
        cv0 = jnp.concatenate(
            [conv_state[lin_idx],
             jnp.zeros((1,) + conv_state.shape[2:], conv_state.dtype)],
            axis=0,
        )
        (st1, cv1), core = jax.lax.scan(
            tok_step,
            (st0, cv0),
            (mixed, g, beta, jnp.minimum(tok_slot, rslot), md.positions),
        )
        lin_state = lin_state.at[lin_idx].set(st1[:rslot])
        conv_state = conv_state.at[lin_idx].set(cv1[:rslot])

    kv = kv._replace(lin_state=lin_state, conv_state=conv_state)
    gated = _gdn_norm_out(lp, core, z, eps)  # (T, Hv, Dv) f32
    out = apply_linear(lp["out"], gated.reshape(t, nv * dv).astype(normed.dtype))
    return out, kv


def _full_attn_block(lp, normed, kv, md_l, cfg, hp, rope_cache):
    t = normed.shape[0]
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    qg = apply_linear(lp["q"], normed).reshape(t, hq, 2 * d)
    q, gate = qg[..., :d], qg[..., d:]
    q = rms_norm(q, lp["q_norm"], eps)
    k = rms_norm(
        apply_linear(lp["k"], normed).reshape(t, hkv, d), lp["k_norm"], eps
    )
    v = apply_linear(lp["v"], normed).reshape(t, hkv, d)
    q, k = apply_rope(q, k, md_l.positions, rope_cache)  # partial, neox
    kv = write_to_kv_cache(kv, k, v, md_l.slot_mapping)
    attn = ragged_paged_attention(q, kv, md_l, d**-0.5)
    attn = attn * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(attn.dtype)
    return apply_linear(lp["o"], attn.reshape(t, hq * d)), kv


def _mlp_block(lp, normed, cfg, act_fn):
    if "router" in lp:
        logits = jnp.dot(
            normed, lp["router"]["w"], preferred_element_type=jnp.float32
        )
        weights, ids = fused_topk(
            logits, cfg.num_experts_per_tok, cfg.norm_topk_prob
        )
        y = fused_experts(
            normed, lp["experts_gate_up"], lp["experts_down"], weights, ids,
            act_fn, cfg.num_experts,
        )
        if "gate_up_shared" in lp:
            shared = apply_linear(
                lp["down_shared"],
                act_fn(apply_linear(lp["gate_up_shared"], normed)),
            )
            sg = jax.nn.sigmoid(
                jnp.dot(normed, lp["shared_gate"]["w"]).astype(jnp.float32)
            )
            y = y + shared * sg.astype(shared.dtype)
        return y
    return apply_linear(lp["down"], act_fn(apply_linear(lp["gate_up"], normed)))


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
    if axis_name is not None or ep_axis_name is not None:
        raise NotImplementedError(
            "Qwen3-Next runs replicated in v1 (hybrid TP: future work)"
        )
    hp = _hp(cfg)
    eps = cfg.rms_norm_eps
    act_fn = ACT2FN[cfg.hidden_act]
    rope_cache = params["rope_cache"]
    n_full = sum(t == "full_attention" for t in hp["layer_types"])
    nb_layer = kv_cache.k.shape[0] // max(n_full, 1)
    slots_per_layer = nb_layer * kv_cache.block_size

    hidden = jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)
    residual = jnp.zeros_like(hidden)
    full_idx = 0
    lin_idx = 0
    for ltype, lp in zip(hp["layer_types"], params["layer_list"]):
        normed, residual = fused_add_rms_norm(hidden, residual, lp["ln1"], eps)
        if ltype == "full_attention":
            md_l = layer_view(md, full_idx, nb_layer, slots_per_layer)
            attn_out, kv_cache = _full_attn_block(
                lp, normed, kv_cache, md_l, cfg, hp, rope_cache
            )
            full_idx += 1
        else:
            attn_out, kv_cache = _linear_attn_block(
                lp, normed, kv_cache, md, cfg, hp, lin_idx
            )
            lin_idx += 1
        normed, residual = fused_add_rms_norm(attn_out, residual, lp["ln2"], eps)
        hidden = _mlp_block(lp, normed, cfg, act_fn)

    hidden = (
        hidden.astype(jnp.float32) + residual.astype(jnp.float32)
    ).astype(cfg.dtype)
    return hidden, kv_cache


# ---------------------------------------------------------------- params

def init_params(
    cfg: ModelConfig,
    quant_cfg: Optional[QuantizationConfig] = None,
    seed: int = 0,
) -> dict:
    import itertools

    hp = _hp(cfg)
    key = jax.random.PRNGKey(seed)
    counter = itertools.count()
    dt = cfg.dtype
    e = cfg.hidden_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    nk, nv, dk, dv, ck = hp["nk"], hp["nv"], hp["dk"], hp["dv"], hp["ck"]
    conv_dim = 2 * nk * dk + nv * dv

    def dense(shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[0]))
        k = jax.random.fold_in(key, next(counter))
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    def mlp_params(i):
        if cfg.num_experts and i not in hp["mlp_only"] and (
            (i + 1) % hp["sparse_step"] == 0
        ):
            im = cfg.moe_intermediate_size
            lp = {
                "router": {"w": dense((e, cfg.num_experts))},
                "experts_gate_up": {"w": dense((cfg.num_experts, e, 2 * im))},
                "experts_down": {"w": dense((cfg.num_experts, im, e))},
            }
            if hp["shared_im"]:
                lp["gate_up_shared"] = {"w": dense((e, 2 * hp["shared_im"]))}
                lp["down_shared"] = {"w": dense((hp["shared_im"], e))}
                lp["shared_gate"] = {"w": dense((e, 1))}
            return lp
        return {
            "gate_up": {"w": dense((e, 2 * cfg.intermediate_size))},
            "down": {"w": dense((cfg.intermediate_size, e))},
        }

    layer_list = []
    for i, ltype in enumerate(hp["layer_types"]):
        lp = {"ln1": jnp.ones((e,), dt), "ln2": jnp.ones((e,), dt)}
        if ltype == "full_attention":
            lp.update(
                q={"w": dense((e, hq * 2 * d))},
                k={"w": dense((e, hkv * d))},
                v={"w": dense((e, hkv * d))},
                o={"w": dense((hq * d, e))},
                q_norm=jnp.ones((d,), dt),
                k_norm=jnp.ones((d,), dt),
            )
        else:
            lp.update(
                in_qkvz={"w": dense((e, 2 * nk * dk + 2 * nv * dv))},
                in_ba={"w": dense((e, 2 * nv))},
                conv_w=dense((ck, conv_dim), scale=0.5),
                dt_bias=jnp.ones((nv,), jnp.float32),
                A_log=jnp.zeros((nv,), jnp.float32),
                gdn_norm=jnp.ones((dv,), dt),
                out={"w": dense((nv * dv, e))},
            )
        lp.update(mlp_params(i))
        layer_list.append(lp)

    params = {
        "embed": dense((cfg.vocab_size, e), scale=0.02),
        "layer_list": layer_list,
        "final_norm": jnp.ones((e,), dt),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings,
            int(d * hp["rot"]),
            cfg.rope_theta,
            cfg.rope_scaling,
        ),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense((e, cfg.vocab_size), scale=0.02)
    return params


def load_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    from vllm_metax_tpu.weights.loader import CheckpointReader

    hp = _hp(cfg)
    reader = CheckpointReader(path)
    dt = cfg.dtype

    def get(name):
        return jnp.asarray(reader.get(name), dtype=dt)

    def lin(prefix):
        return {"w": get(f"{prefix}.weight").T}

    def zc(name):  # zero-centered RMSNorm: fold the +1 at load
        return get(name) + jnp.ones((), dt)

    layer_list = []
    for i, ltype in enumerate(hp["layer_types"]):
        pre = f"model.layers.{i}"
        lp = {
            "ln1": zc(f"{pre}.input_layernorm.weight"),
            "ln2": zc(f"{pre}.post_attention_layernorm.weight"),
        }
        if ltype == "full_attention":
            at = f"{pre}.self_attn"
            lp.update(
                q=lin(f"{at}.q_proj"),
                k=lin(f"{at}.k_proj"),
                v=lin(f"{at}.v_proj"),
                o=lin(f"{at}.o_proj"),
                q_norm=zc(f"{at}.q_norm.weight"),
                k_norm=zc(f"{at}.k_norm.weight"),
            )
        else:
            la = f"{pre}.linear_attn"
            lp.update(
                in_qkvz=lin(f"{la}.in_proj_qkvz"),
                in_ba=lin(f"{la}.in_proj_ba"),
                # conv1d.weight (CONV, 1, K) → (K, CONV) taps
                conv_w=jnp.transpose(get(f"{la}.conv1d.weight")[:, 0, :]),
                dt_bias=jnp.asarray(reader.get(f"{la}.dt_bias"), jnp.float32),
                A_log=jnp.asarray(reader.get(f"{la}.A_log"), jnp.float32),
                gdn_norm=get(f"{la}.norm.weight"),  # gated norm: NOT 0-centered
                out=lin(f"{la}.out_proj"),
            )
        if reader.has(f"{pre}.mlp.gate.weight"):
            lp["router"] = lin(f"{pre}.mlp.gate")
            gus, dns = [], []
            for j in range(cfg.num_experts):
                base = f"{pre}.mlp.experts.{j}"
                gus.append(
                    jnp.concatenate(
                        [get(f"{base}.gate_proj.weight").T,
                         get(f"{base}.up_proj.weight").T], axis=-1
                    )
                )
                dns.append(get(f"{base}.down_proj.weight").T)
            lp["experts_gate_up"] = {"w": jnp.stack(gus)}
            lp["experts_down"] = {"w": jnp.stack(dns)}
            if reader.has(f"{pre}.mlp.shared_expert.gate_proj.weight"):
                lp["gate_up_shared"] = {
                    "w": jnp.concatenate(
                        [get(f"{pre}.mlp.shared_expert.gate_proj.weight").T,
                         get(f"{pre}.mlp.shared_expert.up_proj.weight").T],
                        axis=-1,
                    )
                }
                lp["down_shared"] = lin(f"{pre}.mlp.shared_expert.down_proj")
                lp["shared_gate"] = lin(f"{pre}.mlp.shared_expert_gate")
        else:
            lp["gate_up"] = {
                "w": jnp.concatenate(
                    [get(f"{pre}.mlp.gate_proj.weight").T,
                     get(f"{pre}.mlp.up_proj.weight").T], axis=-1
                )
            }
            lp["down"] = lin(f"{pre}.mlp.down_proj")
        layer_list.append(lp)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "layer_list": layer_list,
        "final_norm": zc("model.norm.weight"),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings,
            int(cfg.head_dim * hp["rot"]),
            cfg.rope_theta,
            cfg.rope_scaling,
        ),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = get("lm_head.weight").T
    return params


def param_specs(cfg: ModelConfig, quant_cfg=None) -> dict:
    # replicated in v1 — see module docstring
    return jax.tree_util.tree_map(lambda _: P(), init_params_structure(cfg))


def init_params_structure(cfg: ModelConfig):
    """Cheap structural skeleton for spec building (no big arrays)."""
    hp = _hp(cfg)
    lp_list = []
    for i, ltype in enumerate(hp["layer_types"]):
        lp = {"ln1": 0, "ln2": 0}
        if ltype == "full_attention":
            lp.update(q={"w": 0}, k={"w": 0}, v={"w": 0}, o={"w": 0},
                      q_norm=0, k_norm=0)
        else:
            lp.update(in_qkvz={"w": 0}, in_ba={"w": 0}, conv_w=0, dt_bias=0,
                      A_log=0, gdn_norm=0, out={"w": 0})
        if cfg.num_experts and i not in hp["mlp_only"] and (
            (i + 1) % hp["sparse_step"] == 0
        ):
            lp.update(router={"w": 0}, experts_gate_up={"w": 0},
                      experts_down={"w": 0})
            if hp["shared_im"]:
                lp.update(gate_up_shared={"w": 0}, down_shared={"w": 0},
                          shared_gate={"w": 0})
        else:
            lp.update(gate_up={"w": 0}, down={"w": 0})
        lp_list.append(lp)
    s = {"embed": 0, "layer_list": lp_list, "final_norm": 0, "rope_cache": 0}
    if not cfg.tie_word_embeddings:
        s["lm_head"] = 0
    return s
