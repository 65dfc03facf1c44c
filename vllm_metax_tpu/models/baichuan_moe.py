"""Baichuan-MoE: per-layer heterogeneous mixture-of-experts.

Reference: vllm_metax/models/baichuan_moe.py — MHA attention with a fused
W_pack qkv, rope_base theta, and a PER-LAYER MoE config
(num_experts_routed/selected/fixed_per_layer, e.g. "1,8,1,8,1,16"):
- routed == 1 → plain dense silu MLP
- routed  > 1 → softmax-top-k routed experts (renormalized) plus an optional
  always-on "fixed" MLP of width intermediate*fixed; the layer output is
  (routed + fixed) / 2 when fixed >= 1 (ref :267-273)
- lm_head is a NormHead: rows are L2-normalized once at load (ref :619-629)

Because expert counts differ per layer, the layer stack cannot be one
homogeneous lax.scan over stacked banks (models/mixtral.py); layers run as
an unrolled Python loop over a per-layer param list — XLA still fuses each
layer body, and weights stay embedded as individual arrays.
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
    defer_kv_supported,
    layer_view,
    ragged_paged_attention,
)
from vllm_metax_tpu.ops.kv_cache import (
    KVCache,
    write_all_layers_to_kv_cache,
    write_to_kv_cache,
)
from vllm_metax_tpu.ops.layernorm import fused_add_rms_norm
from vllm_metax_tpu.ops.moe import fused_experts, fused_topk
from vllm_metax_tpu.ops.rope import apply_rope, compute_rope_cache

compute_logits = _llama.compute_logits


def _moe_plan(cfg: ModelConfig) -> list[dict]:
    """Per-layer (routed, selected, fixed) from the raw HF config strings."""
    hf = cfg.hf_config or {}

    def parse(key, default):
        v = hf.get(key)
        if v is None:
            return [default] * cfg.num_hidden_layers
        if isinstance(v, str):
            v = [int(x.strip()) for x in v.split(",")]
        return list(v)

    routed = parse("num_experts_routed_per_layer", 1)
    selected = parse("num_experts_selected_per_layer", 1)
    fixed = parse("num_experts_fixed_per_layer", 0)
    return [
        {"routed": r, "selected": s, "fixed": f}
        for r, s, f in zip(routed, selected, fixed)
    ]


def kv_cache_spec(cfg: ModelConfig) -> dict:
    return {
        "num_layers": cfg.num_hidden_layers,
        "num_kv_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "store_v": True,
    }


def forward(
    params: dict,
    input_ids: jnp.ndarray,
    kv_cache: KVCache,
    md,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,  # unsupported (heterogeneous banks)
):
    hq = num_q_heads or cfg.num_q_heads
    hkv = num_kv_heads or cfg.num_kv_heads
    d = cfg.head_dim
    eps = cfg.rms_norm_eps
    sm_scale = d**-0.5
    act_fn = ACT2FN[cfg.hidden_act]
    rope_cache = params["rope_cache"]

    def maybe_psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    plan = _moe_plan(cfg)
    hidden = jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)
    residual = jnp.zeros_like(hidden)
    nb_layer = kv_cache.k.shape[0] // cfg.num_hidden_layers
    slots_per_layer = nb_layer * kv_cache.block_size

    # pure-decode steps defer the KV writes to one all-layer scatter after
    # the (unrolled, heterogeneous) layer loop (see models/llama.py)
    defer = defer_kv_supported(
        jax.ShapeDtypeStruct((hidden.shape[0], hq, d), hidden.dtype),
        kv_cache, md,
    )
    deferred_kv = []
    for l, lp in enumerate(params["layer_list"]):
        md_l = layer_view(md, l, nb_layer, slots_per_layer)
        normed, residual = fused_add_rms_norm(hidden, residual, lp["ln1"], eps)

        qkv = apply_linear(lp["w_pack"], normed)
        t = qkv.shape[0]
        q, k, v = jnp.split(qkv, [hq * d, (hq + hkv) * d], axis=-1)
        q = q.reshape(t, hq, d)
        k = k.reshape(t, hkv, d)
        v = v.reshape(t, hkv, d)
        q, k = apply_rope(q, k, md.positions, rope_cache)
        if defer:
            deferred_kv.append((k, v))
            attn = ragged_paged_attention(q, kv_cache, md_l, sm_scale,
                                          k_cur=k, v_cur=v)
        else:
            kv_cache = write_to_kv_cache(kv_cache, k, v, md_l.slot_mapping)
            attn = ragged_paged_attention(q, kv_cache, md_l, sm_scale)
        attn_out = maybe_psum(
            apply_linear(lp["o"], attn.reshape(t, hq * d),
                         gather_axis=axis_name)
        )

        normed, residual = fused_add_rms_norm(attn_out, residual, lp["ln2"], eps)
        if "router" in lp:
            logits = jnp.dot(
                normed, lp["router"]["w"], preferred_element_type=jnp.float32
            )
            weights, ids = fused_topk(logits, plan[l]["selected"])
            y = fused_experts(
                normed, lp["experts_gate_up"], lp["experts_down"],
                weights, ids, act_fn, lp["experts_gate_up"]["w"].shape[0],
            )
            y = maybe_psum(y)
            if "gate_up_fixed" in lp:
                fixed = maybe_psum(
                    apply_linear(
                        lp["down_fixed"],
                        act_fn(apply_linear(lp["gate_up_fixed"], normed)),
                    )
                )
                y = (y + fixed) * 0.5  # ref: final += fixed; final /= 2
            hidden = y
        else:
            hidden = maybe_psum(
                apply_linear(
                    lp["down"], act_fn(apply_linear(lp["gate_up"], normed)),
                    gather_axis=axis_name,
                )
            )

    if defer:
        ks = jnp.stack([k for k, _ in deferred_kv])
        vs = jnp.stack([v for _, v in deferred_kv])
        kv_cache = write_all_layers_to_kv_cache(
            kv_cache, ks, vs, md.slot_mapping, nb_layer
        )

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

    key = jax.random.PRNGKey(seed)
    counter = itertools.count()
    dt = cfg.dtype
    e, i = cfg.hidden_size, cfg.intermediate_size
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    quantize = _llama._layer_quantizer(quant_cfg)

    def dense(shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[0]))
        k = jax.random.fold_in(key, next(counter))
        return (jax.random.normal(k, shape, dtype=jnp.float32) * scale).astype(dt)

    layer_list = []
    for plan in _moe_plan(cfg):
        lp = {
            "ln1": jnp.ones((e,), dt),
            "ln2": jnp.ones((e,), dt),
            "w_pack": quantize({"w": dense((e, (hq + 2 * hkv) * d))}),
            "o": quantize({"w": dense((hq * d, e))}),
        }
        if plan["routed"] > 1:
            ne = plan["routed"]
            lp["router"] = {"w": dense((e, ne))}
            lp["experts_gate_up"] = {"w": dense((ne, e, 2 * i))}
            lp["experts_down"] = {"w": dense((ne, i, e))}
            if plan["fixed"] >= 1:
                fi = i * plan["fixed"]
                lp["gate_up_fixed"] = quantize({"w": dense((e, 2 * fi))})
                lp["down_fixed"] = quantize({"w": dense((fi, e))})
        else:
            lp["gate_up"] = quantize({"w": dense((e, 2 * i))})
            lp["down"] = quantize({"w": dense((i, e))})
        layer_list.append(lp)

    lm_head = dense((e, cfg.vocab_size), scale=0.02)
    # NormHead: rows (per output token) L2-normalized once (ref :619-629)
    lm_head = lm_head / jnp.maximum(
        jnp.linalg.norm(lm_head.astype(jnp.float32), axis=0, keepdims=True),
        1e-6,
    ).astype(dt)
    return {
        "embed": dense((cfg.vocab_size, e), scale=0.02),
        "layer_list": layer_list,
        "final_norm": jnp.ones((e,), dt),
        "lm_head": lm_head,
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings, d, cfg.rope_theta, cfg.rope_scaling
        ),
    }


def load_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    from vllm_metax_tpu.weights.loader import CheckpointReader

    reader = CheckpointReader(path)
    dt = cfg.dtype
    quantize = _llama._layer_quantizer(quant_cfg)

    def get(name):
        return jnp.asarray(reader.get(name), dtype=dt)

    def get_linear(prefix):
        return {"w": get(f"{prefix}.weight").T}

    def gate_up(prefix):
        return quantize(
            {
                "w": jnp.concatenate(
                    [
                        get(f"{prefix}.gate_proj.weight").T,
                        get(f"{prefix}.up_proj.weight").T,
                    ],
                    axis=-1,
                )
            }
        )

    layer_list = []
    for l, plan in enumerate(_moe_plan(cfg)):
        pre = f"model.layers.{l}"
        if reader.has(f"{pre}.self_attn.W_pack.weight"):
            w_pack = get_linear(f"{pre}.self_attn.W_pack")
        else:  # q/k/v split checkpoints (the reference maps both)
            w_pack = {
                "w": jnp.concatenate(
                    [
                        get(f"{pre}.self_attn.q_proj.weight").T,
                        get(f"{pre}.self_attn.k_proj.weight").T,
                        get(f"{pre}.self_attn.v_proj.weight").T,
                    ],
                    axis=-1,
                )
            }
        lp = {
            "ln1": get(f"{pre}.input_layernorm.weight"),
            "ln2": get(f"{pre}.post_attention_layernorm.weight"),
            "w_pack": quantize(w_pack),
            "o": quantize(get_linear(f"{pre}.self_attn.o_proj")),
        }
        if plan["routed"] > 1:
            lp["router"] = get_linear(f"{pre}.mlp.router")
            gus, downs = [], []
            for j in range(plan["routed"]):
                base = f"{pre}.mlp.local_experts_routed.{j}"
                gus.append(
                    jnp.concatenate(
                        [
                            get(f"{base}.gate_proj.weight").T,
                            get(f"{base}.up_proj.weight").T,
                        ],
                        axis=-1,
                    )
                )
                downs.append(get(f"{base}.down_proj.weight").T)
            lp["experts_gate_up"] = {"w": jnp.stack(gus)}
            lp["experts_down"] = {"w": jnp.stack(downs)}
            if plan["fixed"] >= 1:
                fixed_pre = f"{pre}.mlp.local_experts_fixed"
                lp["gate_up_fixed"] = gate_up(fixed_pre)
                lp["down_fixed"] = quantize(
                    get_linear(f"{fixed_pre}.down_proj")
                )
        else:
            lp["gate_up"] = gate_up(f"{pre}.mlp")
            lp["down"] = quantize(get_linear(f"{pre}.mlp.down_proj"))
        layer_list.append(lp)

    head = get("lm_head.weight").T.astype(jnp.float32)  # (E, V)
    head = head / jnp.maximum(
        jnp.linalg.norm(head, axis=0, keepdims=True), 1e-6
    )
    return {
        "embed": get("model.embed_tokens.weight"),
        "layer_list": layer_list,
        "final_norm": get("model.norm.weight"),
        "lm_head": head.astype(dt),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
            cfg.rope_scaling,
        ),
    }


# ---------------------------------------------------------------- sharding

def param_specs(cfg: ModelConfig, quant_cfg=None) -> dict:
    def linear_spec(shard_axis):
        col = P(None, "tp") if shard_axis == 1 else P("tp", None)
        return {"w": col, "w_i8": col, "w_p4": col, "w_f8": col, "s": col,
                "zs": col}

    def bank_spec(shard_axis):
        col = P(None, None, "tp") if shard_axis == 1 else P(None, "tp", None)
        return {"w": col}

    layer_specs = []
    for plan in _moe_plan(cfg):
        lp = {
            "ln1": P(None),
            "ln2": P(None),
            "w_pack": linear_spec(1),
            "o": linear_spec(0),
        }
        if plan["routed"] > 1:
            lp["router"] = {"w": P(None, None)}
            lp["experts_gate_up"] = bank_spec(1)
            lp["experts_down"] = bank_spec(0)
            if plan["fixed"] >= 1:
                lp["gate_up_fixed"] = linear_spec(1)
                lp["down_fixed"] = linear_spec(0)
        else:
            lp["gate_up"] = linear_spec(1)
            lp["down"] = linear_spec(0)
        layer_specs.append(lp)
    return {
        "embed": P(None, None),
        "layer_list": layer_specs,
        "final_norm": P(None),
        "lm_head": P(None, "tp"),
        "rope_cache": P(None, None),
    }


def prepare_for_tp(params: dict, cfg: ModelConfig, tp: int) -> dict:
    if tp == 1:
        return params
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    i = cfg.intermediate_size
    out_layers = []
    for lp, plan in zip(params["layer_list"], _moe_plan(cfg)):
        lp = dict(lp)
        lp["w_pack"] = _llama._permute_cols(
            lp["w_pack"], _llama._rank_major_perm([hq * d, hkv * d, hkv * d], tp)
        )
        lp["o"] = _llama._repack_p4_for_shards(lp["o"], tp)
        if "router" in lp:
            lp["experts_gate_up"] = _llama._permute_cols(
                lp["experts_gate_up"], _llama._rank_major_perm([i, i], tp)
            )
            if "gate_up_fixed" in lp:
                fi = i * plan["fixed"]
                lp["gate_up_fixed"] = _llama._permute_cols(
                    lp["gate_up_fixed"], _llama._rank_major_perm([fi, fi], tp)
                )
                lp["down_fixed"] = _llama._repack_p4_for_shards(
                    lp["down_fixed"], tp
                )
        else:
            lp["gate_up"] = _llama._permute_cols(
                lp["gate_up"], _llama._rank_major_perm([i, i], tp)
            )
            lp["down"] = _llama._repack_p4_for_shards(lp["down"], tp)
        out_layers.append(lp)
    out = dict(params)
    out["layer_list"] = out_layers
    return out
