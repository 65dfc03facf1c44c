"""MoE decoder family: Mixtral, Qwen2-MoE, Qwen3-MoE.

Same TPU-native shape as models/llama.py (pure functions, lax.scan over
stacked layers, shard_map TP) with the MLP replaced by the fused-MoE block
(ops/moe.py). Reference analogs: the reference routes these archs through its
forked fused_moe stack (vllm_metax/model_executor/layers/fused_moe/) and
registers BaichuanMoE the same way (models/baichuan_moe.py).

Param tree = llama's, with per-layer:
  router:          {"w": (H, E)}
  experts_gate_up: {"w": (E, H, 2*Im)}   [or quantized bank]
  experts_down:    {"w": (E, Im, H)}
  gate_up_shared / down_shared / shared_gate   [Qwen2-MoE shared expert]
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
    defer_kv_supported,
    layer_view,
    ragged_paged_attention,
)
from vllm_metax_tpu.ops.kv_cache import (
    KVCache,
    write_all_layers_to_kv_cache,
    write_to_kv_cache,
)
from vllm_metax_tpu.ops.layernorm import fused_add_rms_norm, rms_norm
from vllm_metax_tpu.ops.moe import fused_experts, fused_topk
from vllm_metax_tpu.ops.rope import apply_rope, compute_rope_cache

compute_logits = _llama.compute_logits
kv_cache_spec = _llama.kv_cache_spec


def _moe_block(lp, normed, cfg: ModelConfig, act_fn, axis_name, ep_axis_name,
               layer_idx=None, lora_idx=None):
    router_logits = jnp.dot(
        normed, lp["router"]["w"], preferred_element_type=jnp.float32
    )
    renorm = cfg.norm_topk_prob or cfg.architecture == "MixtralForCausalLM"
    weights, ids = fused_topk(router_logits, cfg.num_experts_per_tok, renorm)
    if "expert_map" in lp:
        # EPLB: logical expert id → rebalanced physical slot
        # (parallel/eplb.py; ref: fused_moe.py:1273)
        ids = lp["expert_map"][ids]
    y = fused_experts(
        normed,
        lp["experts_gate_up"],
        lp["experts_down"],
        weights,
        ids,
        act_fn,
        cfg.num_experts,
        ep_axis=ep_axis_name,
        layer_idx=layer_idx,
        lora_idx=lora_idx,
    )
    # routed output: partial over BOTH the expert shard and the FFN shard
    axes = tuple(a for a in (ep_axis_name, axis_name) if a)
    if axes:
        y = jax.lax.psum(y, axes)
    if "gate_up_shared" in lp:
        shared = apply_linear(
            lp["down_shared"],
            act_fn(apply_linear(lp["gate_up_shared"], normed)),
            gather_axis=axis_name,
        )
        if "shared_gate" in lp:
            g = jax.nn.sigmoid(
                jnp.dot(normed, lp["shared_gate"]["w"]).astype(jnp.float32)
            )
            shared = shared * g.astype(shared.dtype)
        if axis_name:  # shared expert shards over tp only
            shared = jax.lax.psum(shared, axis_name)
        y = y + shared
    return y


def embed(params: dict, input_ids: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    return jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)


finalize = _llama.finalize


def run_layers(
    params: dict,
    hidden: jnp.ndarray,
    residual: jnp.ndarray,
    kv_cache: KVCache,
    md: AttentionMetadata,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,
    num_layers: Optional[int] = None,  # local layer count (PP stages)
    layer_offset=0,  # global index of local layer 0 (PP; unused here)
):
    """MoE decoder stack as one lax.scan (PP-splittable like
    models/llama.py run_layers). Multimodal hooks (Qwen3-VL-MoE) are
    metadata-driven: mrope rope rows and deepstack adds come from md."""
    hq = num_q_heads or cfg.num_q_heads
    hkv = num_kv_heads or cfg.num_kv_heads
    d = cfg.head_dim
    eps = cfg.rms_norm_eps
    sm_scale = d**-0.5
    act_fn = ACT2FN[cfg.hidden_act]
    rope_cache = params["rope_cache"]
    n_layers = num_layers or cfg.num_hidden_layers

    if md.mrope_positions is not None:
        from vllm_metax_tpu.ops.rope import mrope_rows

        scaling = cfg.rope_scaling or {}
        rope_cache = mrope_rows(
            rope_cache,
            md.mrope_positions,
            tuple(int(x) for x in scaling["mrope_section"]),
            interleaved=bool(scaling.get("mrope_interleaved", False)),
        )
        rope_pos = jnp.arange(hidden.shape[0], dtype=jnp.int32)
    else:
        rope_pos = None

    def maybe_psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    nb_layer = kv_cache.k.shape[0] // n_layers
    slots_per_layer = nb_layer * kv_cache.block_size
    layers = params["layers"]

    # pure-decode steps defer the KV write to one all-layer scatter after the
    # scan (see models/llama.py run_layers — per-layer scatters are
    # overhead-bound)
    defer = defer_kv_supported(
        jax.ShapeDtypeStruct((hidden.shape[0], hq, d), hidden.dtype),
        kv_cache, md,
    )

    def layer_fn(carry, l):
        if defer:
            hidden, residual = carry
            kv = kv_cache
        else:
            hidden, residual, kv = carry
        md_l = layer_view(md, l, nb_layer, slots_per_layer)

        normed, residual = fused_add_rms_norm(hidden, residual,
                                              layers["ln1"][l], eps)
        qkv = apply_linear(layers["qkv"], normed, layer_idx=l,
                           lora_idx=md.lora_idx)
        t = qkv.shape[0]
        q, k, v = jnp.split(qkv, [hq * d, (hq + hkv) * d], axis=-1)
        q = q.reshape(t, hq, d)
        k = k.reshape(t, hkv, d)
        v = v.reshape(t, hkv, d)
        if "q_norm" in layers:
            q = rms_norm(q, layers["q_norm"][l], eps)
            k = rms_norm(k, layers["k_norm"][l], eps)
        q, k = apply_rope(
            q, k, rope_pos if rope_pos is not None else md.positions,
            rope_cache,
        )
        if defer:
            attn = ragged_paged_attention(
                q, kv, md_l, sm_scale, sliding_window=cfg.sliding_window,
                k_cur=k, v_cur=v,
            )
        else:
            kv = write_to_kv_cache(kv, k, v, md_l.slot_mapping)
            attn = ragged_paged_attention(
                q, kv, md_l, sm_scale, sliding_window=cfg.sliding_window
            )
        attn_out = maybe_psum(
            apply_linear(layers["o"], attn.reshape(t, hq * d), layer_idx=l,
                         lora_idx=md.lora_idx,
                         gather_axis=axis_name)
        )

        normed, residual = fused_add_rms_norm(attn_out, residual,
                                              layers["ln2"][l], eps)
        moe_keys = (
            "router", "experts_gate_up", "experts_down",
            "gate_up_shared", "down_shared", "shared_gate", "expert_map",
        )
        # tiled quantized expert banks stay STACKED over layers: the grouped
        # kernel prefetches the layer index, avoiding a per-layer XLA gather
        # of the packed bank inside the scan (a full extra weight read+write)
        tiled = (
            "w_p4t" in layers["experts_gate_up"]
            or "w_i8t" in layers["experts_gate_up"]
        )
        stacked_keys = (
            ("experts_gate_up", "experts_down") if tiled else ()
        )
        lp = jax.tree_util.tree_map(
            lambda a: a[l],
            {
                name: leaf
                for name, leaf in layers.items()
                if name in moe_keys and name not in stacked_keys
            },
        )
        for sk in stacked_keys:  # NB: must not shadow the attention k/v,
            lp[sk] = layers[sk]  # which defer mode returns as scan ys
        moe_out = _moe_block(
            lp, normed, cfg, act_fn, axis_name, ep_axis_name, layer_idx=l,
            lora_idx=md.lora_idx,
        )
        if md.mm_deepstack is not None:
            kd = md.mm_deepstack.shape[0]
            ds_l = jax.lax.dynamic_index_in_dim(
                md.mm_deepstack, jnp.minimum(l, kd - 1), keepdims=False
            )
            on = jnp.logical_and(l < kd, md.mm_mask)
            moe_out = moe_out + jnp.where(
                on[:, None], ds_l, 0.0
            ).astype(moe_out.dtype)
        if defer:
            return (moe_out, residual), (k, v)
        return (moe_out, residual, kv), None

    if defer:
        (hidden, residual), (ks, vs) = jax.lax.scan(
            layer_fn,
            (hidden, residual),
            jnp.arange(n_layers, dtype=jnp.int32),
        )
        new_kv = write_all_layers_to_kv_cache(
            kv_cache, ks, vs, md.slot_mapping, nb_layer
        )
    else:
        (hidden, residual, new_kv), _ = jax.lax.scan(
            layer_fn,
            (hidden, residual, kv_cache),
            jnp.arange(n_layers, dtype=jnp.int32),
        )
    return hidden, residual, new_kv


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
    hidden = embed(params, input_ids, cfg)
    # multimodal blend (Qwen3-VL-MoE): image embeds over placeholder tokens
    if md.mm_embeds is not None:
        hidden = jnp.where(
            md.mm_mask[:, None], md.mm_embeds.astype(hidden.dtype), hidden
        )
    residual = jnp.zeros_like(hidden)
    hidden, residual, new_kv = run_layers(
        params, hidden, residual, kv_cache, md, cfg,
        num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
        axis_name=axis_name, ep_axis_name=ep_axis_name,
    )
    return finalize(hidden, residual, cfg), new_kv


# ---------------------------------------------------------------- params

def _arch_flags(cfg: ModelConfig):
    arch = cfg.architecture
    return {
        "shared_expert": arch == "Qwen2MoeForCausalLM",
        "qk_norm": cfg.qk_norm,
    }


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
    im = cfg.moe_intermediate_size or cfg.intermediate_size
    flags = _arch_flags(cfg)
    quantize = _llama._layer_quantizer(quant_cfg)

    def dense(shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[0]))
        k = jax.random.fold_in(key, next(counter))
        return (jax.random.normal(k, shape, dtype=jnp.float32) * scale).astype(dt)

    def quantize_bank(bank):
        if quant_cfg is None or not quant_cfg.enabled:
            return bank
        from vllm_metax_tpu.quantization import quantize_linear

        return jax.vmap(lambda w: quantize_linear({"w": w}, quant_cfg))(bank["w"])

    def layer_params():
        hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
        lp = {
            "ln1": jnp.ones((e,), dt),
            "qkv": quantize({"w": dense((e, (hq + 2 * hkv) * d))}),
            "o": quantize({"w": dense((hq * d, e))}),
            "ln2": jnp.ones((e,), dt),
            "router": {"w": dense((e, cfg.num_experts))},
            "experts_gate_up": quantize_bank(
                {"w": dense((cfg.num_experts, e, 2 * im))}
            ),
            "experts_down": quantize_bank({"w": dense((cfg.num_experts, im, e))}),
        }
        if cfg.attention_bias:
            lp["qkv"]["b"] = jnp.zeros(((hq + 2 * hkv) * d,), dt)
        if flags["qk_norm"]:
            lp["q_norm"] = jnp.ones((d,), dt)
            lp["k_norm"] = jnp.ones((d,), dt)
        if flags["shared_expert"]:
            isz = cfg.hf_config.get("shared_expert_intermediate_size", im)
            lp["gate_up_shared"] = quantize({"w": dense((e, 2 * isz))})
            lp["down_shared"] = quantize({"w": dense((isz, e))})
            lp["shared_gate"] = {"w": dense((e, 1))}
        return lp

    layers = [layer_params() for _ in range(cfg.num_hidden_layers)]
    params = {
        "embed": dense((cfg.vocab_size, e), scale=0.02),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": jnp.ones((e,), dt),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
            cfg.rope_scaling,
        ),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense((e, cfg.vocab_size), scale=0.02)
    return params


def load_weights(cfg: ModelConfig, quant_cfg, path: str, reader=None) -> dict:
    """HF safetensors for Mixtral / Qwen2-MoE / Qwen3-MoE layouts (+ the
    PACKED per-layer expert tensors newer checkpoints carry, e.g.
    Qwen3-VL-MoE's mlp.experts.gate_up_proj (E, H, 2I)). `reader` lets
    wrappers inject a key-remapping view (models/qwen2_vl.py)."""
    from vllm_metax_tpu.weights.loader import CheckpointReader

    if reader is None:
        reader = CheckpointReader(path)
    dt = cfg.dtype
    flags = _arch_flags(cfg)
    mixtral = cfg.architecture == "MixtralForCausalLM"
    quantize = _llama._layer_quantizer(quant_cfg)

    def get(name):
        return jnp.asarray(reader.get(name), dtype=dt)

    def getw(name):
        # fp8 checkpoints (per-channel weight_scale or block
        # weight_scale_inv) dequantize at read; quantize() re-encodes
        return _llama.fp8_dequant_read(reader, name, dt)

    def get_linear(prefix, bias=False):
        p = {"w": getw(f"{prefix}.weight").T}
        if bias and reader.has(f"{prefix}.bias"):
            p["b"] = get(f"{prefix}.bias")
        return p

    def merge(ps):
        out = {"w": jnp.concatenate([p["w"] for p in ps], axis=-1)}
        if "b" in ps[0]:
            out["b"] = jnp.concatenate([p["b"] for p in ps], axis=-1)
        return out

    def expert_bank(pre, i):
        if reader.has(f"{pre}.mlp.experts.gate_up_proj"):
            # packed (E, H, 2I) / (E, I, H) tensors — already bank-shaped
            gu = {"w": get(f"{pre}.mlp.experts.gate_up_proj")}
            dn = {"w": get(f"{pre}.mlp.experts.down_proj")}
            if quant_cfg is not None and quant_cfg.enabled:
                from vllm_metax_tpu.quantization import quantize_linear

                gu = jax.vmap(
                    lambda w: quantize_linear({"w": w}, quant_cfg)
                )(gu["w"])
                dn = jax.vmap(
                    lambda w: quantize_linear({"w": w}, quant_cfg)
                )(dn["w"])
            return gu, dn
        gus, downs = [], []
        for j in range(cfg.num_experts):
            if mixtral:
                base = f"{pre}.block_sparse_moe.experts.{j}"
                gate = getw(f"{base}.w1.weight").T
                up = getw(f"{base}.w3.weight").T
                down = getw(f"{base}.w2.weight").T
            else:
                base = f"{pre}.mlp.experts.{j}"
                gate = getw(f"{base}.gate_proj.weight").T
                up = getw(f"{base}.up_proj.weight").T
                down = getw(f"{base}.down_proj.weight").T
            gus.append(jnp.concatenate([gate, up], axis=-1))
            downs.append(down)
        gu = {"w": jnp.stack(gus)}
        dn = {"w": jnp.stack(downs)}
        if quant_cfg is not None and quant_cfg.enabled:
            from vllm_metax_tpu.quantization import quantize_linear

            gu = jax.vmap(lambda w: quantize_linear({"w": w}, quant_cfg))(gu["w"])
            dn = jax.vmap(lambda w: quantize_linear({"w": w}, quant_cfg))(dn["w"])
        return gu, dn

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        router_name = (
            f"{pre}.block_sparse_moe.gate" if mixtral else f"{pre}.mlp.gate"
        )
        gu, dn = expert_bank(pre, i)
        lp = {
            "ln1": get(f"{pre}.input_layernorm.weight"),
            "qkv": quantize(
                merge(
                    [
                        get_linear(f"{pre}.self_attn.q_proj", cfg.attention_bias),
                        get_linear(f"{pre}.self_attn.k_proj", cfg.attention_bias),
                        get_linear(f"{pre}.self_attn.v_proj", cfg.attention_bias),
                    ]
                )
            ),
            "o": quantize(get_linear(f"{pre}.self_attn.o_proj")),
            "ln2": get(f"{pre}.post_attention_layernorm.weight"),
            "router": get_linear(router_name),
            "experts_gate_up": gu,
            "experts_down": dn,
        }
        if flags["qk_norm"]:
            lp["q_norm"] = get(f"{pre}.self_attn.q_norm.weight")
            lp["k_norm"] = get(f"{pre}.self_attn.k_norm.weight")
        if flags["shared_expert"]:
            lp["gate_up_shared"] = quantize(
                merge(
                    [
                        get_linear(f"{pre}.mlp.shared_expert.gate_proj"),
                        get_linear(f"{pre}.mlp.shared_expert.up_proj"),
                    ]
                )
            )
            lp["down_shared"] = quantize(
                get_linear(f"{pre}.mlp.shared_expert.down_proj")
            )
            lp["shared_gate"] = get_linear(f"{pre}.mlp.shared_expert_gate")
        layers.append(lp)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": get("model.norm.weight"),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
            cfg.rope_scaling,
        ),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = get("lm_head.weight").T
    return params


# ---------------------------------------------------------------- sharding

def prepare_for_tp(params: dict, cfg: ModelConfig, tp: int) -> dict:
    if tp == 1:
        return params
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    im = cfg.moe_intermediate_size or cfg.intermediate_size
    layers = dict(params["layers"])
    layers["qkv"] = _llama._permute_cols(
        layers["qkv"], _llama._rank_major_perm([hq * d, hkv * d, hkv * d], tp)
    )
    layers["experts_gate_up"] = _llama._permute_cols(
        layers["experts_gate_up"], _llama._rank_major_perm([im, im], tp)
    )
    if "gate_up_shared" in layers:
        isz = cfg.hf_config.get("shared_expert_intermediate_size", im)
        layers["gate_up_shared"] = _llama._permute_cols(
            layers["gate_up_shared"], _llama._rank_major_perm([isz, isz], tp)
        )
        layers["down_shared"] = _llama._repack_p4_for_shards(
            layers["down_shared"], tp
        )
    layers["o"] = _llama._repack_p4_for_shards(layers["o"], tp)
    # expert banks: int4 repack along their K dim (dim 1 of (E, K/2, N))
    if "w_p4" in layers["experts_down"]:
        from vllm_metax_tpu.ops.quant import pack_int4, unpack_int4

        w_p4 = layers["experts_down"]["w_p4"]  # (L, E, K/2, N)

        def repack(wp):
            q = unpack_int4(wp)
            k = q.shape[0]
            kl = k // tp
            return jnp.concatenate(
                [pack_int4(q[r * kl : (r + 1) * kl]) for r in range(tp)], axis=0
            )

        bank = dict(layers["experts_down"])
        bank["w_p4"] = jax.vmap(jax.vmap(repack))(w_p4)
        layers["experts_down"] = bank
    out = dict(params)
    out["layers"] = layers
    return out


def param_specs(cfg: ModelConfig, quant_cfg=None) -> dict:
    specs = _llama.param_specs(cfg, quant_cfg)
    layer_spec = dict(specs["layers"])
    del layer_spec["gate_up"]
    del layer_spec["down"]
    layer_spec["router"] = {"w": P(None, None, None), "b": P(None, None)}

    def bank_spec(shard_axis):
        # (L, E, K, N): experts shard over "ep"; col-parallel shards N,
        # row-parallel shards K over "tp". Tiled banks (L, E, NT, K, TILE_N)
        # shard NT (col-parallel) or K (row-parallel) over "tp".
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
                "zs": col, "w_p4t": tiled, "w_i8t": tiled,
                # expert-weight LoRA banks (L, n, E, K, R): replicated
                # (tp/ep sharding for expert adapters is unsupported)
                "lora_A": P(None, None, None, None, None),
                "lora_B": P(None, None, None, None, None),
                "lora_s": P(None)}

    layer_spec["experts_gate_up"] = bank_spec(1)
    layer_spec["experts_down"] = bank_spec(0)

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

    layer_spec["gate_up_shared"] = linear_spec(1)
    layer_spec["down_shared"] = linear_spec(0)
    layer_spec["expert_map"] = P(None, None)
    layer_spec["shared_gate"] = {"w": P(None, None, None)}
    specs["layers"] = layer_spec
    return specs
