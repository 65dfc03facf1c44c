"""Gemma family decoder (Gemma 1, Gemma 2).

Reference analog: the upstream Gemma/Gemma2 model defs the reference plugin
inherits (vllm/model_executor/models/gemma{,2}.py behavior). Rebuilt on the
same TPU-native skeleton as models/llama.py (single lax.scan over the layer
index, closed-over stacked weights, flat KV pool).

Family quirks handled here:
- RMSNorm uses a (1 + w) weight; we fold the +1 in at load/init time so the
  shared rms_norm op is unchanged.
- Embedding output is scaled by sqrt(hidden_size) (in model dtype, matching
  the HF normalizer-tensor rounding).
- MLP is GeGLU with tanh-approx GELU.
- Gemma 2 adds: post-attention and post-feedforward "sandwich" norms,
  attention-score soft-capping, final-logit soft-capping, a
  query_pre_attn_scalar-based sm_scale, and sliding-window attention on
  every even layer only (odd layers are global). The alternation runs as a
  lax.cond between two statically-windowed attention calls, so both Pallas
  kernel variants compile once and the scan body stays uniform.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_metax_tpu.config import ModelConfig, QuantizationConfig
from vllm_metax_tpu.layers.linear import apply_linear
from vllm_metax_tpu.models.llama import (
    _layer_quantizer,
    _linear_shape,
    _permute_cols,
    _rank_major_perm,
    _repack_p4_for_shards,
)
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
from vllm_metax_tpu.ops.layernorm import rms_norm
from vllm_metax_tpu.ops.rope import apply_rope, compute_rope_cache


def embed(params: dict, input_ids: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    hidden = jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)
    # Gemma scales embeddings by sqrt(E)
    return hidden * jnp.asarray(cfg.hidden_size**0.5, cfg.dtype)


def finalize(hidden: jnp.ndarray, residual: jnp.ndarray, cfg: ModelConfig):
    return (
        hidden.astype(jnp.float32) + residual.astype(jnp.float32)
    ).astype(cfg.dtype)


def run_layers(
    params: dict,
    hidden: jnp.ndarray,
    residual: jnp.ndarray,  # carried for the PP module contract (plain adds)
    kv_cache: KVCache,
    md: AttentionMetadata,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,  # unused (dense model)
    num_layers: Optional[int] = None,  # local layer count (PP stages)
    layer_offset=0,  # GLOBAL index of local layer 0 (Gemma-2's
    # even/odd sliding-window alternation needs global parity)
):
    hq = num_q_heads or cfg.num_q_heads
    hkv = num_kv_heads or cfg.num_kv_heads
    d = cfg.head_dim
    eps = cfg.rms_norm_eps
    base = cfg.query_pre_attn_scalar or d
    sm_scale = base**-0.5
    act_fn = ACT2FN[cfg.hidden_act]
    rope_cache = params["rope_cache"]
    layers = params["layers"]
    sandwich = "post_attn_ln" in layers  # Gemma 2
    n_layers = num_layers or cfg.num_hidden_layers

    hidden = (
        hidden.astype(jnp.float32) + residual.astype(jnp.float32)
    ).astype(cfg.dtype)

    def maybe_psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    nb_layer = kv_cache.k.shape[0] // n_layers
    slots_per_layer = nb_layer * kv_cache.block_size

    def attend(q, kv, md_l, window, k_cur=None, v_cur=None):
        return ragged_paged_attention(
            q, kv, md_l, sm_scale,
            sliding_window=window,
            logits_soft_cap=cfg.attn_logit_softcapping,
            k_cur=k_cur, v_cur=v_cur,
        )

    # pure-decode steps defer the KV write to one all-layer scatter after
    # the scan (see models/llama.py run_layers)
    defer = defer_kv_supported(
        jax.ShapeDtypeStruct((hidden.shape[0], hq, d), hidden.dtype),
        kv_cache, md,
    )

    def layer_fn(carry, l):
        if defer:
            x, = carry
            kv = kv_cache
        else:
            x, kv = carry
        md_l = layer_view(md, l, nb_layer, slots_per_layer)

        # --- attention
        normed = rms_norm(x, layers["ln1"][l], eps)
        qkv = apply_linear(layers["qkv"], normed, layer_idx=l,
                           lora_idx=md.lora_idx)
        t = qkv.shape[0]
        q, k, v = jnp.split(qkv, [hq * d, (hq + hkv) * d], axis=-1)
        q = q.reshape(t, hq, d)
        k = k.reshape(t, hkv, d)
        v = v.reshape(t, hkv, d)
        q, k = apply_rope(q, k, md.positions, rope_cache)
        if not defer:
            kv = write_to_kv_cache(kv, k, v, md_l.slot_mapping)
        kc, vc = (k, v) if defer else (None, None)
        if cfg.sliding_window and cfg.sliding_window_pattern == 2:
            # even GLOBAL layers sliding, odd global (Gemma 2) — under PP
            # the local index is rebased by the stage's layer_offset
            attn = jax.lax.cond(
                (l + layer_offset) % 2 == 0,
                lambda q, kv, md_l: attend(q, kv, md_l, cfg.sliding_window,
                                           kc, vc),
                lambda q, kv, md_l: attend(q, kv, md_l, 0, kc, vc),
                q, kv, md_l,
            )
        else:
            attn = attend(q, kv, md_l, cfg.sliding_window, kc, vc)
        attn_out = maybe_psum(
            apply_linear(layers["o"], attn.reshape(t, hq * d), layer_idx=l,
                         lora_idx=md.lora_idx,
                         gather_axis=axis_name)
        )
        if sandwich:
            attn_out = rms_norm(attn_out, layers["post_attn_ln"][l], eps)
        x = x + attn_out

        # --- mlp
        normed = rms_norm(x, layers["ln2"][l], eps)
        gate_up = apply_linear(layers["gate_up"], normed, layer_idx=l,
                               lora_idx=md.lora_idx)
        mlp_out = maybe_psum(
            apply_linear(layers["down"], act_fn(gate_up), layer_idx=l,
                         lora_idx=md.lora_idx,
                         gather_axis=axis_name)
        )
        if sandwich:
            mlp_out = rms_norm(mlp_out, layers["post_ffw_ln"][l], eps)
        x = x + mlp_out
        if defer:
            return (x,), (k, v)
        return (x, kv), None

    if defer:
        (hidden,), (ks, vs) = jax.lax.scan(
            layer_fn,
            (hidden,),
            jnp.arange(n_layers, dtype=jnp.int32),
        )
        new_kv = write_all_layers_to_kv_cache(
            kv_cache, ks, vs, md.slot_mapping, nb_layer
        )
    else:
        (hidden, new_kv), _ = jax.lax.scan(
            layer_fn,
            (hidden, kv_cache),
            jnp.arange(n_layers, dtype=jnp.int32),
        )
    return hidden, jnp.zeros_like(hidden), new_kv


def forward(
    params: dict,
    input_ids: jnp.ndarray,  # (T,)
    kv_cache: KVCache,
    md: AttentionMetadata,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,  # unused (dense model)
):
    hidden = embed(params, input_ids, cfg)
    hidden, residual, new_kv = run_layers(
        params, hidden, jnp.zeros_like(hidden), kv_cache, md, cfg,
        num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
        axis_name=axis_name,
    )
    return finalize(hidden, residual, cfg), new_kv


def compute_logits(
    params: dict,
    hidden: jnp.ndarray,
    cfg: ModelConfig,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    normed = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    logits = jnp.dot(
        normed, params["embed"].T, preferred_element_type=jnp.float32
    )
    cap = cfg.final_logit_softcapping
    if cap > 0.0:
        logits = cap * jnp.tanh(logits / cap)
    return logits[:, : cfg.vocab_size]


# ---------------------------------------------------------------- params


def _is_gemma2(cfg: ModelConfig) -> bool:
    return cfg.architecture == "Gemma2ForCausalLM"


def init_params(
    cfg: ModelConfig,
    quant_cfg: Optional[QuantizationConfig] = None,
    seed: int = 0,
) -> dict:
    import itertools

    import numpy as np

    key = jax.random.PRNGKey(seed)
    counter = itertools.count()
    dt = cfg.dtype
    e = cfg.hidden_size

    def dense(shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[0]))
        k = jax.random.fold_in(key, next(counter))
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    quantize = _layer_quantizer(quant_cfg)
    # norm weights are zero-init in HF Gemma; we store (1 + w) = ones
    ones = lambda: jnp.ones((e,), dt)  # noqa: E731

    def layer_params():
        lp = {
            "ln1": ones(),
            "qkv": quantize({"w": dense(_linear_shape("qkv", cfg))}),
            "o": quantize({"w": dense(_linear_shape("o", cfg))}),
            "ln2": ones(),
            "gate_up": quantize({"w": dense(_linear_shape("gate_up", cfg))}),
            "down": quantize({"w": dense(_linear_shape("down", cfg))}),
        }
        if _is_gemma2(cfg):
            lp["post_attn_ln"] = ones()
            lp["post_ffw_ln"] = ones()
        return lp

    layers = [layer_params() for _ in range(cfg.num_hidden_layers)]
    return {
        "embed": dense((cfg.vocab_size, e), scale=0.02),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": jnp.ones((e,), dt),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings,
            cfg.head_dim,
            cfg.rope_theta,
            cfg.rope_scaling,
        ),
    }


def load_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    from vllm_metax_tpu.weights.loader import CheckpointReader

    reader = CheckpointReader(path)
    dt = cfg.dtype
    quantize = _layer_quantizer(quant_cfg)

    def get(name):
        return jnp.asarray(reader.get(name), dtype=dt)

    def norm(name):
        # fold the Gemma (1 + w) offset into the stored weight, in float32
        w = jnp.asarray(reader.get(name), jnp.float32)
        return (w + 1.0).astype(dt)

    def get_linear(prefix):
        return {"w": get(f"{prefix}.weight").T}

    def merge_linears(ps):
        return quantize(
            {"w": jnp.concatenate([p["w"] for p in ps], axis=-1)}
        )

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        lp = {
            "ln1": norm(f"{pre}.input_layernorm.weight"),
            "qkv": merge_linears(
                [
                    get_linear(f"{pre}.self_attn.q_proj"),
                    get_linear(f"{pre}.self_attn.k_proj"),
                    get_linear(f"{pre}.self_attn.v_proj"),
                ]
            ),
            "o": quantize(get_linear(f"{pre}.self_attn.o_proj")),
            "gate_up": merge_linears(
                [
                    get_linear(f"{pre}.mlp.gate_proj"),
                    get_linear(f"{pre}.mlp.up_proj"),
                ]
            ),
            "down": quantize(get_linear(f"{pre}.mlp.down_proj")),
        }
        if _is_gemma2(cfg):
            # HF Gemma-2: post_attention_layernorm norms the attention OUTPUT;
            # pre/post_feedforward_layernorm sandwich the MLP
            lp["post_attn_ln"] = norm(f"{pre}.post_attention_layernorm.weight")
            lp["ln2"] = norm(f"{pre}.pre_feedforward_layernorm.weight")
            lp["post_ffw_ln"] = norm(f"{pre}.post_feedforward_layernorm.weight")
        else:
            lp["ln2"] = norm(f"{pre}.post_attention_layernorm.weight")
        layers.append(lp)

    return {
        "embed": get("model.embed_tokens.weight"),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": norm("model.norm.weight"),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings,
            cfg.head_dim,
            cfg.rope_theta,
            cfg.rope_scaling,
        ),
    }


# ---------------------------------------------------------------- sharding


def prepare_for_tp(params: dict, cfg: ModelConfig, tp: int) -> dict:
    if tp == 1:
        return params
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    i = cfg.intermediate_size
    layers = dict(params["layers"])
    layers["qkv"] = _permute_cols(
        layers["qkv"], _rank_major_perm([hq * d, hkv * d, hkv * d], tp)
    )
    layers["gate_up"] = _permute_cols(
        layers["gate_up"], _rank_major_perm([i, i], tp)
    )
    layers["o"] = _repack_p4_for_shards(layers["o"], tp)
    layers["down"] = _repack_p4_for_shards(layers["down"], tp)
    out = dict(params)
    out["layers"] = layers
    return out


def param_specs(cfg: ModelConfig, quant_cfg=None) -> dict:
    from vllm_metax_tpu.models.llama import param_specs as llama_param_specs

    specs = llama_param_specs(cfg, quant_cfg)
    if _is_gemma2(cfg):
        specs["layers"]["post_attn_ln"] = P(None, None)
        specs["layers"]["post_ffw_ln"] = P(None, None)
    specs.pop("lm_head", None)  # always tied
    return specs


def kv_cache_spec(cfg: ModelConfig) -> dict:
    return {
        "num_layers": cfg.num_hidden_layers,
        "num_kv_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
    }
