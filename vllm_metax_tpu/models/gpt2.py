"""GPT-2 decoder (learned positions, LayerNorm, non-gated GELU MLP).

Reference analog: the upstream gpt2.py model def the reference plugin
inherits. Same TPU-native skeleton as models/llama.py: one lax.scan over the
layer index, weights closed over, flat KV pool on the scan carry.

Structural differences from the llama family handled here:
- additive learned position embeddings (wpe) instead of rope
- mean-subtracting LayerNorm with bias (ops/layernorm.py layer_norm)
- non-gated MLP: gelu_new(c_fc(x)) @ c_proj
- biases on every projection; row-parallel biases (attn/mlp output) are
  stored separately and added AFTER the TP psum so they are not multiplied
  by the shard count
- HF stores Conv1D weights as (in, out) — already our (K, N) convention
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_metax_tpu.config import ModelConfig, QuantizationConfig
from vllm_metax_tpu.layers.linear import apply_linear
from vllm_metax_tpu.models.llama import (
    _layer_quantizer,
    _permute_cols,
    _rank_major_perm,
    _repack_p4_for_shards,
)
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
from vllm_metax_tpu.ops.layernorm import layer_norm


def embed(params, input_ids, cfg: ModelConfig, md=None):
    return (
        jnp.take(params["embed"], input_ids, axis=0)
        + jnp.take(params["wpe"], md.positions, axis=0)
    ).astype(cfg.dtype)


def finalize(hidden, residual, cfg: ModelConfig):
    return (
        hidden.astype(jnp.float32) + residual.astype(jnp.float32)
    ).astype(cfg.dtype)


def run_layers(
    params: dict,
    hidden: jnp.ndarray,
    residual: jnp.ndarray,  # PP module contract (plain-add residuals here)
    kv_cache: KVCache,
    md: AttentionMetadata,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,  # unused (dense model)
    num_layers: Optional[int] = None,  # local layer count (PP stages)
    layer_offset=0,  # unused (no global-position layer schedule)
):
    hq = num_q_heads or cfg.num_q_heads
    hkv = num_kv_heads or cfg.num_kv_heads
    d = cfg.head_dim
    eps = cfg.rms_norm_eps  # holds layer_norm_epsilon for GPT-2 configs
    sm_scale = d**-0.5
    layers = params["layers"]
    n_layers = num_layers or cfg.num_hidden_layers

    hidden = (
        hidden.astype(jnp.float32) + residual.astype(jnp.float32)
    ).astype(cfg.dtype)

    def maybe_psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    nb_layer = kv_cache.k.shape[0] // n_layers
    slots_per_layer = nb_layer * kv_cache.block_size

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

        normed = layer_norm(x, layers["ln1_w"][l], layers["ln1_b"][l], eps)
        qkv = apply_linear(layers["qkv"], normed, layer_idx=l)
        t = qkv.shape[0]
        q, k, v = jnp.split(qkv, [hq * d, (hq + hkv) * d], axis=-1)
        q = q.reshape(t, hq, d)
        k = k.reshape(t, hkv, d)
        v = v.reshape(t, hkv, d)
        if defer:
            attn = ragged_paged_attention(q, kv, md_l, sm_scale,
                                          k_cur=k, v_cur=v)
        else:
            kv = write_to_kv_cache(kv, k, v, md_l.slot_mapping)
            attn = ragged_paged_attention(q, kv, md_l, sm_scale)
        attn_out = maybe_psum(
            apply_linear(layers["o"], attn.reshape(t, hq * d), layer_idx=l,
                         gather_axis=axis_name)
        ) + layers["o_b"][l]
        x = x + attn_out

        normed = layer_norm(x, layers["ln2_w"][l], layers["ln2_b"][l], eps)
        h = apply_linear(layers["fc"], normed, layer_idx=l)
        # "gelu_new"/"gelu_pytorch_tanh" → tanh approx; plain "gelu" → exact
        h = jax.nn.gelu(
            h.astype(jnp.float32), approximate=cfg.hidden_act != "gelu"
        ).astype(h.dtype)
        mlp_out = maybe_psum(
            apply_linear(layers["proj"], h, layer_idx=l,
                         gather_axis=axis_name)
        ) + layers["proj_b"][l]
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
    input_ids: jnp.ndarray,
    kv_cache: KVCache,
    md: AttentionMetadata,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,  # unused (dense model)
):
    hidden = embed(params, input_ids, cfg, md=md)
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
    normed = layer_norm(
        hidden, params["final_norm_w"], params["final_norm_b"],
        cfg.rms_norm_eps,
    )
    logits = jnp.dot(
        normed, params["embed"].T, preferred_element_type=jnp.float32
    )
    return logits[:, : cfg.vocab_size]


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

    def dense(shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[0]))
        k = jax.random.fold_in(key, next(counter))
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    quantize = _layer_quantizer(quant_cfg)

    def layer_params():
        # biases are random (not zero) so TP tests catch double-added
        # row-parallel biases
        return {
            "ln1_w": jnp.ones((e,), dt),
            "ln1_b": dense((e,), scale=0.02),
            "qkv": quantize({"w": dense((e, 3 * e)), "b": dense((3 * e,), scale=0.02)}),
            "o": quantize({"w": dense((e, e))}),
            "o_b": dense((e,), scale=0.02),
            "ln2_w": jnp.ones((e,), dt),
            "ln2_b": dense((e,), scale=0.02),
            "fc": quantize({"w": dense((e, i)), "b": dense((i,), scale=0.02)}),
            "proj": quantize({"w": dense((i, e))}),
            "proj_b": dense((e,), scale=0.02),
        }

    layers = [layer_params() for _ in range(cfg.num_hidden_layers)]
    return {
        "embed": dense((cfg.vocab_size, e), scale=0.02),
        "wpe": dense((cfg.max_position_embeddings, e), scale=0.02),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm_w": jnp.ones((e,), dt),
        "final_norm_b": jnp.zeros((e,), dt),
    }


def load_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    from vllm_metax_tpu.weights.loader import CheckpointReader

    reader = CheckpointReader(path)
    dt = cfg.dtype
    quantize = _layer_quantizer(quant_cfg)

    def get(name):
        return jnp.asarray(reader.get(name), dtype=dt)

    layers = []
    for n in range(cfg.num_hidden_layers):
        pre = f"transformer.h.{n}"
        layers.append(
            {
                "ln1_w": get(f"{pre}.ln_1.weight"),
                "ln1_b": get(f"{pre}.ln_1.bias"),
                # Conv1D: weight stored (in, out) — no transpose
                "qkv": quantize(
                    {
                        "w": get(f"{pre}.attn.c_attn.weight"),
                        "b": get(f"{pre}.attn.c_attn.bias"),
                    }
                ),
                "o": quantize({"w": get(f"{pre}.attn.c_proj.weight")}),
                "o_b": get(f"{pre}.attn.c_proj.bias"),
                "ln2_w": get(f"{pre}.ln_2.weight"),
                "ln2_b": get(f"{pre}.ln_2.bias"),
                "fc": quantize(
                    {
                        "w": get(f"{pre}.mlp.c_fc.weight"),
                        "b": get(f"{pre}.mlp.c_fc.bias"),
                    }
                ),
                "proj": quantize({"w": get(f"{pre}.mlp.c_proj.weight")}),
                "proj_b": get(f"{pre}.mlp.c_proj.bias"),
            }
        )

    return {
        "embed": get("transformer.wte.weight"),
        "wpe": get("transformer.wpe.weight"),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm_w": get("transformer.ln_f.weight"),
        "final_norm_b": get("transformer.ln_f.bias"),
    }


# ---------------------------------------------------------------- sharding


def prepare_for_tp(params: dict, cfg: ModelConfig, tp: int) -> dict:
    if tp == 1:
        return params
    e = cfg.hidden_size
    layers = dict(params["layers"])
    layers["qkv"] = _permute_cols(
        layers["qkv"], _rank_major_perm([e, e, e], tp)
    )
    layers["o"] = _repack_p4_for_shards(layers["o"], tp)
    layers["proj"] = _repack_p4_for_shards(layers["proj"], tp)
    out = dict(params)
    out["layers"] = layers
    return out


def param_specs(cfg: ModelConfig, quant_cfg=None) -> dict:
    def linear_spec(shard_axis: int):
        col = P(None, None, "tp") if shard_axis == 1 else P(None, "tp", None)
        p4t = (
            P(None, "tp", None, None)
            if shard_axis == 1
            else P(None, None, "tp", None)
        )
        spec = {
            "w": col,
            "w_i8": col,
            "w_f8": col,
            "w_p4": col,
            "w_p4t": p4t,
            "s": col,
            "zs": col,
            "a8": P(),
            "act_s": P(None),
            "perm": P(None, "tp") if shard_axis == 0 else P(None, None),
            "b": P(None, "tp") if shard_axis == 1 else P(None, None),
        }
        return spec

    rep = P(None, None)
    return {
        "embed": rep,
        "wpe": rep,
        "layers": {
            "ln1_w": rep,
            "ln1_b": rep,
            "qkv": linear_spec(1),
            "o": linear_spec(0),
            "o_b": rep,
            "ln2_w": rep,
            "ln2_b": rep,
            "fc": linear_spec(1),
            "proj": linear_spec(0),
            "proj_b": rep,
        },
        "final_norm_w": P(None),
        "final_norm_b": P(None),
    }


def kv_cache_spec(cfg: ModelConfig) -> dict:
    return {
        "num_layers": cfg.num_hidden_layers,
        "num_kv_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
    }
