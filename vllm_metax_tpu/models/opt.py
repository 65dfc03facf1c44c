"""OPT decoder (learned positions with +2 offset, LayerNorm, ReLU MLP).

Reference analog: the upstream opt.py model def the reference plugin
inherits. Same skeleton as models/gpt2.py.

OPT specifics:
- embed_positions has a fixed +2 offset (rows 0/1 are legacy pad states)
- pre-LN (do_layer_norm_before=True, most sizes) or post-LN (the 350m
  variant) orderings, both supported
- optional project_in/project_out when word_embed_proj_dim != hidden_size
- per-layer norms named self_attn_layer_norm / final_layer_norm; fc1/fc2
  MLP with ReLU (or GELU per config)
- all projections biased; row-parallel biases added after the TP psum
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
from vllm_metax_tpu.models.gpt2 import kv_cache_spec  # noqa: F401 (same spec)
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

_ACTS = {
    "relu": jax.nn.relu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
}


def _pre_ln(cfg: ModelConfig) -> bool:
    return bool(cfg.hf_config.get("do_layer_norm_before", True))


def embed(params, input_ids, cfg: ModelConfig, md=None):
    hidden = jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)
    if "proj_in" in params:
        hidden = apply_linear(params["proj_in"], hidden)
    return hidden + jnp.take(
        params["pos_embed"], md.positions + 2, axis=0
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
    eps = 1e-5
    sm_scale = d**-0.5
    act = _ACTS[cfg.hidden_act]
    pre_ln = _pre_ln(cfg)
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

        h = layer_norm(x, layers["ln1_w"][l], layers["ln1_b"][l], eps) if pre_ln else x
        qkv = apply_linear(layers["qkv"], h, layer_idx=l)
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
        if not pre_ln:
            x = layer_norm(x, layers["ln1_w"][l], layers["ln1_b"][l], eps)

        h = layer_norm(x, layers["ln2_w"][l], layers["ln2_b"][l], eps) if pre_ln else x
        h = apply_linear(layers["fc"], h, layer_idx=l)
        h = act(h.astype(jnp.float32)).astype(h.dtype)
        mlp_out = maybe_psum(
            apply_linear(layers["proj"], h, layer_idx=l,
                         gather_axis=axis_name)
        ) + layers["proj_b"][l]
        x = x + mlp_out
        if not pre_ln:
            x = layer_norm(x, layers["ln2_w"][l], layers["ln2_b"][l], eps)
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
    if _pre_ln(cfg) and "final_norm_w" in params:
        hidden = layer_norm(
            hidden, params["final_norm_w"], params["final_norm_b"], 1e-5
        )
    if "proj_out" in params:
        hidden = apply_linear(params["proj_out"], hidden)
    logits = jnp.dot(
        hidden.astype(cfg.dtype),
        params["embed"].T,
        preferred_element_type=jnp.float32,
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
        "pos_embed": dense((cfg.max_position_embeddings + 2, e), scale=0.02),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm_w": jnp.ones((e,), dt),
        "final_norm_b": dense((e,), scale=0.02),
    }


def load_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    from vllm_metax_tpu.weights.loader import CheckpointReader

    reader = CheckpointReader(path)
    dt = cfg.dtype
    quantize = _layer_quantizer(quant_cfg)

    def get(name):
        return jnp.asarray(reader.get(name), dtype=dt)

    # checkpoints exist both with and without the model. prefix
    root = (
        "model.decoder"
        if reader.has("model.decoder.embed_tokens.weight")
        else "decoder"
    )

    def pfx(name):
        return f"{root}.{name}"

    def lin(prefix, bias=True):
        p = {"w": get(f"{prefix}.weight").T}
        if bias and reader.has(f"{prefix}.bias"):
            p["b"] = get(f"{prefix}.bias")
        return p

    layers = []
    for n in range(cfg.num_hidden_layers):
        pre = pfx(f"layers.{n}")
        o = lin(f"{pre}.self_attn.out_proj")
        o_b = o.pop("b")
        proj = lin(f"{pre}.fc2")
        proj_b = proj.pop("b")
        layers.append(
            {
                "ln1_w": get(f"{pre}.self_attn_layer_norm.weight"),
                "ln1_b": get(f"{pre}.self_attn_layer_norm.bias"),
                "qkv": quantize(
                    {
                        "w": jnp.concatenate(
                            [
                                lin(f"{pre}.self_attn.q_proj")["w"],
                                lin(f"{pre}.self_attn.k_proj")["w"],
                                lin(f"{pre}.self_attn.v_proj")["w"],
                            ],
                            axis=-1,
                        ),
                        "b": jnp.concatenate(
                            [
                                lin(f"{pre}.self_attn.q_proj")["b"],
                                lin(f"{pre}.self_attn.k_proj")["b"],
                                lin(f"{pre}.self_attn.v_proj")["b"],
                            ],
                            axis=-1,
                        ),
                    }
                ),
                "o": quantize(o),
                "o_b": o_b,
                "ln2_w": get(f"{pre}.final_layer_norm.weight"),
                "ln2_b": get(f"{pre}.final_layer_norm.bias"),
                "fc": quantize(lin(f"{pre}.fc1")),
                "proj": quantize(proj),
                "proj_b": proj_b,
            }
        )

    params = {
        "embed": get(pfx("embed_tokens.weight")),
        "pos_embed": get(pfx("embed_positions.weight")),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
    }
    if reader.has(pfx("final_layer_norm.weight")):
        params["final_norm_w"] = get(pfx("final_layer_norm.weight"))
        params["final_norm_b"] = get(pfx("final_layer_norm.bias"))
    if reader.has(pfx("project_in.weight")):
        params["proj_in"] = {"w": get(pfx("project_in.weight")).T}
    if reader.has(pfx("project_out.weight")):
        params["proj_out"] = {"w": get(pfx("project_out.weight")).T}
    return params


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
    from vllm_metax_tpu.models.gpt2 import param_specs as gpt2_param_specs

    specs = gpt2_param_specs(cfg, quant_cfg)
    specs["pos_embed"] = specs.pop("wpe")
    if cfg.hf_config.get("word_embed_proj_dim", cfg.hidden_size) != (
        cfg.hidden_size
    ):
        specs["proj_in"] = {"w": P(None, None)}
        specs["proj_out"] = {"w": P(None, None)}
    return specs
