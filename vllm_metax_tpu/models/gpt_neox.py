"""GPT-NeoX / Pythia decoder (parallel residual, partial rope, LayerNorm).

Reference analog: the upstream gpt_neox.py model def the reference plugin
inherits. Same skeleton as models/gpt2.py.

NeoX specifics:
- parallel residual (default): x = x + attn(ln1(x)) + mlp(ln2(x)) — the MLP
  reads ln2 of the ORIGINAL x, not of the attention output. The sequential
  variant (use_parallel_residual=False) is also supported.
- fused query_key_value is stored per-head interleaved [q_h|k_h|v_h] blocks;
  a load-time column permutation reorders it to our [Q|K|V] convention.
- partial rotary: only rotary_pct of head_dim is rotated (apply_rope already
  rotates just the leading rot_dim of D).
- untied embed_out head; non-gated GELU MLP; LayerNorm with bias.
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
from vllm_metax_tpu.ops.rope import apply_rope, compute_rope_cache


def _rotary_dim(cfg: ModelConfig) -> int:
    pct = float(cfg.hf_config.get("rotary_pct", 1.0))
    return int(cfg.head_dim * pct)


def embed(params, input_ids, cfg: ModelConfig):
    return jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)


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
    eps = cfg.rms_norm_eps  # layer_norm_eps for NeoX configs
    sm_scale = d**-0.5
    parallel = bool(cfg.hf_config.get("use_parallel_residual", True))
    rope_cache = params["rope_cache"]
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
        q, k = apply_rope(q, k, md.positions, rope_cache)
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

        mlp_in = x if parallel else x + attn_out
        normed = layer_norm(
            mlp_in, layers["ln2_w"][l], layers["ln2_b"][l], eps
        )
        h = apply_linear(layers["fc"], normed, layer_idx=l)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(
            h.dtype
        )
        mlp_out = maybe_psum(
            apply_linear(layers["proj"], h, layer_idx=l,
                         gather_axis=axis_name)
        ) + layers["proj_b"][l]

        x = x + attn_out + mlp_out if parallel else mlp_in + mlp_out
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
    normed = layer_norm(
        hidden, params["final_norm_w"], params["final_norm_b"],
        cfg.rms_norm_eps,
    )
    head = params["lm_head"]
    if isinstance(head, dict):  # int8 weight-only (qc.lm_head_quantized)
        from vllm_metax_tpu.layers.linear import apply_linear

        logits = apply_linear(head, normed).astype(jnp.float32)
    else:
        logits = jnp.dot(normed, head, preferred_element_type=jnp.float32)
    if axis_name:
        logits = jax.lax.all_gather(logits, axis_name, axis=-1, tiled=True)
    return logits[:, : cfg.vocab_size]


# ---------------------------------------------------------------- params


def _qkv_deinterleave_perm(h: int, d: int) -> np.ndarray:
    """Columns of the fused NeoX qkv are per-head [q_h|k_h|v_h] blocks;
    reorder to [all-q | all-k | all-v]."""
    idx = np.arange(3 * h * d).reshape(h, 3, d)
    return np.concatenate(
        [idx[:, 0].ravel(), idx[:, 1].ravel(), idx[:, 2].ravel()]
    ).astype(np.int32)


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
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm_w": jnp.ones((e,), dt),
        "final_norm_b": dense((e,), scale=0.02),
        "lm_head": dense((e, cfg.vocab_size), scale=0.02),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings,
            _rotary_dim(cfg),
            cfg.rope_theta,
            None,
        ),
    }


def load_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    from vllm_metax_tpu.weights.loader import CheckpointReader

    reader = CheckpointReader(path)
    dt = cfg.dtype
    quantize = _layer_quantizer(quant_cfg)
    h, d = cfg.num_q_heads, cfg.head_dim
    perm = _qkv_deinterleave_perm(h, d)

    def get(name):
        return jnp.asarray(reader.get(name), dtype=dt)

    layers = []
    for n in range(cfg.num_hidden_layers):
        pre = f"gpt_neox.layers.{n}"
        layers.append(
            {
                "ln1_w": get(f"{pre}.input_layernorm.weight"),
                "ln1_b": get(f"{pre}.input_layernorm.bias"),
                "qkv": quantize(
                    {
                        "w": get(f"{pre}.attention.query_key_value.weight").T[
                            :, perm
                        ],
                        "b": get(f"{pre}.attention.query_key_value.bias")[perm],
                    }
                ),
                "o": quantize({"w": get(f"{pre}.attention.dense.weight").T}),
                "o_b": get(f"{pre}.attention.dense.bias"),
                "ln2_w": get(f"{pre}.post_attention_layernorm.weight"),
                "ln2_b": get(f"{pre}.post_attention_layernorm.bias"),
                "fc": quantize(
                    {
                        "w": get(f"{pre}.mlp.dense_h_to_4h.weight").T,
                        "b": get(f"{pre}.mlp.dense_h_to_4h.bias"),
                    }
                ),
                "proj": quantize(
                    {"w": get(f"{pre}.mlp.dense_4h_to_h.weight").T}
                ),
                "proj_b": get(f"{pre}.mlp.dense_4h_to_h.bias"),
            }
        )

    return {
        "embed": get("gpt_neox.embed_in.weight"),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm_w": get("gpt_neox.final_layer_norm.weight"),
        "final_norm_b": get("gpt_neox.final_layer_norm.bias"),
        "lm_head": get("embed_out.weight").T,
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings,
            _rotary_dim(cfg),
            cfg.rope_theta,
            None,
        ),
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
    from vllm_metax_tpu.models.gpt2 import param_specs as gpt2_param_specs

    specs = gpt2_param_specs(cfg, quant_cfg)
    specs.pop("wpe")
    specs["rope_cache"] = P(None, None)
    specs["lm_head"] = P(None, "tp")
    return specs
