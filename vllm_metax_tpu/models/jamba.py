"""Jamba: hybrid attention + Mamba + MoE causal LM (AI21).

Reference parity: the selective_scan_fwd kernel the reference compiles
(csrc/mamba/mamba_ssm/selective_scan_fwd.cu) serves vLLM's Jamba-style
hybrids; math target is HF JambaForCausalLM.

TPU-native composition of existing pieces: attention layers ride the
paged-KV pools (NoPE — Jamba attention has no rotary), Mamba layers reuse
models/mamba.py's mixer (with Jamba's dt/B/C RMSNorms) over the hybrid
per-request state pools, and MoE feed-forwards use the grouped-GEMM
fused_experts path with Jamba's softmax-top-k (no renormalization)
routing."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_metax_tpu.config import ModelConfig
from vllm_metax_tpu.layers.linear import apply_linear
from vllm_metax_tpu.models import mamba as _mamba
from vllm_metax_tpu.ops.activation import ACT2FN
from vllm_metax_tpu.ops.attention import (
    AttentionMetadata,
    layer_view,
    ragged_paged_attention,
)
from vllm_metax_tpu.ops.kv_cache import KVCache, write_to_kv_cache
from vllm_metax_tpu.ops.layernorm import rms_norm
from vllm_metax_tpu.ops.moe import fused_experts, fused_topk


def _hp(cfg: ModelConfig) -> dict:
    hf = cfg.hf_config
    d_inner = int(hf.get("mamba_expand", 2)) * cfg.hidden_size
    return {
        "d_inner": d_inner,
        "n": int(hf.get("mamba_d_state", 16)),
        "k": int(hf.get("mamba_d_conv", 4)),
        "dt_rank": int(hf.get("mamba_dt_rank", -(-cfg.hidden_size // 16))),
        "use_bias": bool(hf.get("mamba_proj_bias", False)),
        "use_conv_bias": bool(hf.get("mamba_conv_bias", True)),
        "attn_period": int(hf.get("attn_layer_period", 8)),
        "attn_offset": int(hf.get("attn_layer_offset", 4)),
        "expert_period": int(hf.get("expert_layer_period", 2)),
        "expert_offset": int(hf.get("expert_layer_offset", 1)),
        "num_experts": int(hf.get("num_experts", 16)),
        "top_k": int(hf.get("num_experts_per_tok", 2)),
    }


def _is_attn(l: int, hp: dict) -> bool:
    return l % hp["attn_period"] == hp["attn_offset"]


def _is_moe(l: int, hp: dict) -> bool:
    return hp["num_experts"] > 1 and (
        l % hp["expert_period"] == hp["expert_offset"]
    )


def kv_cache_spec(cfg: ModelConfig) -> dict:
    hp = _hp(cfg)
    n_attn = sum(_is_attn(l, hp) for l in range(cfg.num_hidden_layers))
    return {
        "num_layers": max(n_attn, 1),
        "num_kv_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "linear_layers": cfg.num_hidden_layers - n_attn,
        "linear_state_shape": (hp["d_inner"], hp["n"]),
        "conv_state_shape": (hp["k"] - 1, hp["d_inner"]),
    }


def _attn_block(lp, normed, kv, md_l, cfg):
    t = normed.shape[0]
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    q = apply_linear(lp["q"], normed).reshape(t, hq, d)
    k = apply_linear(lp["k"], normed).reshape(t, hkv, d)
    v = apply_linear(lp["v"], normed).reshape(t, hkv, d)
    # NoPE: Jamba attention has no rotary embedding
    kv = write_to_kv_cache(kv, k, v, md_l.slot_mapping)
    attn = ragged_paged_attention(q, kv, md_l, d**-0.5)
    return apply_linear(lp["o"], attn.reshape(t, hq * d)), kv


def _ffn(lp, normed, cfg, hp, act_fn):
    if "router" in lp:
        logits = jnp.dot(
            normed, lp["router"]["w"], preferred_element_type=jnp.float32
        )
        # Jamba: softmax → top-k WITHOUT renormalization
        weights, ids = fused_topk(logits, hp["top_k"], renormalize=False)
        return fused_experts(
            normed, lp["experts_gate_up"], lp["experts_down"], weights, ids,
            act_fn, hp["num_experts"],
        )
    # ACT2FN entries are FUSED gated activations: they split [gate|up]
    # internally (ops/activation.py)
    gate_up = apply_linear(lp["gate_up"], normed)
    return apply_linear(lp["down"], act_fn(gate_up))


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
        raise NotImplementedError("Jamba runs replicated in v1")
    hp = _hp(cfg)
    eps = cfg.rms_norm_eps
    act_fn = ACT2FN[cfg.hidden_act]
    num_slots = kv_cache.k.shape[0] * kv_cache.block_size
    n_attn = sum(_is_attn(l, hp) for l in range(cfg.num_hidden_layers))
    nb_layer = kv_cache.k.shape[0] // max(n_attn, 1)
    slots_per_layer = nb_layer * kv_cache.block_size

    hidden = jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)
    lin_state = kv_cache.lin_state
    conv_state = kv_cache.conv_state
    attn_idx = 0
    lin_idx = 0
    for l, lp in enumerate(params["layer_list"]):
        normed = rms_norm(hidden, lp["ln1"], eps)
        if _is_attn(l, hp):
            md_l = layer_view(md, attn_idx, nb_layer, slots_per_layer)
            out, kv_cache = _attn_block(lp, normed, kv_cache, md_l, cfg)
            attn_idx += 1
        else:
            out, ls, cs = _mamba._mixer(
                lp, normed, lin_state[lin_idx], conv_state[lin_idx], md,
                cfg, hp, num_slots,
            )
            lin_state = lin_state.at[lin_idx].set(ls)
            conv_state = conv_state.at[lin_idx].set(cs)
            lin_idx += 1
        hidden = hidden + out.astype(hidden.dtype)
        normed = rms_norm(hidden, lp["ln2"], eps)
        hidden = hidden + _ffn(lp, normed, cfg, hp, act_fn).astype(hidden.dtype)
    kv_cache = kv_cache._replace(lin_state=lin_state, conv_state=conv_state)
    hidden = rms_norm(hidden, params["final_norm"], eps)
    return hidden, kv_cache


def compute_logits(params, hidden, cfg: ModelConfig, axis_name=None):
    head = params["lm_head"]
    if isinstance(head, dict):  # int8 weight-only (qc.lm_head_quantized)
        from vllm_metax_tpu.layers.linear import apply_linear

        return apply_linear(head, hidden).astype(jnp.float32)
    return jnp.dot(hidden, head, preferred_element_type=jnp.float32)


def init_params(cfg: ModelConfig, quant_cfg=None, seed: int = 0) -> dict:
    hp = _hp(cfg)
    key = jax.random.PRNGKey(seed)
    e = cfg.hidden_size
    d, n, k, dtr = hp["d_inner"], hp["n"], hp["k"], hp["dt_rank"]
    inter = cfg.intermediate_size
    dt = cfg.dtype

    def dense(kk, shape):
        return (jax.random.normal(kk, shape, jnp.float32) * 0.02).astype(dt)

    layers = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(jax.random.fold_in(key, i), 10)
        lp = {
            "ln1": jnp.ones((e,), jnp.float32),
            "ln2": jnp.ones((e,), jnp.float32),
        }
        if _is_attn(i, hp):
            hq, hkv, hd = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
            lp.update(
                q={"w": dense(ks[0], (e, hq * hd))},
                k={"w": dense(ks[1], (e, hkv * hd))},
                v={"w": dense(ks[2], (e, hkv * hd))},
                o={"w": dense(ks[3], (hq * hd, e))},
            )
        else:
            lp.update(
                in_proj={"w": dense(ks[0], (e, 2 * d))},
                conv_w=dense(ks[1], (k, d)),
                x_proj={"w": dense(ks[2], (d, dtr + 2 * n))},
                dt_proj={
                    "w": dense(ks[3], (dtr, d)),
                    "b": jnp.zeros((d,), dt),
                },
                a_log=jnp.log(jnp.broadcast_to(
                    jnp.arange(1, n + 1, dtype=jnp.float32), (d, n)
                )),
                d_skip=jnp.ones((d,), jnp.float32),
                out_proj={"w": dense(ks[4], (d, e))},
                dt_norm=jnp.ones((dtr,), jnp.float32),
                b_norm=jnp.ones((n,), jnp.float32),
                c_norm=jnp.ones((n,), jnp.float32),
            )
            if hp["use_conv_bias"]:
                lp["conv_b"] = jnp.zeros((d,), dt)
        if _is_moe(i, hp):
            ne = hp["num_experts"]
            lp.update(
                router={"w": dense(ks[5], (e, ne))},
                experts_gate_up={"w": dense(ks[6], (ne, e, 2 * inter))},
                experts_down={"w": dense(ks[7], (ne, inter, e))},
            )
        else:
            lp.update(
                gate_up={"w": dense(ks[5], (e, 2 * inter))},
                down={"w": dense(ks[6], (inter, e))},
            )
        layers.append(lp)
    return {
        "embed": dense(jax.random.fold_in(key, 999), (cfg.vocab_size, e)),
        "layer_list": layers,
        "final_norm": jnp.ones((e,), jnp.float32),
        "lm_head": dense(jax.random.fold_in(key, 998), (e, cfg.vocab_size)),
    }


def load_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    from vllm_metax_tpu.weights.loader import CheckpointReader

    hp = _hp(cfg)
    reader = CheckpointReader(path)
    dt = cfg.dtype

    def get(name, dtype=None):
        return jnp.asarray(reader.get(name), dtype=dtype or dt)

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        lp = {
            "ln1": get(f"{pre}.input_layernorm.weight", jnp.float32),
            "ln2": get(f"{pre}.pre_ff_layernorm.weight", jnp.float32),
        }
        if _is_attn(i, hp):
            lp.update(
                q={"w": get(f"{pre}.self_attn.q_proj.weight").T},
                k={"w": get(f"{pre}.self_attn.k_proj.weight").T},
                v={"w": get(f"{pre}.self_attn.v_proj.weight").T},
                o={"w": get(f"{pre}.self_attn.o_proj.weight").T},
            )
        else:
            mpre = f"{pre}.mamba"
            lp.update(
                in_proj={"w": get(f"{mpre}.in_proj.weight").T},
                conv_w=get(f"{mpre}.conv1d.weight")[:, 0, :].T,
                x_proj={"w": get(f"{mpre}.x_proj.weight").T},
                dt_proj={
                    "w": get(f"{mpre}.dt_proj.weight").T,
                    "b": get(f"{mpre}.dt_proj.bias"),
                },
                a_log=get(f"{mpre}.A_log", jnp.float32),
                d_skip=get(f"{mpre}.D", jnp.float32),
                out_proj={"w": get(f"{mpre}.out_proj.weight").T},
                dt_norm=get(f"{mpre}.dt_layernorm.weight", jnp.float32),
                b_norm=get(f"{mpre}.b_layernorm.weight", jnp.float32),
                c_norm=get(f"{mpre}.c_layernorm.weight", jnp.float32),
            )
            if reader.has(f"{mpre}.conv1d.bias"):
                lp["conv_b"] = get(f"{mpre}.conv1d.bias")
            if reader.has(f"{mpre}.in_proj.bias"):
                lp["in_proj"]["b"] = get(f"{mpre}.in_proj.bias")
            if reader.has(f"{mpre}.out_proj.bias"):
                lp["out_proj"]["b"] = get(f"{mpre}.out_proj.bias")
        fpre = f"{pre}.feed_forward"
        if _is_moe(i, hp):
            ne = hp["num_experts"]
            lp.update(
                router={"w": get(f"{fpre}.router.weight").T},
                experts_gate_up={"w": jnp.stack([
                    jnp.concatenate(
                        [
                            get(f"{fpre}.experts.{x}.gate_proj.weight").T,
                            get(f"{fpre}.experts.{x}.up_proj.weight").T,
                        ],
                        axis=-1,
                    )
                    for x in range(ne)
                ])},
                experts_down={"w": jnp.stack([
                    get(f"{fpre}.experts.{x}.down_proj.weight").T
                    for x in range(ne)
                ])},
            )
        else:
            lp.update(
                gate_up={
                    "w": jnp.concatenate(
                        [
                            get(f"{fpre}.gate_proj.weight").T,
                            get(f"{fpre}.up_proj.weight").T,
                        ],
                        axis=-1,
                    )
                },
                down={"w": get(f"{fpre}.down_proj.weight").T},
            )
        layers.append(lp)
    embed = get("model.embed_tokens.weight")
    lm_head = (
        get("lm_head.weight").T if reader.has("lm_head.weight") else embed.T
    )
    return {
        "embed": embed,
        "layer_list": layers,
        "final_norm": get("model.final_layernorm.weight", jnp.float32),
        "lm_head": lm_head,
    }


def param_specs(cfg: ModelConfig, quant_cfg=None) -> dict:
    from jax.sharding import PartitionSpec as P

    shape_tree = jax.eval_shape(lambda: init_params(cfg, None, 0))
    return jax.tree_util.tree_map(lambda _: P(), shape_tree)
