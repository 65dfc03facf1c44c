"""Llama-family decoder (Llama 1/2/3, Qwen2/2.5, Qwen3, Mistral).

TPU-native design notes (vs the reference's torch model defs, which it forks
from upstream vLLM, e.g. vllm_metax/models/deepseek_v2.py):
- pure functions over a param pytree; no modules
- all decoder layers run under one `jax.lax.scan` over stacked params, so XLA
  compiles the layer body once (compile-time and code-size win over unrolled)
- QKV and gate/up projections are pre-merged at load time into single matmuls
  (the MXU likes fewer, larger GEMMs)
- TP is expressed by running `forward` inside shard_map with params sharded by
  `param_specs`; row-parallel projections psum over `axis_name`

Param tree (all layer entries stacked with leading L axis):
  embed: (V, E)
  layers:
    ln1: (E,)             input_layernorm
    qkv: linear (E, (HQ+2*HKV)*D)
    q_norm/k_norm: (D,)   [qk_norm models]
    o: linear (HQ*D, E)
    ln2: (E,)             post_attention_layernorm
    gate_up: linear (E, 2*I)
    down: linear (I, E)
  final_norm: (E,)
  lm_head: (E, V)         [absent if tie_word_embeddings]
  rope_cache: (max_pos, rot_dim)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_metax_tpu.config import ModelConfig, QuantizationConfig
from vllm_metax_tpu.layers.linear import apply_linear
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
from vllm_metax_tpu.ops.rope import apply_rope, compute_rope_cache


# ---------------------------------------------------------------- forward

def embed(params: dict, input_ids: jnp.ndarray, cfg: ModelConfig,
          lora_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Token embedding lookup → (T, E). Split out of forward so the pipeline
    wrapper (parallel/pipeline.py) can run it on every stage (replicated,
    cheap gather) while the layer stack is stage-sharded.

    embed_lora: per-slot low-rank embedding delta (peft lora_embedding_A/B;
    ref surface: upstream vLLM's embedding LoRA) — row t gains
    s[slot] * A[slot, token_t] @ B[slot]."""
    h = jnp.take(params["embed"], input_ids, axis=0).astype(cfg.dtype)
    el = params.get("embed_lora")
    if el is not None and lora_idx is not None:
        a_tok = jnp.take(
            el["lora_A"], input_ids, axis=1
        ).astype(jnp.float32)  # (n, T, R)
        mask = (
            lora_idx[None, :]
            == jnp.arange(a_tok.shape[0], dtype=jnp.int32)[:, None]
        )
        a_tok = a_tok * (
            mask.astype(jnp.float32) * el["lora_s"][:, None]
        )[..., None]
        delta = jnp.einsum(
            "ntr,nre->te", a_tok, el["lora_B"].astype(jnp.float32)
        )
        h = h + delta.astype(h.dtype)
    return h


def finalize(hidden: jnp.ndarray, residual: jnp.ndarray, cfg: ModelConfig):
    """Final residual add after the layer stack."""
    return (
        hidden.astype(jnp.float32) + residual.astype(jnp.float32)
    ).astype(cfg.dtype)


def run_layers(
    params: dict,
    hidden: jnp.ndarray,  # (T, E)
    residual: jnp.ndarray,  # (T, E)
    kv_cache: KVCache,  # flat pool covering the LOCAL layer range
    md: AttentionMetadata,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,
    num_layers: Optional[int] = None,  # local layer count (PP stages)
    rope_rows: Optional[jnp.ndarray] = None,  # (T, rot) per-token rope rows
    deepstack: Optional[jnp.ndarray] = None,  # (K, T, E) early-layer visual
    ds_mask: Optional[jnp.ndarray] = None,  # (T,) image-token mask
    layer_offset=0,  # global index of local layer 0 (PP; unused here)
):
    """The decoder layer stack as one lax.scan over the (local) stacked layer
    bank. Returns (hidden, residual, new kv_cache) — residual is carried
    separately so PP can ppermute both halves between stages."""
    hq = num_q_heads or cfg.num_q_heads
    hkv = num_kv_heads or cfg.num_kv_heads
    d = cfg.head_dim
    eps = cfg.rms_norm_eps
    sm_scale = d**-0.5
    act_fn = ACT2FN[cfg.hidden_act]
    # mrope models (qwen2_vl.py) pass precomputed per-token rope rows; the
    # arange gather is an identity take that XLA folds away
    if rope_rows is not None:
        rope_cache = rope_rows
        rope_pos = jnp.arange(hidden.shape[0], dtype=jnp.int32)
    else:
        rope_cache = params["rope_cache"]
        rope_pos = None
    n_layers = num_layers or cfg.num_hidden_layers

    def maybe_psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    # KV cache layout: ONE flat block pool shared by all layers — layer l's
    # pages live at [l*NB, (l+1)*NB). The cache rides the scan CARRY and is
    # updated with a scatter per layer, which XLA keeps in place inside the
    # while loop (scanning it as xs/ys materializes a full cache copy per
    # step — measured ~25ms/step at 8B).
    nb_layer = kv_cache.k.shape[0] // n_layers
    slots_per_layer = nb_layer * kv_cache.block_size

    # Pure-decode steps DEFER the per-layer KV write: attention reads the
    # current token's K/V directly (k_cur/v_cur) and ONE batched scatter
    # lands all layers after the scan — the per-layer scatter fusion is
    # overhead-bound (~71µs for a 256KB write; ×2×L ≈ 4.5ms/step at 8B).
    t = hidden.shape[0]
    defer = defer_kv_supported(
        jax.ShapeDtypeStruct((t, hq, d), hidden.dtype), kv_cache, md
    )

    # Layer weights stay CLOSED OVER (scan constants) and the scan runs over
    # the layer index only: big quantized banks are indexed inside the Pallas
    # matmul via a prefetched layer id — scanning weights as xs would
    # materialize a dynamic-slice copy of every layer's weights every step
    # (a full extra model read+write, profiled at ~6ms/step for 8B-int4).
    layers = params["layers"]

    def layer_fn(carry, l):
        if defer:
            hidden, residual = carry
            kv = kv_cache  # read-only inside the scan (scan constant)
        else:
            hidden, residual, kv = carry
        md_l = layer_view(md, l, nb_layer, slots_per_layer)

        normed, residual = fused_add_rms_norm(hidden, residual,
                                              layers["ln1"][l], eps)

        # --- attention
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
            kv = write_to_kv_cache(
                kv, k, v, md_l.slot_mapping,
                unique_pages=md.decode_only,
            )
            attn = ragged_paged_attention(
                q, kv, md_l, sm_scale, sliding_window=cfg.sliding_window
            )
        attn_out = maybe_psum(
            apply_linear(layers["o"], attn.reshape(t, hq * d), layer_idx=l,
                         lora_idx=md.lora_idx, gather_axis=axis_name)
        )

        # --- mlp
        normed, residual = fused_add_rms_norm(attn_out, residual,
                                              layers["ln2"][l], eps)
        gate_up = apply_linear(layers["gate_up"], normed, layer_idx=l,
                               lora_idx=md.lora_idx)
        mlp_out = maybe_psum(
            apply_linear(layers["down"], act_fn(gate_up), layer_idx=l,
                         lora_idx=md.lora_idx, gather_axis=axis_name)
        )

        if deepstack is not None:
            # Qwen3-VL deepstack: add layer-l visual features at image
            # positions for the first K layers (HF _deepstack_process)
            kd = deepstack.shape[0]
            ds_l = jax.lax.dynamic_index_in_dim(
                deepstack, jnp.minimum(l, kd - 1), keepdims=False
            )
            on = jnp.logical_and(l < kd, ds_mask)
            mlp_out = mlp_out + jnp.where(
                on[:, None], ds_l, 0.0
            ).astype(mlp_out.dtype)
        if defer:
            return (mlp_out, residual), (k, v)
        return (mlp_out, residual, kv), None

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
    input_ids: jnp.ndarray,  # (T,)
    kv_cache: KVCache,  # stacked leading L axis
    md: AttentionMetadata,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,  # local (per-shard) head counts
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,  # unused (dense model)
):
    """Returns (hidden (T, E), new kv_cache)."""
    hidden = embed(params, input_ids, cfg, lora_idx=md.lora_idx)
    residual = jnp.zeros_like(hidden)
    hidden, residual, new_kv = run_layers(
        params, hidden, residual, kv_cache, md, cfg,
        num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
        axis_name=axis_name, ep_axis_name=ep_axis_name,
    )
    return finalize(hidden, residual, cfg), new_kv


def compute_logits(
    params: dict,
    hidden: jnp.ndarray,  # (R, E) — already gathered at logits_indices
    cfg: ModelConfig,
    axis_name: Optional[str] = None,
    lora_rows: Optional[jnp.ndarray] = None,  # (R,) adapter slot per row
) -> jnp.ndarray:
    normed = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:
        # tied embeddings — replicated, so no gather needed
        logits = jnp.dot(normed, params["embed"].T, preferred_element_type=jnp.float32)
    else:
        if isinstance(head, dict):
            # quantized lm_head (qc.lm_head_quantized, e.g. GPTQ checkpoints
            # with quantize_config "lm_head": true): int8 weight-only halves
            # the per-step vocab-matrix HBM read — the single largest
            # unquantized weight at decode (E*V bf16). On TPU the apply runs
            # W8A8 on the int8 MXU: the weight-only form dequantizes V*E
            # elements on the VPU (~270us at 8B shapes); int8 acts cost one
            # (T, K) quant + a scale epilogue instead.
            from vllm_metax_tpu import envs as _envs

            if (
                _envs.METAX_TPU_LMHEAD_W8A8
                and "w_i8" in head
                and head["s"].shape[0] == 1
                and jax.devices()[0].platform not in ("cpu", "gpu")
                and head["w_i8"].shape[1] % 128 == 0
                and normed.shape[0] % 8 == 0
            ):
                from vllm_metax_tpu.ops.pallas.quant_matmul import (
                    int8a8_matmul_pallas,
                )

                logits = int8a8_matmul_pallas(
                    normed, head["w_i8"], head["s"]
                ).astype(jnp.float32)
            else:
                logits = apply_linear(head, normed).astype(jnp.float32)
        else:
            logits = jnp.dot(normed, head, preferred_element_type=jnp.float32)
        hl = params.get("lm_head_lora")
        if hl is not None and lora_rows is not None:
            # lm_head LoRA delta (mask-and-matmul, same scheme as
            # layers/linear.py lora_delta; B shards with the vocab dim so
            # the delta lands pre-all-gather). Ref surface: punica lm_head
            # adapters in upstream vLLM.
            a = hl["lora_A"].astype(jnp.float32)  # (n, E, R)
            b = hl["lora_B"].astype(jnp.float32)  # (n, R, V_shard)
            xa = jnp.einsum(
                "te,ner->tnr", normed.astype(jnp.float32), a
            )
            mask = (
                lora_rows[:, None]
                == jnp.arange(a.shape[0], dtype=jnp.int32)[None, :]
            )
            xa = xa * (mask.astype(jnp.float32) * hl["lora_s"][None, :])[
                ..., None
            ]
            logits = logits + jnp.einsum("tnr,nrv->tv", xa, b).astype(
                logits.dtype
            )
        if axis_name:
            # lm_head is sharded on vocab: gather shards → full vocab
            logits = jax.lax.all_gather(logits, axis_name, axis=-1, tiled=True)
    return logits[:, : cfg.vocab_size]


# ---------------------------------------------------------------- params

def _linear_shape(kind: str, cfg: ModelConfig, tp: int = 1):
    hq, hkv, d = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    e, i = cfg.hidden_size, cfg.intermediate_size
    return {
        "qkv": (e, (hq + 2 * hkv) * d),
        "o": (hq * d, e),
        "gate_up": (e, 2 * i),
        "down": (i, e),
    }[kind]


def init_params(
    cfg: ModelConfig,
    quant_cfg: Optional[QuantizationConfig] = None,
    seed: int = 0,
) -> dict:
    """Deterministic dummy weights (= the reference's --load-format dummy,
    exercised by tests/benchmarks/test_latency_cli.py:14). Generated on-device
    (host-side RNG + transfer is minutes for 8B through a tunnel)."""
    import itertools

    key = jax.random.PRNGKey(seed)
    counter = itertools.count()
    dt = cfg.dtype
    e = cfg.hidden_size

    def dense(shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[0]))
        k = jax.random.fold_in(key, next(counter))
        return (jax.random.normal(k, shape, dtype=jnp.float32) * scale).astype(dt)

    quantize = _layer_quantizer(quant_cfg)

    def layer_params():
        lp = {
            "ln1": jnp.ones((e,), dt),
            "qkv": quantize({"w": dense(_linear_shape("qkv", cfg))}),
            "o": quantize({"w": dense(_linear_shape("o", cfg))}),
            "ln2": jnp.ones((e,), dt),
            "gate_up": quantize({"w": dense(_linear_shape("gate_up", cfg))}),
            "down": quantize({"w": dense(_linear_shape("down", cfg))}),
        }
        if cfg.attention_bias:
            lp["qkv"]["b"] = jnp.zeros(
                ((cfg.num_q_heads + 2 * cfg.num_kv_heads) * cfg.head_dim,), dt
            )
        if cfg.qk_norm:
            lp["q_norm"] = jnp.ones((cfg.head_dim,), dt)
            lp["k_norm"] = jnp.ones((cfg.head_dim,), dt)
        return lp

    # Incremental donated stacking: a jnp.stack over all layers holds the
    # per-layer arrays AND the stacked copy simultaneously — 2× the
    # quantized model (16.6GB for an 8B fp8/int8 bank; OOMs 16GB HBM).
    # Generating lazily and inserting with donation keeps the peak at
    # bank + ONE layer.
    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def _insert(bank, leaf, i):
        return jax.lax.dynamic_update_index_in_dim(bank, leaf, i, 0)

    nl = cfg.num_hidden_layers
    lp0 = layer_params()
    flat0, treedef = jax.tree_util.tree_flatten(lp0)
    banks = [jnp.zeros((nl,) + x.shape, x.dtype) for x in flat0]
    for j, leaf in enumerate(flat0):
        banks[j] = _insert(banks[j], leaf, jnp.int32(0))
    del lp0, flat0
    for i in range(1, nl):
        flat = jax.tree_util.tree_flatten(layer_params())[0]
        for j, leaf in enumerate(flat):
            banks[j] = _insert(banks[j], leaf, jnp.int32(i))
        del flat
    stacked = jax.tree_util.tree_unflatten(treedef, banks)
    params = {
        "embed": dense((cfg.vocab_size, e), scale=0.02),
        "layers": stacked,
        "final_norm": jnp.ones((e,), dt),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings,
            cfg.head_dim,
            cfg.rope_theta,
            cfg.rope_scaling,
        ),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense((e, cfg.vocab_size), scale=0.02)
    return params


def _layer_quantizer(quant_cfg):
    """Per-layer quantize-at-creation (keeps peak device memory at one dense
    layer instead of the whole dense model — matters at 8B+ on a 16GB chip)."""
    if quant_cfg is None or not quant_cfg.enabled:
        return lambda p: p
    from vllm_metax_tpu.quantization import (
        is_quantized_linear,
        quantize_linear,
    )

    def quantize(p: dict) -> dict:
        if is_quantized_linear(p):  # checkpoint tensors passed through as-is
            return p
        out = quantize_linear(p, quant_cfg)
        return jax.tree_util.tree_map(lambda a: jax.block_until_ready(a), out)

    return quantize


def fp8_dequant_read(reader, name: str, dt):
    """Read a `.weight` tensor, honoring fp8 checkpoint scale siblings:
    per-channel `weight_scale` (llm-compressor style) or block-wise
    `weight_scale_inv` (DeepSeek-V3 native fp8, 128x128 blocks) — both
    dequantize to `dt`; plain tensors load as-is. Returns (out, in).
    Dropping the scale sibling would skew every channel/block by its scale
    (ref analog: the fp8 checkpoint formats the reference ingests through
    compressed-tensors)."""
    w = reader.get(name)
    base = name[: -len(".weight")]
    if reader.has(base + ".weight_scale_inv"):
        s = jnp.asarray(
            reader.get(base + ".weight_scale_inv"), jnp.float32
        )  # (ceil(N/bn), ceil(K/bk))
        wf = jnp.asarray(w).astype(jnp.float32)
        n, k = wf.shape
        bn = -(-n // s.shape[0])
        bk = -(-k // s.shape[1])
        s_full = jnp.repeat(jnp.repeat(s, bn, axis=0)[:n], bk, axis=1)[:, :k]
        return (wf * s_full).astype(dt)
    if reader.has(base + ".weight_scale"):
        s = jnp.asarray(reader.get(base + ".weight_scale"), jnp.float32)
        wf = jnp.asarray(w).astype(jnp.float32)
        s = s.reshape(-1, 1) if s.size == wf.shape[0] else s.reshape(1, 1)
        return (wf * s).astype(dt)
    return jnp.asarray(w, dtype=dt)


def load_weights(cfg: ModelConfig, quant_cfg, path: str, reader=None) -> dict:
    """Load HF safetensors (Llama/Qwen2/Qwen3/Mistral layouts). `reader`
    lets wrappers (models/qwen2_vl.py) inject a key-remapping view."""
    from vllm_metax_tpu.weights.loader import CheckpointReader

    if reader is None:
        reader = CheckpointReader(path)
    dt = cfg.dtype
    if (
        quant_cfg is not None
        and quant_cfg.enabled
        and quant_cfg.method in ("gptq", "awq")
        and reader.has("model.layers.0.self_attn.q_proj.qweight")
    ):
        # checkpoint carries pre-quantized GPTQ/AWQ tensors; otherwise fall
        # through to dense load + on-the-fly quantize_params
        return _load_weights_quantized(cfg, quant_cfg, reader)
    if quant_cfg is not None and quant_cfg.method == "compressed-tensors":
        from vllm_metax_tpu.quantization.compressed_tensors import (
            has_ct_tensors,
        )

        if has_ct_tensors(reader, "model.layers.0.self_attn.q_proj"):
            return _load_weights_quantized(cfg, quant_cfg, reader)

    def get(name):
        return jnp.asarray(reader.get(name), dtype=dt)

    quantize = _layer_quantizer(quant_cfg)

    def get_linear(prefix, bias):
        if (
            quant_cfg is not None
            and quant_cfg.enabled
            and quant_cfg.method == "fp8"
            and reader.has(f"{prefix}.weight_scale")
        ):
            # PRE-QUANTIZED fp8 checkpoint (HF fp8 quant_method: e4m3
            # codes + per-channel or per-tensor weight_scale — ref analog:
            # the fp8 checkpoints the reference's compressed-tensors path
            # ingests). Codes pass through VERBATIM; dropping weight_scale
            # here would skew every channel by its scale.
            codes = jnp.asarray(reader.get(f"{prefix}.weight"))  # (N, K) f8
            scale = jnp.asarray(
                reader.get(f"{prefix}.weight_scale"), jnp.float32
            )
            n = codes.shape[0]
            s = (
                scale.reshape(-1)[None, :]
                if scale.size == n
                else jnp.broadcast_to(scale.reshape(1, 1), (1, n))
            )
            p = {"w_f8": codes.T, "s": s}
            if reader.has(f"{prefix}.input_scale"):
                p["act_s"] = jnp.asarray(
                    reader.get(f"{prefix}.input_scale"), jnp.float32
                ).reshape(())
        else:
            # fp8_dequant_read also covers DeepSeek-style block-scale
            # (`weight_scale_inv`) fp8 checkpoints: dequantized to dense
            # here, re-encoded by quantize() when quantization is on
            p = {"w": fp8_dequant_read(reader, f"{prefix}.weight", dt).T}
        if bias and reader.has(f"{prefix}.bias"):
            p["b"] = get(f"{prefix}.bias")
        return p

    def merge_linears(ps: list[dict]) -> dict:
        if "w_f8" in ps[0]:
            out = {
                "w_f8": jnp.concatenate([p["w_f8"] for p in ps], axis=-1),
                "s": jnp.concatenate([p["s"] for p in ps], axis=-1),
            }
            if "act_s" in ps[0]:
                # static activation scale is a property of the SHARED input;
                # merged projections read the same x — take the max to stay
                # conservative if the checkpoint disagrees per-branch
                out["act_s"] = jnp.max(
                    jnp.stack([p["act_s"] for p in ps])
                )
        else:
            out = {"w": jnp.concatenate([p["w"] for p in ps], axis=-1)}
        if "b" in ps[0]:
            out["b"] = jnp.concatenate([p["b"] for p in ps], axis=-1)
        return quantize(out)

    def qkv_merged(pre):
        # Baichuan stores qkv pre-fused as W_pack (ref: models/baichuan.py);
        # Phi-3 stores it pre-fused as qkv_proj — both are [q|k|v] rows
        if reader.has(f"{pre}.self_attn.W_pack.weight"):
            return quantize(get_linear(f"{pre}.self_attn.W_pack", False))
        if reader.has(f"{pre}.self_attn.qkv_proj.weight"):
            return quantize(get_linear(f"{pre}.self_attn.qkv_proj", False))
        return merge_linears(
            [
                get_linear(f"{pre}.self_attn.q_proj", cfg.attention_bias),
                get_linear(f"{pre}.self_attn.k_proj", cfg.attention_bias),
                get_linear(f"{pre}.self_attn.v_proj", cfg.attention_bias),
            ]
        )

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        lp = {
            "ln1": get(f"{pre}.input_layernorm.weight"),
            "qkv": qkv_merged(pre),
            "o": quantize(get_linear(f"{pre}.self_attn.o_proj", False)),
            "ln2": get(f"{pre}.post_attention_layernorm.weight"),
            "gate_up": (
                # Phi-3 stores gate/up pre-fused as gate_up_proj
                quantize(get_linear(f"{pre}.mlp.gate_up_proj", cfg.mlp_bias))
                if reader.has(f"{pre}.mlp.gate_up_proj.weight")
                else merge_linears(
                    [
                        get_linear(f"{pre}.mlp.gate_proj", cfg.mlp_bias),
                        get_linear(f"{pre}.mlp.up_proj", cfg.mlp_bias),
                    ]
                )
            ),
            "down": quantize(get_linear(f"{pre}.mlp.down_proj", cfg.mlp_bias)),
        }
        if cfg.qk_norm:
            lp["q_norm"] = get(f"{pre}.self_attn.q_norm.weight")
            lp["k_norm"] = get(f"{pre}.self_attn.k_norm.weight")
        layers.append(lp)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": get("model.norm.weight"),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings,
            cfg.head_dim,
            cfg.rope_theta,
            cfg.rope_scaling,
        ),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = get("lm_head.weight").T
    return params


def _load_weights_quantized(cfg, quant_cfg, reader):
    """GPTQ/AWQ checkpoint load: repack into the canonical packed-int4 layout
    (replaces the reference's gptq_shuffle / awq_to_gptq_4bit load-time
    conversions, quant_config/gptq.py:49, awq.py:78)."""
    from vllm_metax_tpu.quantization.gptq import load_gptq_linear
    from vllm_metax_tpu.quantization.awq import load_awq_linear

    if quant_cfg.method == "compressed-tensors":
        from vllm_metax_tpu.quantization.compressed_tensors import (
            load_ct_linear as load_fn,
        )
    else:
        load_fn = (
            load_gptq_linear if quant_cfg.method == "gptq" else load_awq_linear
        )
    dt = cfg.dtype

    def get(name):
        return jnp.asarray(reader.get(name), dtype=dt)

    def get_linear(prefix, bias):
        p = load_fn(reader, prefix, quant_cfg, dt)
        if bias and reader.has(f"{prefix}.bias"):
            p["b"] = get(f"{prefix}.bias")
        return p

    def merge_quant(ps: list[dict]) -> dict:
        out = {}
        for key in ps[0]:
            if key == "perm" or ps[0][key].ndim == 0:
                # same K permutation required to merge; 0-dim markers
                # (w8a8 "a8") pass through
                out[key] = ps[0][key]
            else:
                out[key] = jnp.concatenate([p[key] for p in ps], axis=-1)
        return out

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        lp = {
            "ln1": get(f"{pre}.input_layernorm.weight"),
            "qkv": merge_quant(
                [
                    get_linear(f"{pre}.self_attn.q_proj", cfg.attention_bias),
                    get_linear(f"{pre}.self_attn.k_proj", cfg.attention_bias),
                    get_linear(f"{pre}.self_attn.v_proj", cfg.attention_bias),
                ]
            ),
            "o": get_linear(f"{pre}.self_attn.o_proj", False),
            "ln2": get(f"{pre}.post_attention_layernorm.weight"),
            "gate_up": merge_quant(
                [
                    get_linear(f"{pre}.mlp.gate_proj", cfg.mlp_bias),
                    get_linear(f"{pre}.mlp.up_proj", cfg.mlp_bias),
                ]
            ),
            "down": get_linear(f"{pre}.mlp.down_proj", cfg.mlp_bias),
        }
        if cfg.qk_norm:
            lp["q_norm"] = get(f"{pre}.self_attn.q_norm.weight")
            lp["k_norm"] = get(f"{pre}.self_attn.k_norm.weight")
        layers.append(lp)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": get("model.norm.weight"),
        "rope_cache": compute_rope_cache(
            cfg.max_position_embeddings,
            cfg.head_dim,
            cfg.rope_theta,
            cfg.rope_scaling,
        ),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = get("lm_head.weight").T
    return params


# ---------------------------------------------------------------- sharding

def _rank_major_perm(sections: list[int], tp: int) -> np.ndarray:
    """Column permutation turning [sec0 | sec1 | ...] into rank-major order
    [sec0_r0, sec1_r0, ..., sec0_r1, sec1_r1, ...] so a contiguous TP split
    gives every rank its slice of EVERY section (merged qkv / gate_up)."""
    starts = np.cumsum([0] + sections[:-1])
    idx = []
    for r in range(tp):
        for s0, sec in zip(starts, sections):
            w = sec // tp
            idx.extend(range(s0 + r * w, s0 + (r + 1) * w))
    return np.asarray(idx, np.int32)


def _permute_cols(lin: dict, perm: np.ndarray) -> dict:
    """Apply an output-column permutation to every leaf of a linear param dict
    (works for dense and all quantized layouts — they all carry N last)."""
    out = {}
    for key, arr in lin.items():
        if key == "perm" or key.startswith("lora_"):
            # input-dim activation permutation is N-independent; LoRA banks
            # are permuted at adapter-load time (runner.add_lora) — lora_A's
            # last axis is the rank, not N
            out[key] = arr
        else:
            out[key] = jnp.take(arr, perm, axis=-1)
    return out


def _repack_p4_for_shards(lin: dict, tp: int) -> dict:
    """Packed-int4 weights use split-halves nibble packing over K
    (ops/quant.py pack_int4). A contiguous row-parallel split of the packed
    array would mix nibble planes across ranks, so re-pack per rank shard:
    each rank's packed rows then unpack to exactly its contiguous K slice."""
    if "w_p4" not in lin or tp == 1:
        return lin
    from vllm_metax_tpu.ops.quant import pack_int4, unpack_int4

    def repack(w_p4):  # (L, K/2, N) stacked
        q = jax.vmap(unpack_int4)(w_p4)  # (L, K, N)
        k = q.shape[1]
        kl = k // tp
        shards = [
            jax.vmap(pack_int4)(q[:, r * kl : (r + 1) * kl]) for r in range(tp)
        ]
        return jnp.concatenate(shards, axis=1)

    out = dict(lin)
    out["w_p4"] = repack(lin["w_p4"])
    return out


def prepare_for_tp(params: dict, cfg: ModelConfig, tp: int) -> dict:
    """Reorder merged projections into rank-major column order (load-time,
    once). The reference instead loads per-rank shards of q/k/v separately;
    here one pytree permutation does the same job for the whole stack."""
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
    # row-parallel (K-sharded) packed-int4 linears need shard-local packing
    layers["o"] = _repack_p4_for_shards(layers["o"], tp)
    layers["down"] = _repack_p4_for_shards(layers["down"], tp)
    out = dict(params)
    out["layers"] = layers
    return out


def param_specs(cfg: ModelConfig, quant_cfg=None) -> dict:
    """PartitionSpec tree for TP (mesh axis "tp"). Column-parallel projections
    shard the output dim; row-parallel shard the input dim (+psum in forward).
    Stacked layer params carry a leading L axis (never sharded)."""

    def linear_spec(shard_axis: int):
        # covers dense and quantized key layouts; leading L axis prepended
        col = P(None, None, "tp") if shard_axis == 1 else P(None, "tp", None)
        # tiled packed-int4 (L, NT, K/2, TN): col shards the tile dim,
        # row shards the packed-K dim
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
            # prefill-requant bank: (L, K, N) int8 shards like w_i8; the
            # (L, 1, N) per-channel scales shard with N (col) or replicate
            # (row — sanitize drops the size-1 axis anyway)
            "w8p": col,
            "s8p": P(None, None, "tp") if shard_axis == 1 else P(None, None, None),
            "a8": P(),
            "act_s": P(None),
            "perm": P(None, "tp") if shard_axis == 0 else P(None, None),
            # LoRA banks (L, n_slots, K, R) / (L, n_slots, R, N): B columns
            # shard with the base output dim, A rows with the base input dim
            "lora_A": (
                P(None, None, None, None)
                if shard_axis == 1
                else P(None, None, "tp", None)
            ),
            "lora_B": (
                P(None, None, None, "tp")
                if shard_axis == 1
                else P(None, None, None, None)
            ),
            "lora_s": P(None),
        }
        if shard_axis == 1:
            spec["b"] = P(None, "tp")
        else:
            spec["b"] = P(None, None)
        return spec

    layer_spec = {
        "ln1": P(None, None),
        "qkv": linear_spec(1),
        "o": linear_spec(0),
        "ln2": P(None, None),
        "gate_up": linear_spec(1),
        "down": linear_spec(0),
    }
    if cfg.qk_norm:
        layer_spec["q_norm"] = P(None, None)
        layer_spec["k_norm"] = P(None, None)
    specs = {
        "embed": P(None, None),
        "layers": layer_spec,
        "final_norm": P(None),
        "rope_cache": P(None, None),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")
    # head adapters (UNSTACKED): lm_head delta shards with the vocab dim,
    # embedding delta is replicated like the embedding itself
    specs["lm_head_lora"] = {
        "lora_A": P(None, None, None),
        "lora_B": P(None, None, "tp"),
        "lora_s": P(None),
    }
    specs["embed_lora"] = {
        "lora_A": P(None, None, None),
        "lora_B": P(None, None, None),
        "lora_s": P(None),
    }
    if cfg.mtp_enabled:
        # EAGLE head: one UNSTACKED decoder layer — strip the leading L axis
        strip = lambda sp: P(*tuple(sp)[1:])  # noqa: E731
        specs["mtp"] = {
            "fc": {"w": P(None, None)},
            "layer": jax.tree_util.tree_map(
                strip, layer_spec, is_leaf=lambda x: isinstance(x, P)
            ),
            "embed": P(None, None),
        }
    return specs


def kv_cache_spec(cfg: ModelConfig) -> dict:
    return {
        # the EAGLE draft head is one extra decoder layer with its own KV
        # range at index num_hidden_layers (ref: vllm v1/spec_decode/eagle.py)
        "num_layers": cfg.num_hidden_layers + (1 if cfg.mtp_enabled else 0),
        "num_kv_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
    }


# ----------------------------------------------------------- EAGLE draft head

def mtp_forward(
    params: dict,
    input_ids: jnp.ndarray,  # (T,) NEXT token per row (sampled/ground truth)
    prev_hidden: jnp.ndarray,  # (T, E) main model's output hidden
    kv_cache: KVCache,
    md: AttentionMetadata,
    cfg: ModelConfig,
    num_q_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,
):
    """EAGLE-1 draft head: h = decoder_layer(fc([embed(tok_next) | hidden])).

    Ref: vllm v1/spec_decode/eagle.py EagleProposer + the EAGLE checkpoint
    layout (fc.weight + one LlamaDecoderLayer whose layer-0 input_layernorm
    is removed). Like the DeepSeek MTP head (models/deepseek.py:mtp_forward)
    it reuses the step metadata unshifted — draft proposals are verified
    exactly, so metadata skew only affects acceptance rate, not correctness.
    The head's KV lives in the pool's LAST layer range."""
    ep = params["mtp"]
    hq = num_q_heads or cfg.num_q_heads
    hkv = cfg.num_kv_heads * hq // cfg.num_q_heads
    d = cfg.head_dim
    eps = cfg.rms_norm_eps
    act_fn = ACT2FN[cfg.hidden_act]
    t = input_ids.shape[0]

    def maybe_psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    emb_table = ep.get("embed", params["embed"])
    emb = jnp.take(emb_table, input_ids, axis=0).astype(cfg.dtype)
    prev = rms_norm(prev_hidden, params["final_norm"], eps)
    x = apply_linear(ep["fc"], jnp.concatenate([emb, prev], axis=-1))

    nb_layer = kv_cache.k.shape[0] // (cfg.num_hidden_layers + 1)
    md_l = layer_view(
        md, cfg.num_hidden_layers, nb_layer, nb_layer * kv_cache.block_size
    )
    lp = ep["layer"]
    residual = x
    normed = rms_norm(x, lp["ln1"], eps) if "ln1" in lp else x
    qkv = apply_linear(lp["qkv"], normed)
    q, k, v = jnp.split(qkv, [hq * d, (hq + hkv) * d], axis=-1)
    q, k = apply_rope(
        q.reshape(t, hq, d), k.reshape(t, hkv, d), md.positions,
        params["rope_cache"],
    )
    kv_cache = write_to_kv_cache(
        kv_cache, k, v.reshape(t, hkv, d), md_l.slot_mapping
    )
    attn = ragged_paged_attention(q, kv_cache, md_l, d**-0.5,
                                  sliding_window=cfg.sliding_window)
    attn_out = maybe_psum(apply_linear(lp["o"], attn.reshape(t, hq * d)))
    h = residual + attn_out
    normed = rms_norm(h, lp["ln2"], eps)
    mlp = maybe_psum(
        apply_linear(lp["down"], ACT2FN[cfg.hidden_act](
            apply_linear(lp["gate_up"], normed)))
    )
    return h + mlp, kv_cache


def mtp_compute_logits(
    params: dict,
    hidden: jnp.ndarray,
    cfg: ModelConfig,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """EAGLE shares the base model's final norm + lm_head."""
    return compute_logits(params, hidden, cfg, axis_name=axis_name)


def load_eagle_weights(cfg: ModelConfig, quant_cfg, path: str) -> dict:
    """Load an EAGLE draft checkpoint (fc + one decoder layer, e.g.
    yuhuili/EAGLE-LLaMA3-*) into the params['mtp'] group."""
    from vllm_metax_tpu.weights.loader import CheckpointReader

    reader = CheckpointReader(path)

    def get(name):
        return jnp.asarray(reader.get(name), dtype=cfg.dtype)

    def get_linear(prefix):
        return {"w": get(f"{prefix}.weight").T}

    def first(*names):
        for n in names:
            if reader.has(f"{n}.self_attn.q_proj.weight"):
                return n
        raise KeyError(names)

    pre = first("layers.0", "model.layers.0", "midlayer")
    gate = get(f"{pre}.mlp.gate_proj.weight").T
    up = get(f"{pre}.mlp.up_proj.weight").T
    layer = {
        "qkv": {
            "w": jnp.concatenate(
                [
                    get(f"{pre}.self_attn.q_proj.weight").T,
                    get(f"{pre}.self_attn.k_proj.weight").T,
                    get(f"{pre}.self_attn.v_proj.weight").T,
                ],
                axis=-1,
            )
        },
        "o": get_linear(f"{pre}.self_attn.o_proj"),
        "ln2": get(f"{pre}.post_attention_layernorm.weight"),
        "gate_up": {"w": jnp.concatenate([gate, up], axis=-1)},
        "down": get_linear(f"{pre}.mlp.down_proj"),
    }
    if reader.has(f"{pre}.input_layernorm.weight"):  # absent in EAGLE-1
        layer["ln1"] = get(f"{pre}.input_layernorm.weight")
    mtp = {"fc": get_linear("fc"), "layer": layer}
    if reader.has("embed_tokens.weight"):
        mtp["embed"] = get("embed_tokens.weight")
    elif reader.has("model.embed_tokens.weight"):
        mtp["embed"] = get("model.embed_tokens.weight")
    return mtp


def init_eagle_params(cfg: ModelConfig, seed: int = 1) -> dict:
    """Dummy EAGLE head (load_format=dummy)."""
    key = jax.random.PRNGKey(seed)
    e = cfg.hidden_size
    dt = cfg.dtype

    def dense(shape, i, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[0]))
        return (
            jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32)
            * scale
        ).astype(dt)

    return {
        "fc": {"w": dense((2 * e, e), 0)},
        "layer": {
            "qkv": {"w": dense(_linear_shape("qkv", cfg), 1)},
            "o": {"w": dense(_linear_shape("o", cfg), 2)},
            "ln2": jnp.ones((e,), dt),
            "gate_up": {"w": dense(_linear_shape("gate_up", cfg), 3)},
            "down": {"w": dense(_linear_shape("down", cfg), 4)},
        },
    }
