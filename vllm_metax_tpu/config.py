"""Configuration dataclasses.

Equivalent of vLLM's VllmConfig tree that the reference platform mutates in
`check_and_update_config` (reference vllm_metax/platform.py:118-221). Hardware
constraints (block size, compile buckets, KV dtype) are imposed here, in one
place, just like the reference does at that hook.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp

_DTYPE_MAP = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.bfloat16,  # TPU has no fp16; map to bf16
    "auto": jnp.bfloat16,
}

_KV_DTYPE_MAP = {
    "auto": None,  # follow model dtype
    "bfloat16": jnp.bfloat16,
    "int8": jnp.int8,
    "fp8": jnp.float8_e4m3fn,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
}


def _parse_dtype(name: str | Any):
    if not isinstance(name, str):
        return name
    if name not in _DTYPE_MAP:
        raise ValueError(f"unsupported dtype {name!r}")
    return _DTYPE_MAP[name]


@dataclass
class ModelConfig:
    """Architecture hyperparameters, normally parsed from a HF config.json."""

    model: str = ""  # path or HF id (used for tokenizer too)
    architecture: str = "LlamaForCausalLM"
    hidden_size: int = 2048
    intermediate_size: int = 5504
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 0  # 0 → hidden_size // num_attention_heads
    vocab_size: int = 32000
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    qk_norm: bool = False  # Qwen3-style per-head q/k RMSNorm
    sliding_window: int = 0  # 0 = disabled
    hidden_act: str = "silu"
    dtype: Any = jnp.bfloat16
    max_model_len: int = 4096
    # MoE (Mixtral/Qwen-MoE/DeepSeek style)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    num_shared_experts: int = 0
    first_k_dense_replace: int = 0  # DeepSeek: leading dense layers
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = False
    n_group: int = 0
    topk_group: int = 0
    scoring_func: str = "softmax"
    # Gemma family
    scale_embeddings: bool = False  # multiply embedding output by sqrt(E)
    attn_logit_softcapping: float = 0.0  # 0 = disabled
    final_logit_softcapping: float = 0.0  # 0 = disabled
    query_pre_attn_scalar: float = 0.0  # 0 → head_dim (sm_scale base)
    sliding_window_pattern: int = 0  # 0=uniform; 2=even layers sliding (Gemma-2)
    # MLA (DeepSeek-V2/V3)
    use_mla: bool = False
    q_lora_rank: int = 0
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    # Draft-head spec decode: DeepSeek MTP or EAGLE — both are one extra
    # decoder layer with its own KV range in the pool
    num_nextn_predict_layers: int = 0  # spec layers present in the checkpoint
    mtp_enabled: bool = False  # set by check_and_update (method mtp/eagle)
    draft_model: str = ""  # EAGLE head checkpoint path (copied from spec cfg)
    # DeepSeek V3.2 sparse attention ("lightning indexer", ref:
    # vllm_metax/models/deepseek_v2.py:769 Indexer; is_v32 == index_topk set)
    index_topk: int = 0  # 0 = dense MLA (V2/V3); V3.2 uses 2048
    index_n_heads: int = 0  # 64
    index_head_dim: int = 0  # 128
    # Vertical-slash sparse prefill (MInference pattern; ref:
    # csrc/attention/vertical_slash_index.cu). "" = dense. When set to
    # "vertical_slash", single-request prefill chunks of at least
    # sparse_attention_threshold tokens route through the block-skipping
    # sparse path (ops/sparse_attention.py).
    sparse_attention: str = ""
    sparse_attention_threshold: int = 4096
    sparse_nnz_v: int = 128  # vertical columns kept per head
    sparse_nnz_s: int = 64  # slash diagonals kept per head
    sparse_block_budget: int = 0  # kv blocks per (head, q-block); 0 = all hit
    # raw HF config dict for model-specific extras
    hf_config: dict = field(default_factory=dict)

    def __post_init__(self):
        self.dtype = _parse_dtype(self.dtype)
        if self.head_dim == 0:
            self.head_dim = self.hidden_size // self.num_attention_heads
        self.max_model_len = min(self.max_model_len, self.max_position_embeddings)

    @property
    def num_q_heads(self) -> int:
        return self.num_attention_heads

    @property
    def num_kv_heads(self) -> int:
        return self.num_key_value_heads

    @staticmethod
    def from_hf_config(cfg: dict, model: str = "", **overrides) -> "ModelConfig":
        """Build from a HF config.json dict (covers Llama/Qwen2/Mistral/Mixtral)."""
        archs = cfg.get("architectures")
        if not archs:
            # VL configs may record architectures only on the text subconfig;
            # derive from the composite model_type
            archs = {
                "qwen2_vl": ["Qwen2VLForConditionalGeneration"],
                "qwen2_5_vl": ["Qwen2_5_VLForConditionalGeneration"],
                "qwen3_vl": ["Qwen3VLForConditionalGeneration"],
                "qwen3_vl_moe": ["Qwen3VLMoeForConditionalGeneration"],
            }.get(cfg.get("model_type", ""))
        archs = archs or ["LlamaForCausalLM"]
        if archs[0] in (
            "Qwen2VLForConditionalGeneration",
            "Qwen2_5_VLForConditionalGeneration",
            "Qwen3VLForConditionalGeneration",
            "Qwen3VLMoeForConditionalGeneration",
        ) and isinstance(cfg.get("text_config"), dict):
            # transformers >=4.52 nests the text fields; flatten them for
            # the generic parse below (outer keys like vision_config /
            # image_token_id win and ride along in hf_config)
            cfg = {**cfg["text_config"], **cfg}
            cfg.pop("text_config")
        if cfg.get("model_type") in ("mamba", "mamba2", "falcon_mamba"):
            # Mamba has no attention; fill the attention-shaped fields the
            # generic parse expects with inert values
            cfg = {
                **cfg,
                "num_attention_heads": cfg.get("num_attention_heads") or 1,
                "num_key_value_heads": 1,
                "rms_norm_eps": cfg.get("layer_norm_epsilon", 1e-5),
                "max_position_embeddings": cfg.get(
                    "max_position_embeddings", 1 << 20
                ),
            }
            if not cfg.get("architectures"):
                cfg["architectures"] = [{
                    "mamba2": "Mamba2ForCausalLM",
                    "falcon_mamba": "FalconMambaForCausalLM",
                }.get(cfg["model_type"], "MambaForCausalLM")]
        if "n_embd" in cfg:  # GPT-2-style key names
            cfg = {
                **cfg,
                "hidden_size": cfg["n_embd"],
                "num_attention_heads": cfg["n_head"],
                "num_hidden_layers": cfg["n_layer"],
                "intermediate_size": cfg.get("n_inner") or 4 * cfg["n_embd"],
                "max_position_embeddings": cfg.get("n_positions", 1024),
                "rms_norm_eps": cfg.get("layer_norm_epsilon", 1e-5),
                "hidden_act": cfg.get("activation_function", "gelu_new"),
                "tie_word_embeddings": True,
            }
        kw: dict[str, Any] = dict(
            model=model,
            architecture=archs[0],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg.get("intermediate_size", 4 * cfg["hidden_size"]),
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get(
                "num_key_value_heads", cfg["num_attention_heads"]
            ),
            head_dim=cfg.get("head_dim") or 0,
            vocab_size=cfg["vocab_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=cfg.get("rope_scaling"),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            attention_bias=cfg.get("attention_bias", False)
            or cfg.get("qkv_bias", False),
            mlp_bias=cfg.get("mlp_bias", False),
            dtype=cfg.get("torch_dtype") or cfg.get("dtype", "bfloat16"),
            hf_config=cfg,
        )
        # Qwen2 uses attention bias but no config flag before transformers 4.37
        if archs[0] in (
            "Qwen2ForCausalLM",
            "Qwen2MoeForCausalLM",
            "Qwen2VLForConditionalGeneration",
            "Qwen2_5_VLForConditionalGeneration",
        ):
            kw["attention_bias"] = True
        if archs[0] in (
            "Qwen3ForCausalLM",
            "Qwen3MoeForCausalLM",
            "Qwen3VLForConditionalGeneration",
            "Qwen3VLMoeForConditionalGeneration",
        ):
            kw["qk_norm"] = True
            kw["attention_bias"] = False
        if cfg.get("sliding_window") and cfg.get("use_sliding_window", True):
            kw["sliding_window"] = cfg["sliding_window"]
        kw["hidden_act"] = cfg.get("hidden_act", "silu")
        if archs[0] == "GPTNeoXForCausalLM":
            kw["rope_theta"] = cfg.get("rotary_emb_base", 10000.0)
            kw["rms_norm_eps"] = cfg.get("layer_norm_eps", 1e-5)
        if archs[0] == "BaiChuanMoEForCausalLM":
            # MHA + rope_base theta; per-layer expert plan stays in hf_config
            kw["rope_theta"] = cfg.get("rope_base", 10000.0)
            routed = cfg.get("num_experts_routed_per_layer")
            if routed:
                if isinstance(routed, str):
                    routed = [int(x) for x in routed.split(",")]
                kw["num_experts"] = max(routed)
            sel = cfg.get("num_experts_selected_per_layer")
            if sel:
                if isinstance(sel, str):
                    sel = [int(x) for x in sel.split(",")]
                kw["num_experts_per_tok"] = max(sel)
        if archs[0] == "OPTForCausalLM":
            kw["intermediate_size"] = cfg.get(
                "ffn_dim", 4 * cfg["hidden_size"]
            )
            kw["hidden_act"] = cfg.get("activation_function", "relu")
            kw["tie_word_embeddings"] = cfg.get("tie_word_embeddings", True)
        if archs[0] == "Phi3ForCausalLM" and kw.get("rope_scaling"):
            # Phi-3 longrope keeps original_max_position_embeddings at the
            # config top level; fold it into the scaling dict for the cache
            rs = dict(kw["rope_scaling"])
            rs.setdefault(
                "original_max_position_embeddings",
                cfg.get(
                    "original_max_position_embeddings",
                    kw["max_position_embeddings"],
                ),
            )
            kw["rope_scaling"] = rs
        if archs[0] in ("GemmaForCausalLM", "Gemma2ForCausalLM"):
            kw["scale_embeddings"] = True
            kw["tie_word_embeddings"] = cfg.get("tie_word_embeddings", True)
            kw["hidden_act"] = (
                cfg.get("hidden_activation")
                or cfg.get("hidden_act")
                or "gelu_pytorch_tanh"
            )
        if archs[0] == "Gemma2ForCausalLM":
            kw["attn_logit_softcapping"] = cfg.get("attn_logit_softcapping") or 0.0
            kw["final_logit_softcapping"] = (
                cfg.get("final_logit_softcapping") or 0.0
            )
            kw["query_pre_attn_scalar"] = cfg.get("query_pre_attn_scalar") or 0.0
            kw["sliding_window_pattern"] = 2
        # MoE fields across families
        if "num_local_experts" in cfg:  # Mixtral
            kw["num_experts"] = cfg["num_local_experts"]
            kw["num_experts_per_tok"] = cfg.get("num_experts_per_tok", 2)
            kw["moe_intermediate_size"] = cfg.get("intermediate_size")
        if "n_routed_experts" in cfg:  # DeepSeek
            kw["num_experts"] = cfg["n_routed_experts"]
            kw["num_experts_per_tok"] = cfg.get("num_experts_per_tok", 6)
            kw["moe_intermediate_size"] = cfg.get("moe_intermediate_size", 0)
            kw["num_shared_experts"] = cfg.get("n_shared_experts", 0)
            kw["first_k_dense_replace"] = cfg.get("first_k_dense_replace", 0)
            kw["routed_scaling_factor"] = cfg.get("routed_scaling_factor", 1.0)
            kw["norm_topk_prob"] = cfg.get("norm_topk_prob", False)
            kw["n_group"] = cfg.get("n_group", 0)
            kw["topk_group"] = cfg.get("topk_group", 0)
            kw["scoring_func"] = cfg.get("scoring_func", "softmax")
            kw["num_nextn_predict_layers"] = cfg.get(
                "num_nextn_predict_layers", 0
            )
        if "num_experts" in cfg and archs[0].startswith("Qwen"):  # Qwen-MoE
            kw["num_experts"] = cfg["num_experts"]
            kw["num_experts_per_tok"] = cfg.get("num_experts_per_tok", 4)
            kw["moe_intermediate_size"] = cfg.get("moe_intermediate_size", 0)
            kw["norm_topk_prob"] = cfg.get("norm_topk_prob", False)
        # MLA (DeepSeek V2/V3)
        if cfg.get("kv_lora_rank"):
            kw["use_mla"] = True
            kw["q_lora_rank"] = cfg.get("q_lora_rank") or 0
            kw["kv_lora_rank"] = cfg["kv_lora_rank"]
            kw["qk_nope_head_dim"] = cfg.get("qk_nope_head_dim", 128)
            kw["qk_rope_head_dim"] = cfg.get("qk_rope_head_dim", 64)
            kw["v_head_dim"] = cfg.get("v_head_dim", 128)
            if cfg.get("index_topk"):  # V3.2 sparse attention indexer
                kw["index_topk"] = cfg["index_topk"]
                kw["index_n_heads"] = cfg.get("index_n_heads", 64)
                kw["index_head_dim"] = cfg.get("index_head_dim", 128)
        kw.update(overrides)
        return ModelConfig(**kw)

    @staticmethod
    def from_pretrained(path: str, **overrides) -> "ModelConfig":
        if path.endswith(".gguf") and os.path.isfile(path):
            # single-file GGUF checkpoint (ref: "gguf" in
            # supported_quantization, platform.py:59-66)
            from vllm_metax_tpu.weights.gguf import config_from_gguf

            cfg = config_from_gguf(path)
        else:
            with open(os.path.join(path, "config.json")) as f:
                cfg = json.load(f)
        return ModelConfig.from_hf_config(cfg, model=path, **overrides)


@dataclass
class CacheConfig:
    """Paged KV cache parameters (ref: platform.py:127-196 block-size rules)."""

    block_size: int = 16
    num_blocks: int = 512  # overridden by memory profiling in the worker
    kv_cache_dtype: str = "auto"  # "auto" | "int8" | "fp8" | "fp8_e5m2"
    gpu_memory_utilization: float = 0.9
    enable_prefix_caching: bool = True
    swap_space_bytes: int = 0
    # Host-RAM KV offload tier (core/host_kv_tier.py): evicted prefix-cache
    # pages spill to host memory (LRU, this many blocks) and restore on a
    # later hash-chain hit — the analog of the reference's swap_blocks +
    # LMCache offloading (csrc/cache_kernels.cu:18,
    # tests/kv_transfer/test_lmcache_offloading.py). 0 = off.
    host_swap_blocks: int = 0

    def __post_init__(self) -> None:
        if self.block_size % 16 != 0:
            raise ValueError(
                f"block_size must be a multiple of 16, got {self.block_size}"
            )
        if self.kv_cache_dtype not in _KV_DTYPE_MAP:
            raise ValueError(
                f"unknown kv_cache_dtype {self.kv_cache_dtype!r}; "
                f"one of {sorted(_KV_DTYPE_MAP)}"
            )

    def kv_dtype(self, model_dtype) -> Any:
        d = _KV_DTYPE_MAP[self.kv_cache_dtype]
        return model_dtype if d is None else d

    @property
    def kv_quantized(self) -> bool:
        return self.kv_cache_dtype not in ("auto", "bfloat16")


@dataclass
class SchedulerConfig:
    """Continuous-batching scheduler knobs (behavior pinned by the reference's
    vendored tests/v1/core/test_scheduler.py)."""

    max_num_seqs: int = 64
    max_num_batched_tokens: int = 1024
    enable_chunked_prefill: bool = True
    long_prefill_token_threshold: int = 0  # 0 = no cap beyond token budget
    # on-device decode steps per engine step (KV pre-reserved; runner loops
    # with lax.scan, amortizing host↔device latency). 1 = classic stepping.
    num_decode_steps: int = 1
    # async scheduling: launch the next steady decode window before fetching
    # the previous window's results, overlapping host scheduling/metadata
    # work with device execution (ref behavior:
    # tests/v1/core/test_async_scheduler.py). Only engages for multi-step
    # pure-decode windows; correctness-neutral (speculatively scheduled
    # windows for requests that turn out finished are dropped at resolve).
    async_scheduling: bool = True


@dataclass
class ParallelConfig:
    """Mesh shape. TPU-native: axes of one jax.sharding.Mesh, not process
    groups (replaces the reference's MCCL shim, pynccl_wrapper.py)."""

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    expert_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    # decode-context-parallel (KV sharded over this axis for long sequences)
    decode_context_parallel_size: int = 1
    # --- multi-host (DCN) SPMD: every host runs the same engine loop over
    # one global mesh; jax.distributed.initialize replaces the reference's
    # NCCL bootstrap (SURVEY §2.4; parallel/multihost.py)
    num_hosts: int = 1
    host_rank: int = 0
    coordinator_address: str = "127.0.0.1:29500"

    @property
    def world_size(self) -> int:
        return (
            self.tensor_parallel_size
            * self.data_parallel_size
            * self.pipeline_parallel_size
            * self.decode_context_parallel_size
        )


@dataclass
class DeviceConfig:
    device: str = "auto"  # "auto" | "tpu" | "cpu"


@dataclass
class LoadConfig:
    load_format: str = "auto"  # "auto" | "safetensors" | "dummy"
    seed: int = 0


@dataclass
class QuantizationConfig:
    """Checkpoint quantization description. Parsed from HF quantization_config
    (ref: quant_config/gptq.py:22-45, awq.py:24-67)."""

    method: str = "none"  # none|gptq|awq|int8|w8a8_int8|fp8|compressed-tensors
    bits: int = 0
    group_size: int = -1
    sym: bool = True
    desc_act: bool = False
    lm_head_quantized: bool = False
    # fp8 / w8a8
    activation_scheme: str = "dynamic"  # "dynamic" | "static"
    ignored_layers: tuple = ()
    # compressed-tensors: parsed config_groups routing ("w8a8_int8"|"wna16")
    ct_scheme: str = ""

    @property
    def enabled(self) -> bool:
        return self.method != "none"

    @staticmethod
    def from_hf_config(cfg: dict) -> "QuantizationConfig":
        q = cfg.get("quantization_config")
        if not q:
            return QuantizationConfig()
        method = q.get("quant_method", "none")
        # marlin method aliases carry standard GPTQ/AWQ tensors — the
        # marlin part is a kernel choice, not a checkpoint format (ref:
        # MacaGPTQMarlinConfig / MacaAWQMarlinConfig forcing "marlin"
        # configs through the non-marlin path, quant_config/gptq_marlin.py)
        method = {
            "gptq_marlin": "gptq",
            "awq_marlin": "awq",
            "gptq_marlin_24": "gptq",
        }.get(method, method)
        if method in ("gptq", "awq"):
            return QuantizationConfig(
                method=method,
                bits=q.get("bits", 4),
                group_size=q.get("group_size", 128),
                sym=q.get("sym", method == "gptq"),
                desc_act=q.get("desc_act", False),
                lm_head_quantized=q.get("lm_head", False),
            )
        if method == "fp8":
            return QuantizationConfig(
                method="fp8",
                bits=8,
                activation_scheme=q.get("activation_scheme", "dynamic"),
                ignored_layers=tuple(q.get("ignored_layers", ())),
            )
        if method == "compressed-tensors":
            # real config_groups parsing: W8A8-int8 vs WNA16 per scheme
            # (ref: quant_config/compressed_tensors_moe.py:31,92)
            from vllm_metax_tpu.quantization.compressed_tensors import (
                parse_ct_scheme,
            )

            scheme, bits, group_size, sym = parse_ct_scheme(q)
            return QuantizationConfig(
                method="compressed-tensors",
                bits=bits,
                group_size=group_size,
                sym=sym,
                ct_scheme=scheme,
                ignored_layers=tuple(q.get("ignore", ())),
            )
        raise ValueError(f"unsupported quant_method {method!r}")


@dataclass
class ObservabilityConfig:
    collect_metrics: bool = True
    otlp_traces_endpoint: Optional[str] = None


@dataclass
class SpeculativeConfig:
    method: str = "none"  # "none" | "ngram" | "mtp" | "eagle"
    num_speculative_tokens: int = 0
    # ngram
    prompt_lookup_min: int = 1
    prompt_lookup_max: int = 4
    draft_model: str = ""
    # draft-head candidates per step (>1 → a depth-1 draft TREE verified
    # with tree-attention ancestor masks; ref: tree_attn.py + spec trees)
    speculative_branching: int = 1

    @property
    def enabled(self) -> bool:
        return self.method != "none" and self.num_speculative_tokens > 0


@dataclass
class EngineConfig:
    """Top-level aggregate (VllmConfig equivalent)."""

    model_config: ModelConfig = field(default_factory=ModelConfig)
    cache_config: CacheConfig = field(default_factory=CacheConfig)
    scheduler_config: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel_config: ParallelConfig = field(default_factory=ParallelConfig)
    device_config: DeviceConfig = field(default_factory=DeviceConfig)
    load_config: LoadConfig = field(default_factory=LoadConfig)
    quant_config: QuantizationConfig = field(default_factory=QuantizationConfig)
    observability_config: ObservabilityConfig = field(
        default_factory=ObservabilityConfig
    )
    speculative_config: SpeculativeConfig = field(default_factory=SpeculativeConfig)
    # multi-LoRA serving (None = disabled); see vllm_metax_tpu/lora.py
    lora_config: Optional["object"] = None

    def __post_init__(self):
        self.check_and_update()

    def check_and_update(self) -> None:
        """TPU constraint pass (analog of MacaPlatform.check_and_update_config,
        reference platform.py:118-221)."""
        mc, cc, sc = self.model_config, self.cache_config, self.scheduler_config
        # Block size must tile the (sublane, lane) layout; 16 matches the
        # reference default (platform.py:129) and bf16 sublane tiling.
        if cc.block_size % 16 != 0:
            raise ValueError(f"block_size must be a multiple of 16, got {cc.block_size}")
        if mc.use_mla and cc.block_size < 64:
            # MLA kernels want larger pages (ref coerces to 64, platform.py:128-196)
            cc.block_size = 64
        if cc.kv_quantized and cc.block_size % 128:
            # native quantized-KV attention DMAs scale pages as 128-lane
            # slices (ragged_attention.py); keep total KV bytes constant
            cc.num_blocks = max(1, cc.num_blocks * cc.block_size // 128)
            cc.block_size = 128
        if (
            "linear_attention" in (mc.hf_config or {}).get("layer_types", ())
            or (mc.hf_config or {}).get("model_type") in (
                "mamba", "mamba2", "falcon_mamba", "jamba"
            )
        ):
            # hybrid linear-attention (Qwen3-Next): recurrent state can be
            # neither prefix-shared nor rewound, so prefix caching and
            # speculative drafts are off (the reference gates its FLA models
            # the same way)
            cc.enable_prefix_caching = False
            if self.speculative_config is not None and self.speculative_config.enabled:
                raise ValueError(
                    "speculative decoding is not supported for hybrid "
                    "linear-attention models (recurrent state cannot rewind)"
                )
            pc2 = self.parallel_config
            if (
                pc2.tensor_parallel_size > 1
                or pc2.expert_parallel_size > 1
                or pc2.pipeline_parallel_size > 1
                or pc2.decode_context_parallel_size > 1
            ):
                # fail fast (before minutes of weight loading) — the model
                # runs replicated in v1; hybrid sharding is future work
                raise ValueError(
                    "Qwen3-Next (hybrid linear attention) does not support "
                    "tensor/expert/pipeline/decode-context parallelism yet"
                )
        if (mc.rope_scaling or {}).get("mrope_section"):
            # multimodal mrope (Qwen-VL family): spec drafts would need
            # mrope-aware verify rows; PP needs the embed/run_layers/finalize
            # module split the VL wrapper doesn't export yet
            if self.speculative_config is not None and self.speculative_config.enabled:
                raise ValueError(
                    "speculative decoding is not supported for mrope "
                    "(Qwen-VL) models yet"
                )
            if self.parallel_config.pipeline_parallel_size > 1:
                raise ValueError(
                    "pipeline parallelism is not supported for mrope "
                    "(Qwen-VL) models yet"
                )
        if mc.index_topk and cc.kv_quantized:
            # V3.2: the bf16 indexer-K side pool shares the v slot; per-row
            # scale plumbing for a quantized latent pool is not wired yet
            raise ValueError(
                "DeepSeek V3.2 (index_topk) requires kv_cache_dtype=auto"
            )
        sc.max_num_batched_tokens = max(
            sc.max_num_batched_tokens, cc.block_size
        )
        if not sc.enable_chunked_prefill:
            sc.max_num_batched_tokens = max(
                sc.max_num_batched_tokens, mc.max_model_len
            )
        # MTP spec decode: the draft head is a full extra MLA+MoE layer with
        # its own KV range (ref: vllm_metax/models/deepseek_mtp.py)
        spec = self.speculative_config
        if spec is not None and spec.method == "mtp" and spec.enabled:
            if not mc.use_mla:
                raise ValueError(
                    "speculative method 'mtp' needs a DeepSeek MLA model "
                    "(the MTP head is a DeepSeek spec layer)"
                )
            if spec.num_speculative_tokens != 1:
                raise ValueError(
                    "mtp supports num_speculative_tokens=1 (one MTP module, "
                    "matching DeepSeek-V3 checkpoints)"
                )
            mc.mtp_enabled = True
        if spec is not None and spec.method == "eagle" and spec.enabled:
            # EAGLE draft head (one llama decoder layer + fc, separate
            # checkpoint; ref: vllm v1/spec_decode/eagle.py)
            if mc.use_mla:
                raise ValueError(
                    "speculative method 'eagle' targets dense-attention "
                    "models; use method 'mtp' for DeepSeek"
                )
            if spec.num_speculative_tokens != 1:
                raise ValueError(
                    "eagle currently supports num_speculative_tokens=1"
                )
            mc.mtp_enabled = True
            mc.draft_model = spec.draft_model
        if spec is not None and spec.speculative_branching > 31:
            # tree-verify ancestor masks are 32-bit (root + 31 nodes)
            raise ValueError(
                "speculative_branching must be <= 31 (tree-verify rows are "
                "uint32 ancestor bitmasks)"
            )
