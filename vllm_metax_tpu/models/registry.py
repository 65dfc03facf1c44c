"""Model registry (analog of the reference's ModelRegistry.register_model calls,
vllm_metax/models/__init__.py:6-44).

Each model module exposes:
- init_params(cfg, quant_cfg, seed) -> params pytree (dummy weights)
- load_weights(cfg, quant_cfg, path) -> params pytree (HF safetensors)
- forward(params, input_ids, kv_cache, attn_metadata, cfg, tp_size, axis_name)
    -> (hidden, new_kv_cache)
- compute_logits(params, hidden, cfg, axis_name) -> logits
- param_specs(cfg, quant_cfg) -> pytree of PartitionSpec for TP sharding
- kv_cache_spec(cfg) -> dict describing per-layer KV shape
"""

from __future__ import annotations

import importlib

_REGISTRY: dict[str, str] = {
    # Llama family — one TPU-native implementation covers the variants,
    # configured by ModelConfig flags (bias, sliding window, tied embeddings).
    "LlamaForCausalLM": "vllm_metax_tpu.models.llama",
    "Qwen2ForCausalLM": "vllm_metax_tpu.models.llama",
    "Qwen3ForCausalLM": "vllm_metax_tpu.models.llama",
    "MistralForCausalLM": "vllm_metax_tpu.models.llama",
    "BaiChuanForCausalLM": "vllm_metax_tpu.models.llama",
    "Phi3ForCausalLM": "vllm_metax_tpu.models.llama",
    # Gemma family (1+w norms, scaled embeddings, Gemma-2 sandwich norms +
    # soft-caps + alternating sliding window)
    "GemmaForCausalLM": "vllm_metax_tpu.models.gemma",
    "Gemma2ForCausalLM": "vllm_metax_tpu.models.gemma",
    # GPT-2 (LayerNorm + learned positions + non-gated MLP)
    "GPT2LMHeadModel": "vllm_metax_tpu.models.gpt2",
    "OPTForCausalLM": "vllm_metax_tpu.models.opt",
    "GPTNeoXForCausalLM": "vllm_metax_tpu.models.gpt_neox",
    # MoE family
    "MixtralForCausalLM": "vllm_metax_tpu.models.mixtral",
    "Qwen2MoeForCausalLM": "vllm_metax_tpu.models.mixtral",
    "Qwen3MoeForCausalLM": "vllm_metax_tpu.models.mixtral",
    # DeepSeek (MLA + MoE)
    "DeepseekV2ForCausalLM": "vllm_metax_tpu.models.deepseek",
    "DeepseekV3ForCausalLM": "vllm_metax_tpu.models.deepseek",
    # V3.2 = V3 + sparse-attention lightning indexer (ref:
    # vllm_metax/models/__init__.py:43 maps V32 onto the V3 class too)
    "DeepseekV32ForCausalLM": "vllm_metax_tpu.models.deepseek",
    # Baichuan-MoE (per-layer heterogeneous experts + NormHead;
    # ref: vllm_metax/models/baichuan_moe.py)
    "BaiChuanMoEForCausalLM": "vllm_metax_tpu.models.baichuan_moe",
    # Qwen3-Next: hybrid Gated-DeltaNet linear attention + gated full
    # attention (ref: the reference's FLA kernel patch,
    # vllm_metax/patch/model_executor/kernel/fla.py)
    "Qwen3NextForCausalLM": "vllm_metax_tpu.models.qwen3_next",
    # Qwen-VL multimodal family (ref: vllm_metax/models/qwen2_vl.py,
    # qwen2_5_vl.py): ViT + mrope text model
    "Qwen2VLForConditionalGeneration": "vllm_metax_tpu.models.qwen2_vl",
    "Qwen2_5_VLForConditionalGeneration": "vllm_metax_tpu.models.qwen2_vl",
    "Qwen3VLForConditionalGeneration": "vllm_metax_tpu.models.qwen2_vl",
    "Qwen3VLMoeForConditionalGeneration": "vllm_metax_tpu.models.qwen2_vl",
    # Mamba-1 selective-state-space LM (ref: the selective_scan_fwd kernel,
    # csrc/mamba/mamba_ssm/selective_scan_fwd.cu)
    "MambaForCausalLM": "vllm_metax_tpu.models.mamba",
    "Mamba2ForCausalLM": "vllm_metax_tpu.models.mamba",
    "FalconMambaForCausalLM": "vllm_metax_tpu.models.mamba",
    # Jamba hybrid (attention + Mamba + MoE)
    "JambaForCausalLM": "vllm_metax_tpu.models.jamba",
}


class ModelRegistry:
    @staticmethod
    def register_model(arch: str, module: str) -> None:
        _REGISTRY[arch] = module

    @staticmethod
    def resolve(arch: str):
        if arch not in _REGISTRY:
            raise ValueError(
                f"unsupported architecture {arch!r}; known: {sorted(_REGISTRY)}"
            )
        return importlib.import_module(_REGISTRY[arch])


def get_model(arch: str):
    return ModelRegistry.resolve(arch)
