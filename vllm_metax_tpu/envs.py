"""Lazy environment-variable overlay.

Mirrors the reference plugin's env pattern (vllm_metax/envs.py:16-76): a dict of
callables evaluated on attribute access, so tests can monkeypatch os.environ.
"""

import os
from typing import Any, Callable

environment_variables: dict[str, Callable[[], Any]] = {
    # Force a specific attention implementation: "auto" | "xla" | "pallas"
    "METAX_TPU_ATTN_IMPL": lambda: os.getenv("METAX_TPU_ATTN_IMPL", "auto"),
    # Force matmul implementation for quantized linears: "auto" | "xla" | "pallas"
    "METAX_TPU_QUANT_IMPL": lambda: os.getenv("METAX_TPU_QUANT_IMPL", "auto"),
    # W4A8 fast path for int4 linears: quantize activations to int8 per-token
    # and run the int8 MXU (2x the bf16 MXU rate, no per-weight VPU dequant).
    # "1" = on for the tiled int4 path; "0" = exact bf16-activation kernel.
    "METAX_TPU_W4A8": lambda: os.getenv("METAX_TPU_W4A8", "0") == "1",
    # EP token dispatch: "auto" (default — DROPLESS token-sharded
    # all-to-all with size-exchange + exact replicated fallback for batches
    # past the bandwidth crossover; replicated below it), "a2a" (force),
    # "replicated" (force). Analog of the reference's VLLM_ALL2ALL_BACKEND
    # deepep dropless backends (platform.py:202-217).
    "METAX_TPU_EP_DISPATCH": lambda: os.getenv(
        "METAX_TPU_EP_DISPATCH", "auto"
    ),
    # fuse the W4A8 activation quant + per-group sums into one Pallas pass
    # (replaces 3-4 XLA fusions per linear; validate on hardware first)
    "METAX_TPU_FUSED_ACT_QUANT": lambda: os.getenv(
        "METAX_TPU_FUSED_ACT_QUANT", "1"
    ) == "1",
    # fused [K‖V] page pools for standard attention: K and V side by side in
    # one (NB, H, BS, 2D) array — ONE scatter row per (layer, token, head)
    # commits both sides (scatter cost is per row) and ONE page DMA feeds
    # attention. "1" = on (default); "0" = split K/V pools.
    "METAX_TPU_KV_FUSED": lambda: os.getenv("METAX_TPU_KV_FUSED", "1") == "1",
    # vertical-slash sparse prefill executor: "auto" = block-sparse Pallas
    # kernel on TPU (XLA gather elsewhere), "pallas"/"xla" force
    "METAX_TPU_SPARSE_IMPL": lambda: os.getenv(
        "METAX_TPU_SPARSE_IMPL", "auto"
    ),
    # Cascade / shared-prefix decode attention: compute a batch-wide shared
    # KV-page prefix once per step and LSE-merge with per-request suffixes
    # (ref: flash_attn.py:1013 cascade_attention)
    "METAX_TPU_CASCADE": lambda: os.getenv("METAX_TPU_CASCADE", "1") == "1",
    # Decode KV write mode: eager per-layer slab-bounce writes instead of
    # deferred current-token blending + one all-layer commit
    "METAX_TPU_DECODE_EAGER": lambda: os.getenv(
        "METAX_TPU_DECODE_EAGER", "0"
    ) == "1",
    # Prefill int8 requant: at load, dequantize each stacked int4 linear and
    # requantize per-channel int8; GEMMs with T >= METAX_TPU_PREFILL_MIN_T
    # tokens (prefill chunks) run W8A8 on the int8 MXU with a single
    # per-channel epilogue instead of the W4A8 per-group epilogue. Costs one
    # extra int8-resident weight copy; decode keeps the int4 bank. Numerics
    # gated via tools/ppl_gate.py (int8 per-channel measured −0.38% PPL).
    "METAX_TPU_PREFILL_REQUANT": lambda: os.getenv(
        "METAX_TPU_PREFILL_REQUANT", "0"
    ) == "1",
    # Token-count threshold above which requant-int8 prefill GEMMs kick in
    # (default 512: prefill chunks are >=512 tokens in practice, while decode
    # windows bucket at num_reqs — keeps huge decode batches on the int4 bank)
    "METAX_TPU_PREFILL_MIN_T": lambda: int(
        os.getenv("METAX_TPU_PREFILL_MIN_T", "512")
    ),
    # Quantized lm_head apply: W8A8 on the int8 MXU (default) vs int8
    # weight-only with VPU dequant
    "METAX_TPU_LMHEAD_W8A8": lambda: os.getenv(
        "METAX_TPU_LMHEAD_W8A8", "1"
    ) == "1",
    # batched all-layer KV commit form: "block" (gather→blend→scatter of
    # Decode-step KV commit lowering: "pallas" (default — slab-bounce DMA
    # kernel, ops/pallas/kv_commit.py), "rows" (token-row scatter), "dus",
    # or "block" (whole-block RMW; hung the TPU compiler on one toolchain)
    "METAX_TPU_KV_COMMIT": lambda: os.getenv("METAX_TPU_KV_COMMIT", "pallas"),
    # Fraction of free HBM to dedicate to the KV cache.
    "METAX_TPU_GPU_MEMORY_UTILIZATION": lambda: float(
        os.getenv("METAX_TPU_GPU_MEMORY_UTILIZATION", "0.9")
    ),
    # Extra compile-bucket sizes (comma separated token counts).
    "METAX_TPU_TOKEN_BUCKETS": lambda: os.getenv("METAX_TPU_TOKEN_BUCKETS", ""),
    # Log level for the engine logger.
    "METAX_TPU_LOG_LEVEL": lambda: os.getenv("METAX_TPU_LOG_LEVEL", "INFO"),
    # Directory for the persistent XLA compilation cache ("" disables).
    "METAX_TPU_CACHE_DIR": lambda: os.getenv(
        "METAX_TPU_CACHE_DIR", os.path.expanduser("~/.cache/vllm_metax_tpu")
    ),
}


def __getattr__(name: str) -> Any:
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__() -> list[str]:
    return list(environment_variables.keys())
