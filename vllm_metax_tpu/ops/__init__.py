"""TPU-native op library.

Replaces the reference's three native-op tiers (csrc/ CUDA kernels, Triton
kernels, torch custom-op wrappers in vllm_metax/_custom_ops.py) with:
- jnp/XLA implementations (reference math; always available; CPU-testable)
- Pallas TPU kernels for the hot paths (ops/pallas/*)

Dispatch is by platform + METAX_TPU_*_IMPL env overrides.
"""

from vllm_metax_tpu.ops.layernorm import rms_norm, fused_add_rms_norm
from vllm_metax_tpu.ops.activation import (
    silu_and_mul,
    gelu_and_mul,
    gelu_tanh_and_mul,
    swigluoai_and_mul,
)
from vllm_metax_tpu.ops.rope import apply_rope, compute_rope_cache

__all__ = [
    "rms_norm",
    "fused_add_rms_norm",
    "silu_and_mul",
    "gelu_and_mul",
    "gelu_tanh_and_mul",
    "swigluoai_and_mul",
    "apply_rope",
    "compute_rope_cache",
]
