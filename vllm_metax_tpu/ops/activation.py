"""Gated activation ops.

Reference math: csrc/activation_kernels.cu:24-103 (silu_and_mul and friends,
bound at csrc/torch_bindings.cpp:112-150). Input is the fused gate|up
projection output of shape (..., 2*d); output (..., d). XLA fuses these into
the surrounding matmuls, so plain jnp is the TPU-idiomatic form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split(x: jnp.ndarray):
    d = x.shape[-1] // 2
    return x[..., :d], x[..., d:]


def silu_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = _split(x)
    return jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up


def gelu_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = _split(x)
    return jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype) * up


def gelu_tanh_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = _split(x)
    return jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(x.dtype) * up


def swigluoai_and_mul(
    x: jnp.ndarray, alpha: float = 1.702, limit: float = 7.0
) -> jnp.ndarray:
    """gpt-oss-style clamped swiglu (ref: swigluoai_and_mul,
    csrc/activation_kernels.cu + torch_bindings.cpp:133)."""
    gate, up = _split(x)
    gate = jnp.minimum(gate.astype(jnp.float32), limit)
    up = jnp.clip(up.astype(jnp.float32), -limit, limit)
    out = gate * jax.nn.sigmoid(alpha * gate) * (up + 1.0)
    return out.astype(x.dtype)


def fatrelu_and_mul(x: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    gate, up = _split(x)
    return jnp.where(gate > threshold, gate, 0.0).astype(x.dtype) * up


ACT2FN = {
    "silu": silu_and_mul,
    "gelu": gelu_and_mul,
    "gelu_pytorch_tanh": gelu_tanh_and_mul,
}
