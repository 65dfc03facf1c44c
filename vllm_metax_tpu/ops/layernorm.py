"""RMSNorm ops.

Reference math: csrc/layernorm_kernels.cu:13 (rms_norm) and :48
(fused_add_rms_norm). On TPU these are bandwidth-bound elementwise ops that XLA
fuses into neighbors; we keep them as jnp functions with fp32 accumulation
(matching the CUDA kernels' float variance accumulator).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(orig_dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Classic LayerNorm (mean-subtracting, affine) for GPT-2/OPT-class
    models; fp32 statistics like the rms_norm above."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (
        xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    ).astype(orig_dtype)


def fused_add_rms_norm(
    x: jnp.ndarray, residual: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6
):
    """Returns (normed, new_residual) — residual add fused with the norm
    (ref: fused_add_rms_norm, csrc/layernorm_kernels.cu:48)."""
    residual = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(residual, weight, eps), residual
