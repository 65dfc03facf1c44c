"""Pallas fused dequant-matmul kernels vs the XLA reference math
(interpret mode on CPU; the same kernels compile natively on TPU).

Pattern: reference's tests/kernels/quantization/test_gptq.py — kernel output
compared elementwise against the pure dequant+matmul reference.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metax_tpu.ops.pallas.quant_matmul import (
    int4_matmul_pallas,
    int8_wo_matmul_pallas,
)
from vllm_metax_tpu.ops.quant import (
    dequant_int4,
    quantize_int4_grouped,
    quantize_int8_channel,
)


@pytest.mark.parametrize("t,k,n,gs", [
    (16, 256, 256, 64),
    (128, 512, 256, 128),
    (256, 256, 512, 32),   # multi T- and N-tiles
    (16, 2048, 384, 128),  # K chunking (KC=1024) exercised; odd-ish N=384
])
def test_int4_pallas_matches_xla(rng, t, k, n, gs):
    if n % 128:
        pytest.skip("N must be lane-aligned")
    x = jnp.asarray(rng.standard_normal((t, k), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32)) * 0.05
    w_p4, s, zs = quantize_int4_grouped(w, gs)
    y = int4_matmul_pallas(x, w_p4, s, zs, interpret=True)
    y_ref = jnp.dot(x, dequant_int4(w_p4, s, zs, jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("t,k,n,grouped", [
    (16, 256, 256, False),
    (128, 512, 384, True),
    (256, 1024, 256, False),
])
def test_int8_pallas_matches_xla(rng, t, k, n, grouped):
    x = jnp.asarray(rng.standard_normal((t, k), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32)) * 0.05
    if grouped:
        gs = 128
        wf = np.asarray(w).reshape(k // gs, gs, n)
        sc = np.maximum(np.abs(wf).max(axis=1) / 127.0, 1e-10)
        q = np.clip(np.round(wf / sc[:, None, :]), -128, 127).astype(np.int8)
        w_i8 = jnp.asarray(q.reshape(k, n))
        s = jnp.asarray(sc)
        w_deq = jnp.asarray((q.astype(np.float32) * sc[:, None, :]).reshape(k, n))
    else:
        w_i8, s = quantize_int8_channel(w)
        w_deq = w_i8.astype(jnp.float32) * s
    y = int8_wo_matmul_pallas(x, w_i8, s, interpret=True)
    y_ref = jnp.dot(x, w_deq)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-4)


def test_int4_pallas_bf16_activation(rng):
    x = jnp.asarray(
        rng.standard_normal((16, 256), dtype=np.float32), dtype=jnp.bfloat16
    )
    w = jnp.asarray(rng.standard_normal((256, 256), dtype=np.float32)) * 0.05
    w_p4, s, zs = quantize_int4_grouped(w, 64)
    y = int4_matmul_pallas(x, w_p4, s, zs, interpret=True)
    y_ref = jnp.dot(
        x, dequant_int4(w_p4, s, zs, jnp.bfloat16), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), rtol=0.02, atol=0.05
    )
