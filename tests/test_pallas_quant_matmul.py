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


def test_tiled_layout_roundtrip(rng):
    from vllm_metax_tpu.ops.pallas.quant_matmul import (
        TILE_N, tile_packed_weight, untile_packed_weight,
    )

    w = jnp.asarray(rng.integers(0, 255, size=(256, 1024)).astype(np.uint8))
    t1 = tile_packed_weight(w, tp=1)
    assert t1.shape == (1024 // TILE_N, 256, TILE_N)
    np.testing.assert_array_equal(np.asarray(untile_packed_weight(t1)),
                                  np.asarray(w))
    # tp=2 rank-major: first half of tiles == rank 0's columns
    t2 = tile_packed_weight(w, tp=2)
    nt_local = t2.shape[0] // 2
    r0 = untile_packed_weight(t2[:nt_local])
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(w[:, :512]))


def test_int4_tiled_kernel_matches_reference(rng):
    from vllm_metax_tpu.ops.pallas.quant_matmul import (
        int4_matmul_tiled_pallas, tile_packed_weight,
    )
    from vllm_metax_tpu.ops.quant import dequant_int4

    L, t, k, n, gs = 3, 16, 512, 512, 128
    x = jnp.asarray(rng.standard_normal((t, k), dtype=np.float32))
    banks, ss, zss = [], [], []
    for _ in range(L):
        w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32)) * 0.05
        w_p4, s, zs = quantize_int4_grouped(w, gs)
        banks.append(tile_packed_weight(w_p4, tp=1))
        ss.append(s)
        zss.append(zs)
    w_p4t = jnp.stack(banks)
    s_all, zs_all = jnp.stack(ss), jnp.stack(zss)
    from vllm_metax_tpu.ops.pallas.quant_matmul import untile_packed_weight

    for l in range(L):
        y = int4_matmul_tiled_pallas(x, w_p4t, s_all, zs_all, l, interpret=True)
        w_ref = dequant_int4(untile_packed_weight(w_p4t[l]), ss[l], zss[l],
                             jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w_ref),
                                   rtol=2e-5, atol=2e-4)


def test_int4_matmul_tiled_xla_fallback(rng):
    import os
    from vllm_metax_tpu.ops.pallas.quant_matmul import tile_packed_weight
    from vllm_metax_tpu.ops.quant import dequant_int4, int4_matmul_tiled

    L, t, k, n, gs = 2, 8, 256, 512, 64
    x = jnp.asarray(rng.standard_normal((t, k), dtype=np.float32))
    banks, ss, zss = [], [], []
    for _ in range(L):
        w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32)) * 0.05
        w_p4, s, zs = quantize_int4_grouped(w, gs)
        banks.append((tile_packed_weight(w_p4, 1), w_p4, s, zs))
    w_p4t = jnp.stack([b[0] for b in banks])
    s_all = jnp.stack([b[2] for b in banks])
    zs_all = jnp.stack([b[3] for b in banks])
    y = int4_matmul_tiled(x, w_p4t, s_all, zs_all, layer_idx=1)
    w_ref = dequant_int4(banks[1][1], banks[1][2], banks[1][3], jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w_ref),
                               rtol=1e-5, atol=1e-4)


def test_act_quant_pallas_matches_reference(rng):
    """Fused act-quant prologue == the unfused XLA reference bit-for-bit."""
    import jax.numpy as jnp

    from vllm_metax_tpu.ops.pallas.quant_matmul import (
        act_quant_pallas,
        quantize_activations_int8,
    )

    t, k, gs = 32, 256, 64
    x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32) * 3)
    xq, xs, sxq = act_quant_pallas(x, gs, interpret=True)
    xq_ref, xs_ref = quantize_activations_int8(x)
    sxq_ref = xq_ref.astype(jnp.float32).reshape(t, k // gs, gs).sum(-1)
    np.testing.assert_array_equal(np.asarray(xq), np.asarray(xq_ref))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sxq), np.asarray(sxq_ref), atol=0)


def test_w4a8_matmul_with_fused_act_quant(rng, monkeypatch):
    """W4A8 tiled matmul result is identical with the fused prologue on."""
    import jax.numpy as jnp

    from vllm_metax_tpu.ops.pallas.quant_matmul import (
        int4a8_matmul_tiled_pallas,
        w4a8_repack,
    )
    from vllm_metax_tpu.ops.quant import pack_int4

    t, k, n, gs = 16, 128, 256, 64
    g = k // gs
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint8)
    s = (rng.random((g, n), np.float32) + 0.5).astype(np.float32)
    z = np.full((g, n), 8.0, np.float32)
    x = rng.standard_normal((t, k)).astype(np.float32)
    packed = pack_int4(jnp.asarray(q))
    wp = w4a8_repack(jnp.asarray(packed)[None, None])  # (L=1, NT=1, K/2, N)
    sj = jnp.asarray(s)[None]
    zsj = jnp.asarray(z * s)[None]

    monkeypatch.setenv("METAX_TPU_FUSED_ACT_QUANT", "0")
    y0 = np.asarray(int4a8_matmul_tiled_pallas(
        jnp.asarray(x), wp, sj, zsj, 0, interpret=True))
    monkeypatch.setenv("METAX_TPU_FUSED_ACT_QUANT", "1")
    y1 = np.asarray(int4a8_matmul_tiled_pallas(
        jnp.asarray(x), wp, sj, zsj, 0, interpret=True))
    np.testing.assert_allclose(y0, y1, rtol=1e-6, atol=1e-6)


def test_fp8_stacked_matches_xla(rng):
    """Pallas stacked FP8 W8A8 (bit-trick e4m3→bf16 dequant) vs the XLA
    reference. Subnormal weights (|w| < 2^-6 pre-scale) flush to zero in
    the kernel — the test scales weights so normals dominate and checks the
    tail stays under quantization noise."""
    import jax

    from vllm_metax_tpu.ops.quant import fp8_matmul, quantize_fp8_channel

    l, t, k, n = 3, 64, 256, 256
    x = jnp.asarray(rng.standard_normal((t, k), dtype=np.float32))
    ws, w8s, ss = [], [], []
    for _ in range(l):
        w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32)) * 0.05
        w8, s = quantize_fp8_channel(w)
        w8s.append(w8)
        ss.append(s)
    w8 = jnp.stack(w8s)
    s = jnp.stack(ss)
    from vllm_metax_tpu.ops.pallas.quant_matmul import (
        fp8_stacked_matmul_pallas,
    )

    for li in range(l):
        y = fp8_stacked_matmul_pallas(x, w8, s, li, interpret=True)
        y_ref = fp8_matmul(x, w8[li], s[li])
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=2e-2, atol=2e-2
        )


def test_e4m3_bit_trick_exact_for_normals(rng):
    import jax

    from vllm_metax_tpu.ops.pallas.quant_matmul import _e4m3_to_bf16

    # all 256 bit patterns; compare against the reference convert on
    # normal-range values (|x| >= 2^-6); subnormals flush to signed zero
    u = np.arange(256, dtype=np.uint8)
    v = jax.lax.bitcast_convert_type(jnp.asarray(u), jnp.float8_e4m3fn)
    got = np.asarray(_e4m3_to_bf16(v), np.float32)
    ref = np.asarray(v.astype(jnp.bfloat16), np.float32)
    normal = np.abs(ref) >= 2.0**-6
    finite = np.isfinite(ref)
    np.testing.assert_array_equal(got[normal & finite], ref[normal & finite])
    sub = (~normal) & finite
    assert np.all(got[sub] == 0.0)
