"""Prefill int8-requant path (envs.METAX_TPU_PREFILL_REQUANT).

At load, every stacked packed-int4 linear grows an int8-per-channel copy
(w8p/s8p); GEMMs at prefill token counts (T >= METAX_TPU_PREFILL_MIN_T)
run W8A8 on it while decode-sized calls keep the int4 bank. Reference
analog: shape-keyed kernel dispatch in csrc/quantization/gptq/q_gemm.cu:2373
region (m-threshold GEMV/GEMM selection).

Checks: kernel vs XLA reference math; apply_linear dispatch by T; engine
e2e under the env flag stays close to the int4 baseline (requant changes
numerics by design — gated via tools/ppl_gate.py, int8 per-channel
measured -0.38% PPL there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metax_tpu.ops.quant import (
    dequant_int4,
    quantize_int4_grouped,
    quantize_int8_channel,
    w8a8_int8_matmul,
)


def _bank(rng, l, k, n, gs):
    ws, p4s, ss, zss, w8s, s8s = [], [], [], [], [], []
    for _ in range(l):
        w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32)) * 0.05
        w_p4, s, zs = quantize_int4_grouped(w, gs)
        w8, s8 = quantize_int8_channel(dequant_int4(w_p4, s, zs, jnp.float32))
        ws.append(w)
        p4s.append(w_p4)
        ss.append(s)
        zss.append(zs)
        w8s.append(w8)
        s8s.append(s8)
    stack = lambda xs: jnp.stack(xs)  # noqa: E731
    return (
        stack(ws), stack(p4s), stack(ss), stack(zss), stack(w8s), stack(s8s)
    )


def test_stacked_w8a8_kernel_matches_reference(rng):
    l, t, k, n = 3, 512, 256, 256
    _, _, _, _, w8p, s8p = _bank(rng, l, k, n, 64)
    x = jnp.asarray(rng.standard_normal((t, k), dtype=np.float32))
    from vllm_metax_tpu.ops.pallas.quant_matmul import (
        int8a8_stacked_matmul_pallas,
    )

    for li in range(l):
        y = int8a8_stacked_matmul_pallas(x, w8p, s8p, li, interpret=True)
        y_ref = w8a8_int8_matmul(x, w8p[li], s8p[li])
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-4
        )


def test_apply_linear_dispatches_by_token_count(rng, monkeypatch):
    monkeypatch.setenv("METAX_TPU_PREFILL_MIN_T", "512")
    from vllm_metax_tpu.layers.linear import apply_linear

    l, k, n, gs = 2, 256, 256, 64
    _, w_p4, s, zs, w8p, s8p = _bank(rng, l, k, n, gs)
    p = {"w_p4": w_p4, "s": s, "zs": zs, "w8p": w8p, "s8p": s8p}

    x_small = jnp.asarray(rng.standard_normal((128, k), dtype=np.float32))
    x_big = jnp.asarray(rng.standard_normal((512, k), dtype=np.float32))

    # decode-sized call -> int4 math exactly
    y_small = apply_linear(p, x_small, layer_idx=1)
    y_int4 = jnp.dot(x_small, dequant_int4(w_p4[1], s[1], zs[1], jnp.float32))
    np.testing.assert_allclose(
        np.asarray(y_small), np.asarray(y_int4), rtol=2e-5, atol=2e-4
    )

    # prefill-sized call -> W8A8 requant math exactly
    y_big = apply_linear(p, x_big, layer_idx=0)
    y_w8 = w8a8_int8_matmul(x_big, w8p[0], s8p[0])
    np.testing.assert_allclose(
        np.asarray(y_big), np.asarray(y_w8), rtol=2e-5, atol=2e-4
    )
    # and the two quantization grids agree closely on real scales
    y_alt = jnp.dot(x_big, dequant_int4(w_p4[0], s[0], zs[0], jnp.float32))
    err = np.abs(np.asarray(y_big) - np.asarray(y_alt)).mean()
    ref = np.abs(np.asarray(y_alt)).mean()
    assert err / ref < 0.02


def test_runner_builds_requant_bank(monkeypatch, small_model_config):
    monkeypatch.setenv("METAX_TPU_PREFILL_REQUANT", "1")
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        QuantizationConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=QuantizationConfig(method="gptq", bits=4, group_size=32),
    )
    eng = EngineCore(config)
    layers = eng.runner.params["layers"]
    # default scope "mlp": the big MLP GEMMs get the int8 copy (80% of
    # prefill FLOPs); attention projections stay int4-only (memory budget)
    for name in ("gate_up", "down"):
        assert "w8p" in layers[name], name
        assert layers[name]["w8p"].dtype == jnp.int8
        assert layers[name]["s8p"].shape[-2] == 1
    for name in ("qkv", "o"):
        assert "w8p" not in layers[name], name
    # engine still generates sane greedy tokens end-to-end
    eng.add_request(
        "r0", [1, 5, 9, 4, 2, 8], SamplingParams(max_tokens=4, temperature=0.0)
    )
    tokens = []
    while eng.has_unfinished_requests():
        for out in eng.step():
            tokens.extend(out.new_token_ids)
    assert len(tokens) == 4
