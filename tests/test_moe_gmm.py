"""Grouped dequant-GEMM MoE path (ops/pallas/moe_gmm.py) exactness.

The tiled-bank path must match the dense-dequant fused_experts bit-for-bit
in math (same quantized values, different execution): the reference analog is
fused_moe_kernel_gptq_awq (vllm_metax/model_executor/layers/fused_moe/
fused_moe.py:87) vs its torch_moe test oracle. Kernels run in Pallas
interpret mode on CPU (auto-selected inside _fused_experts_gmm).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metax_tpu.config import QuantizationConfig
from vllm_metax_tpu.ops.activation import silu_and_mul
from vllm_metax_tpu.ops.moe import fused_experts, fused_topk
from vllm_metax_tpu.ops.pallas.moe_gmm import (
    build_aligned_dispatch,
    moe_tiling,
    tile_expert_bank,
)
from vllm_metax_tpu.quantization import quantize_linear

H, I2, E, T, K = 256, 128, 4, 8, 2


def _routing(rng):
    gating = jnp.asarray(rng.standard_normal((T, E), dtype=np.float32))
    return fused_topk(gating, K)


def _banks(rng, qc, layers=1):
    """Per-layer quantized gate_up/down banks, both flat and tiled-stacked."""
    flat1, flat2, t1, t2 = [], [], [], []
    for _ in range(layers):
        w1 = rng.standard_normal((E, H, 2 * I2), dtype=np.float32) * 0.05
        w2 = rng.standard_normal((E, I2, H), dtype=np.float32) * 0.05
        b1 = jax.vmap(lambda w: quantize_linear({"w": w}, qc))(jnp.asarray(w1))
        b2 = jax.vmap(lambda w: quantize_linear({"w": w}, qc))(jnp.asarray(w2))
        flat1.append(b1)
        flat2.append(b2)
    stack = lambda bs: jax.tree_util.tree_map(  # noqa: E731
        lambda *a: jnp.stack(a), *bs
    )
    s1, s2 = stack(flat1), stack(flat2)

    def tiled(bank):
        wkey = "w_p4" if "w_p4" in bank else "w_i8"
        out = {k: v for k, v in bank.items() if k != wkey}
        out[wkey + "t"] = tile_expert_bank(bank[wkey])
        return out

    return flat1, flat2, tiled(s1), tiled(s2)


@pytest.mark.parametrize("qc", [
    QuantizationConfig(method="gptq", bits=4, group_size=64),
    QuantizationConfig(method="int8", bits=8),
], ids=["int4", "int8"])
def test_gmm_matches_dense_dequant(rng, qc):
    x = jnp.asarray(rng.standard_normal((T, H), dtype=np.float32) * 0.5)
    topk_w, topk_ids = _routing(rng)
    flat1, flat2, t1, t2 = _banks(rng, qc, layers=2)
    for layer in range(2):
        ref = fused_experts(
            x, flat1[layer], flat2[layer], topk_w, topk_ids,
            silu_and_mul, E,
        )
        out = fused_experts(
            x, t1, t2, topk_w, topk_ids, silu_and_mul, E,
            layer_idx=jnp.int32(layer),
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4,
            err_msg=f"layer {layer}",
        )


def test_gmm_requires_layer_idx(rng):
    x = jnp.asarray(rng.standard_normal((T, H), dtype=np.float32))
    topk_w, topk_ids = _routing(rng)
    qc = QuantizationConfig(method="int8", bits=8)
    _, _, t1, t2 = _banks(rng, qc)
    with pytest.raises(ValueError, match="layer_idx"):
        fused_experts(x, t1, t2, topk_w, topk_ids, silu_and_mul, E)


def test_aligned_dispatch_layout(rng):
    """Slot layout invariants: each sorted row lands in its expert's aligned
    span, tile→expert map is consistent, out-of-span rows (EP) are dropped."""
    m, e_total = 64, 8
    flat_expert = rng.integers(0, e_total, size=m).astype(np.int32)
    order = np.argsort(flat_expert, kind="stable")
    sorted_expert = flat_expert[order]
    sorted_token = np.arange(m, dtype=np.int32)[order]
    sorted_weight = rng.random(m).astype(np.float32) + 0.5  # never 0
    counts = np.bincount(flat_expert, minlength=e_total).astype(np.int32)

    for e_start, e_local in [(0, e_total), (2, 3), (6, 2)]:
        tm, m_slots = moe_tiling(m, e_local)
        st, sw, te = build_aligned_dispatch(
            jnp.asarray(sorted_token), jnp.asarray(sorted_weight),
            jnp.asarray(counts), jnp.int32(e_start), e_local, tm, m_slots,
        )
        st, sw, te = np.asarray(st), np.asarray(sw), np.asarray(te)
        assert te.shape == (m_slots // tm,)
        assert ((te >= 0) & (te < e_local)).all()
        # every in-span sorted row appears exactly once, in a tile whose
        # expert matches; weights ride along
        tok2w = dict(zip(sorted_token.tolist(), sorted_weight.tolist()))
        tok2e = dict(zip(sorted_token.tolist(), sorted_expert.tolist()))
        seen = []
        for slot in range(m_slots):
            if sw[slot] == 0.0:
                continue  # padded slot
            tok = int(st[slot])
            assert sw[slot] == pytest.approx(tok2w[tok])
            assert tok2e[tok] - e_start == te[slot // tm]
            seen.append(tok)
        in_span = [
            int(t_)
            for t_, e_ in zip(sorted_token, sorted_expert)
            if e_start <= e_ < e_start + e_local
        ]
        assert sorted(seen) == sorted(in_span)


def test_moe_tiling_bounds():
    for m, e in [(8, 4), (64, 8), (256, 64), (16, 256)]:
        tm, m_slots = moe_tiling(m, e)
        assert tm >= 8 and tm % 8 == 0
        assert m_slots % tm == 0
        assert m_slots >= m  # all real rows fit even in the worst case
        assert m_slots >= m + 0  # headroom covers per-expert padding
        # worst case: every expert's count is (something % tm) ≠ 0
        assert m_slots >= -(-m // tm) * tm
