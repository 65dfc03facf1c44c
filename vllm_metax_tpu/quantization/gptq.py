"""GPTQ checkpoint loading: unpack HF GPTQ tensors → canonical packed layout.

HF GPTQ layout (what MacaGPTQConfig consumes, reference quant_config/gptq.py:22):
    qweight: (K/8, N) int32 — eight 4-bit values per word along K
    qzeros:  (K/g, N/8) int32 — eight 4-bit zero points per word along N,
             stored MINUS ONE (the GPTQ "+1" convention)
    scales:  (K/g, N) f16
    g_idx:   (K,) int32 — group index per input row (desc_act reordering)

We repack at load into {w_p4, s, zs[, perm]} (ops/quant.py docstring). This is
the load-time analog of the reference's gptq_shuffle + warmup-GEMM step
(quant_config/gptq.py:49-116): all layout work happens once, the hot path is a
single fused dequant-matmul.

desc_act handling: rows are sorted by g_idx so groups are contiguous in the
packed weight; `perm` (the sort order) is applied to activations at runtime —
the same trick as exllama's permutation (q_gemm.cu:1059 reconstruct kernels).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def unpack_gptq_qweight(qweight: np.ndarray, bits: int = 4) -> np.ndarray:
    """(K/pack, N) int32 → (K, N) uint8 values, packed along K."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    kq, n = qweight.shape
    shifts = (np.arange(pack, dtype=np.uint32) * bits)[None, :, None]
    vals = (qweight.astype(np.uint32)[:, None, :] >> shifts) & mask
    return vals.reshape(kq * pack, n).astype(np.uint8)


def unpack_gptq_qzeros(qzeros: np.ndarray, bits: int = 4) -> np.ndarray:
    """(G, N/pack) int32 → (G, N) uint8 zero points (with the +1 applied)."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    g, nq = qzeros.shape
    shifts = (np.arange(pack, dtype=np.uint32) * bits)[None, None, :]
    vals = (qzeros.astype(np.uint32)[:, :, None] >> shifts) & mask
    z = vals.reshape(g, nq * pack).astype(np.int32) + 1  # GPTQ +1 convention
    return (z & mask).astype(np.uint8)  # wrap 16→0 like the CUDA kernels


def repack_gptq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: np.ndarray | None,
    bits: int = 4,
) -> dict:
    """→ canonical {w_p4|w_i8, s, zs[, perm]} param dict (numpy in, jnp out)."""
    q = unpack_gptq_qweight(qweight, bits)  # (K, N) uint
    z = unpack_gptq_qzeros(qzeros, bits)  # (G, N)
    s = scales.astype(np.float32)  # (G, N)
    k, n = q.shape
    g = s.shape[0]
    gs = k // g

    perm = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx, np.int64)
        if not np.array_equal(g_idx, np.arange(k) // gs):
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            q = q[perm]
            # after the sort, row r belongs to group g_idx[perm[r]] == r // gs
            assert np.array_equal(g_idx[perm], np.arange(k) // gs), (
                "GPTQ g_idx does not form equal-size groups"
            )

    if bits == 4:
        from vllm_metax_tpu.ops.quant import pack_int4

        out = {
            "w_p4": pack_int4(jnp.asarray(q)),
            "s": jnp.asarray(s),
            "zs": jnp.asarray(z.astype(np.float32) * s),
        }
    elif bits == 8:
        # int8 stored asymmetric in GPTQ; fold zero into a symmetric-ish int8
        # layout: w = (q - z) * s → keep (q - z) as int8 (range fits: q,z∈[0,255])
        wq = q.astype(np.int32) - z.repeat(gs, axis=0).astype(np.int32)
        wq = np.clip(wq, -128, 127).astype(np.int8)
        out = {"w_i8": jnp.asarray(wq), "s": jnp.asarray(s)}
    else:
        raise ValueError(f"unsupported GPTQ bits={bits}")
    if perm is not None:
        out["perm"] = jnp.asarray(perm)
    return out


def load_gptq_linear(reader, prefix: str, qc, dtype) -> dict:
    """Read one GPTQ linear from a checkpoint and repack."""
    qweight = reader.get(f"{prefix}.qweight")
    qzeros = reader.get(f"{prefix}.qzeros")
    scales = reader.get(f"{prefix}.scales")
    g_idx = reader.get(f"{prefix}.g_idx") if reader.has(f"{prefix}.g_idx") else None
    return repack_gptq(qweight, qzeros, scales, g_idx, bits=qc.bits)
