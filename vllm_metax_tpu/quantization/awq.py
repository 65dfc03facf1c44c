"""AWQ checkpoint loading: unpack HF AWQ tensors → canonical packed layout.

HF AWQ layout (what MacaAWQConfig consumes, reference quant_config/awq.py:24):
    qweight: (K, N/8) int32 — eight 4-bit values per word along N, in the AWQ
             interleaved order [0, 2, 4, 6, 1, 3, 5, 7]
    qzeros:  (K/g, N/8) int32 — same packing, NO +1 offset
    scales:  (K/g, N) f16

Repacked into the same canonical {w_p4, s, zs} as GPTQ so both share one
fused dequant-matmul kernel — exactly how the reference converges AWQ onto its
GPTQ GEMM via awq_to_gptq_4bit (quant_config/awq.py:78,
csrc/quantization/awq/gemm_kernels.cu:128).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# AWQ packs nibble i of each word at bit position AWQ_ORDER[i]*4.
_AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7], dtype=np.int64)
_AWQ_UNORDER = np.argsort(_AWQ_ORDER)  # logical col j lives at nibble UNORDER[j]


def unpack_awq(packed: np.ndarray, bits: int = 4) -> np.ndarray:
    """(R, C/pack) int32 → (R, C) uint8, undoing the AWQ nibble interleave."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    r, cq = packed.shape
    shifts = (np.arange(pack, dtype=np.uint32) * bits)[None, None, :]
    vals = (packed.astype(np.uint32)[:, :, None] >> shifts) & mask  # (R, C/8, 8)
    if bits == 4:
        vals = vals[:, :, _AWQ_UNORDER]
    return vals.reshape(r, cq * pack).astype(np.uint8)


def repack_awq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    bits: int = 4,
) -> dict:
    q = unpack_awq(qweight, bits)  # (K, N)
    z = unpack_awq(qzeros, bits)  # (G, N)
    s = scales.astype(np.float32)  # (G, N)
    if bits == 4:
        from vllm_metax_tpu.ops.quant import pack_int4

        return {
            "w_p4": pack_int4(jnp.asarray(q)),
            "s": jnp.asarray(s),
            "zs": jnp.asarray(z.astype(np.float32) * s),
        }
    raise ValueError(f"unsupported AWQ bits={bits}")


def load_awq_linear(reader, prefix: str, qc, dtype) -> dict:
    return repack_awq(
        reader.get(f"{prefix}.qweight"),
        reader.get(f"{prefix}.qzeros"),
        reader.get(f"{prefix}.scales"),
        bits=qc.bits,
    )
