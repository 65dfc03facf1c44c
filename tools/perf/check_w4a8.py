"""Correctness check: int4a8_matmul_tiled_pallas vs exact XLA integer math
(interpret mode on CPU)."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from vllm_metax_tpu.ops.pallas.quant_matmul import (
    int4a8_matmul_tiled_pallas, quantize_activations_int8,
    tile_packed_weight, w4a8_repack,
)
from vllm_metax_tpu.ops.quant import pack_int4

rng = np.random.default_rng(0)
T, K, N, GS, L = 16, 256, 256, 64, 2
G = K // GS

q = rng.integers(0, 16, size=(L, K, N), dtype=np.uint8)
s = (rng.random((L, G, N), dtype=np.float32) * 0.02 + 0.01)
z = rng.integers(6, 10, size=(L, G, N)).astype(np.float32)
zs = z * s
x = (rng.standard_normal((T, K)) * 0.5).astype(np.float32)

w_p4t = np.stack([np.asarray(tile_packed_weight(pack_int4(jnp.asarray(q[l])))) for l in range(L)])
w_p4t = np.asarray(w4a8_repack(jnp.asarray(w_p4t)))

for l in range(L):
    out = int4a8_matmul_tiled_pallas(
        jnp.asarray(x), jnp.asarray(w_p4t), jnp.asarray(s), jnp.asarray(zs),
        l, interpret=True,
    )
    # exact same integer math in XLA
    xq, xs = quantize_activations_int8(jnp.asarray(x))
    xqf = np.asarray(xq, np.float64)
    acc = np.zeros((T, N))
    for g in range(G):
        dot = xqf[:, g*GS:(g+1)*GS] @ q[l, g*GS:(g+1)*GS].astype(np.float64)
        acc += dot * s[l, g][None, :]
        acc -= np.outer(xqf[:, g*GS:(g+1)*GS].sum(-1), np.ones(N)) * zs[l, g][None, :]
    ref = acc * np.asarray(xs, np.float64)
    err = np.abs(np.asarray(out, np.float64) - ref).max() / (np.abs(ref).max() + 1e-9)
    # and vs the unquantized-activation ground truth
    wdeq = (q[l].astype(np.float64).reshape(G, GS, N) * s[l][:, None, :] - zs[l][:, None, :]).reshape(K, N)
    full = x.astype(np.float64) @ wdeq
    err_full = np.abs(np.asarray(out, np.float64) - full).max() / (np.abs(full).max() + 1e-9)
    print(f"layer {l}: exact-math rel err {err:.2e}, vs-unquantized rel err {err_full:.3e}")
    assert err < 1e-5, err
    assert err_full < 2e-2, err_full
print("OK")
