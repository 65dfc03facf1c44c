"""TPU microbench: quantized-matmul kernel variants under a lax.scan over
layers (mirrors the runner's execution shape). Wall-clock via scalar fetch
over chained iterations (axon tunnel: block_until_ready lies)."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

from vllm_metax_tpu.ops.pallas.quant_matmul import (
    int4_matmul_tiled_pallas, int4a8_matmul_tiled_pallas, tile_packed_weight,
    w4a8_repack,
)
from vllm_metax_tpu.ops.quant import pack_int4

T, K, N, GS, L = 128, 4096, 14336, 128, 8
rng = np.random.default_rng(0)
print("device:", jax.devices()[0].device_kind, flush=True)

def make_bank(k, n):
    g = k // GS
    q = rng.integers(0, 16, size=(L, k, n), dtype=np.uint8)
    s = (rng.random((L, g, n), dtype=np.float32) * 0.02 + 0.01)
    zs = 8.0 * s
    wt = np.stack([np.asarray(tile_packed_weight(pack_int4(jnp.asarray(q[l])))) for l in range(L)])
    return jnp.asarray(wt), jnp.asarray(s), jnp.asarray(zs)

def make_bank_w4a8(bank):
    wt, s, zs = bank
    return w4a8_repack(wt), s, zs

up = make_bank(K, N)
dn = make_bank(N, K)
x0 = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32), jnp.bfloat16)
wup_bf = jnp.asarray(rng.standard_normal((L, K, N)).astype(np.float32) * 0.02, jnp.bfloat16)
wdn_bf = jnp.asarray(rng.standard_normal((L, N, K)).astype(np.float32) * 0.02, jnp.bfloat16)

def run(name, layer_fn, weights, iters=8):
    @jax.jit
    def many(h, weights):
        def outer(h, _):
            def layer(hh, l):
                return layer_fn(hh, l, weights), None
            h, _ = jax.lax.scan(layer, h, jnp.arange(L))
            return h, None
        h, _ = jax.lax.scan(outer, h, None, length=iters)
        return h[0, 0]
    t0 = time.perf_counter()
    v = float(many(x0, weights))
    t1 = time.perf_counter()
    v = float(many(x0, weights))
    t2 = time.perf_counter()
    per_layer_ms = (t2 - t1 - 0.028) / (iters * L) * 1e3
    wbytes = (K*N + N*K) // 2
    hbm_ms = wbytes / 819e9 * 1e3
    mxu_bf16_ms = 2 * 2*T*K*N / 197e12 * 1e3
    print(f"{name}: {per_layer_ms:.3f} ms/layer (compile {t1-t0:.0f}s) "
          f"[int4-HBM floor {hbm_ms:.3f}, bf16-MXU floor {mxu_bf16_ms:.3f}]", flush=True)

def layer_int4(h, l, w):
    (u, dnw) = w
    y = int4_matmul_tiled_pallas(h, *u, l)
    h2 = int4_matmul_tiled_pallas(y, *dnw, l)
    return (h2 * 0.01 + h).astype(h.dtype)

def layer_w4a8(h, l, w):
    (u, dnw) = w
    y = int4a8_matmul_tiled_pallas(h, *u, l)
    h2 = int4a8_matmul_tiled_pallas(y, *dnw, l)
    return (h2 * 0.01 + h).astype(h.dtype)

def layer_bf16(h, l, w):
    (wu, wd) = w
    y = jnp.dot(h, wu[l], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    h2 = jnp.dot(y, wd[l], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return (h2 * 0.01 + h).astype(h.dtype)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "int4"):
    run("int4 (current, bf16 MXU)", layer_int4, (up, dn))
if which in ("all", "w4a8"):
    run("w4a8 (int8 MXU)", layer_w4a8, (make_bank_w4a8(up), make_bank_w4a8(dn)))
if which in ("all", "bf16"):
    run("bf16 dense", layer_bf16, (wup_bf, wdn_bf))
