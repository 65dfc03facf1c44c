
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp, numpy as np, functools
from trace_time import device_time
from vllm_metax_tpu.ops.pallas.quant_matmul import (
    int4a8_matmul_tiled_pallas, tile_packed_weight, w4a8_repack, TILE_N,
)

T, GS, L = int(os.environ.get("SWEEP_T", "128")), 128, 2
rng = np.random.default_rng(0)

def measure(name, k, n):
    # weights generated ON DEVICE — host->device of GB-scale banks crawls
    # through the remote-TPU tunnel
    key = jax.random.PRNGKey(0)
    w = jax.random.randint(
        key, (L, k // 2, n), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    wt = w4a8_repack(jnp.stack([
        tile_packed_weight(w[l]) for l in range(L)
    ]))
    g = k // GS
    k1, k2 = jax.random.split(key)
    s = jax.random.uniform(k1, (L, g, n), jnp.float32, 0.005, 0.015)
    zs = jax.random.uniform(k2, (L, g, n), jnp.float32, 0.0, 0.01)
    x = jnp.asarray(rng.standard_normal((T, k)), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def loop(x, n_iter):
        def layer(carry, li):
            out = int4a8_matmul_tiled_pallas(carry, wt, s, zs, li)
            return (
                carry + out[:, : 1].astype(jnp.bfloat16) * 1e-6, None
            )
        def it(i, c):
            c2, _ = jax.lax.scan(layer, c, jnp.arange(L, dtype=jnp.int32))
            return c2
        return jax.lax.fori_loop(0, n_iter, it, x)

    n_iter = 10
    loop(x, n_iter).block_until_ready()
    total = device_time(lambda: loop(x, n_iter).block_until_ready())
    per_call = total / (n_iter * L)
    gbps = (k // 2) * n / per_call / 1e6
    sol = (k // 2) * n / 819e9 * 1e6
    print(f"{name}: {per_call*1e3:8.1f} us/call  {gbps:6.0f} GB/s "
          f"({per_call*1000/sol:4.2f}x SOL)", flush=True)

measure("gate_up(4096->28672)", 4096, 28672)
measure("down(14336->4096)", 14336, 4096)
