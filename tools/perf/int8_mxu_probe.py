"""Does a Pallas s8xs8->s32 dot_general hit the v5e int8 MXU (2x bf16 rate)?

Pure matmul kernels, no unpack/scales: (T,K)@(K,N) per layer under lax.scan,
int8 vs bf16. If int8 time ~= bf16 time, Mosaic is not using the native int8
MXU mode and W4A8 cannot beat the exact bf16 kernel.
"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

T, K, N, L = 128, 4096, 14336, 8
TN = 256
rng = np.random.default_rng(0)
print("device:", jax.devices()[0].device_kind, flush=True)


def mm_kernel(x_ref, w_ref, o_ref, *, acc_t):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("acc_t", "out_t"))
def mm(x, w, acc_t, out_t):
    t, k = x.shape
    l, kk, n = w.shape
    return pl.pallas_call(
        functools.partial(mm_kernel, acc_t=acc_t),
        out_shape=jax.ShapeDtypeStruct((t, n), out_t),
        grid=(n // TN,),
        in_specs=[
            pl.BlockSpec((t, k), lambda j: (0, 0)),
            pl.BlockSpec((1, k, TN), lambda j: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec((t, TN), lambda j: (0, j)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w)


def run(name, x, w, acc_t, out_t, iters=16):
    @jax.jit
    def many(x0, w):
        def body(carry, l):
            x, acc = carry
            y = mm(x, jax.lax.dynamic_slice_in_dim(w, l, 1, 0), acc_t, out_t)
            s = y.astype(jnp.float32).sum()
            # data dependency so scan iterations cannot be hoisted/merged
            # (never true at these magnitudes, but opaque to the compiler)
            x = jnp.where(s > 1e30, x + jnp.ones((), x.dtype), x)
            return (x, acc + s), None

        def outer(carry, _):
            return jax.lax.scan(body, carry, jnp.arange(L))[0], None

        (x1, acc), _ = jax.lax.scan(
            outer, (x0, jnp.float32(0)), None, length=iters
        )
        return acc

    t0 = time.perf_counter(); v = float(many(x, w)); t1 = time.perf_counter()
    v = float(many(x, w)); t2 = time.perf_counter()
    per_mm_ms = (t2 - t1 - 0.028) / (iters * L) * 1e3
    bf16_floor = 2 * T * K * N / 197e12 * 1e3
    int8_floor = bf16_floor / 2
    print(f"{name}: {per_mm_ms:.3f} ms/matmul (compile {t1-t0:.0f}s) "
          f"[bf16-MXU {bf16_floor:.3f}, int8-MXU {int8_floor:.3f}]", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "int8"):
    x8 = jnp.asarray(rng.integers(-100, 100, (T, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-8, 8, (L, K, N)), jnp.int8)
    run("int8 s8xs8->s32", x8, w8, jnp.int32, jnp.int32)
if which in ("all", "bf16"):
    xb = jnp.asarray(rng.standard_normal((T, K)) * 0.1, jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((L, K, N)) * 0.02, jnp.bfloat16)
    run("bf16", xb, wb, jnp.float32, jnp.bfloat16)
