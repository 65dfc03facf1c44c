"""Pure HBM→VMEM streaming bandwidth via Pallas auto-pipelined BlockSpecs.

The W4A8 GEMM runs at ~470-520 GB/s of packed-weight read (55-65% of the
v5e 819 GB/s spec). Is that the kernel's fault or the achievable ceiling?
This kernel only STREAMS blocks (touches each block minimally so the fetch
cannot be elided) — its GB/s is the BlockSpec-pipeline ceiling for a given
block shape.

Times are in-jit iteration-differenced (block_until_ready through the axon
tunnel is unreliable for sub-ms timings).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stream_kernel(ii_ref, w_ref, out_ref):
    # touch the block so the fetch is live; one row's worth of VPU work.
    # ii makes each sweep's output iteration-dependent so the surrounding
    # fori_loop cannot hoist/CSE the call.
    out_ref[...] = (
        jnp.max(w_ref[0, 0:8, :].astype(jnp.int32), axis=0, keepdims=True)
        + ii_ref[0, 0]
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kh", "tn", "it"))
def run(w, kh, tn, it):
    nt = w.shape[0]

    def call(i):
        return pl.pallas_call(
            stream_kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda j: (0, 0)),
                pl.BlockSpec((1, kh, tn), lambda j: (j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tn), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, tn), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(i.reshape(1, 1), w)

    def body(i, acc):
        return acc + call(i)[0, 0].astype(jnp.float32)

    return jax.lax.fori_loop(0, it, body, jnp.float32(0))


def bench(kh, tn, gb=1.0):
    nbytes = int(gb * (1 << 30))
    nt = nbytes // (kh * tn)
    w = jnp.asarray(
        np.random.randint(-3, 3, (nt, kh, tn), np.int8), jnp.int8
    )
    real_gb = nt * kh * tn / (1 << 30)
    run(w, kh, tn, 2).block_until_ready()
    t0 = time.perf_counter(); run(w, kh, tn, 8).block_until_ready()
    t4 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(w, kh, tn, 108).block_until_ready()
    t20 = time.perf_counter() - t0
    per = (t20 - t4) / 100
    print(f"block ({kh:5d},{tn:4d}) = {kh*tn/1024:6.0f}KB x{nt:5d}: "
          f"{per*1e3:7.2f} ms/sweep = {real_gb/per:6.0f} GB/s")


def main():
    print("device:", jax.devices()[0].device_kind)
    bench(2048, 512)   # gate_up block at TILE_N=512
    bench(2048, 256)   # TILE_N=256
    bench(7168, 512)   # down-proj block
    bench(4096, 1024)  # 4MB blocks
    bench(1024, 512)   # small blocks
    bench(8192, 2048)  # 16MB blocks (beyond double-buffer budget?)


if __name__ == "__main__":
    main()
