"""Microbench: W4A8 kernel variants for the per-group scale application.

The shipped kernel (_int4a8_kernel) is VPU-bound: each of the G group dots
is followed by `acc += d.astype(f32) * s_row` — an int32→f32 convert plus an
FMA over the whole (TT, TN) tile, ~G×TT×TN×3 VPU lane-ops per weight block vs
a 0.6µs DMA. Variants:

  base      — shipped form (int32 dots, convert + FMA per group)
  f32dot    — int8 dots with preferred_element_type=f32 (convert folded into
              the MXU output path, if Mosaic supports s8xs8->f32)
  splitacc  — two accumulators (lo/hi plane) to break the FMA chain
  bf16acc   — accumulate the scaled partials in bf16 (half the VPU lanes)

Run on the real TPU: python tools/perf/w4a8_variants.py
Prints per-variant ms over L layers of gate_up-shaped blocks + implied HBM GB/s.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, N, L = 128, 4096, 28672, 8
GS = 128
TN = 256
KC = 1024
rng = np.random.default_rng(0)


def make_kernel(variant):
    def kernel(xq_ref, sxq_ref, w_ref, s_ref, out_ref):
        k_half = w_ref.shape[2]
        g_half = k_half // GS
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        acc2 = jnp.zeros(out_ref.shape, jnp.float32)
        pet = jnp.float32 if variant == "f32dot" else jnp.int32
        half_chunks = k_half // KC
        if variant == "bigdot":
            # LOWER BOUND only (wrong math): one K=KC dot per plane per chunk
            for c in range(half_chunks):
                b = w_ref[0, 0, c * KC : (c + 1) * KC, :]
                q_lo = jnp.bitwise_and(b, jnp.int8(0x0F))
                q_hi16 = jnp.bitwise_and(b, jnp.int8(-16))
                d_lo = jax.lax.dot_general(
                    xq_ref[:, c * KC : (c + 1) * KC], q_lo,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                d_hi = jax.lax.dot_general(
                    xq_ref[:, k_half + c * KC : k_half + (c + 1) * KC], q_hi16,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = acc + d_lo.astype(jnp.float32) + d_hi.astype(jnp.float32)
            z = jnp.dot(sxq_ref[:, g_half:],
                        s_ref[0, g_half:, :].astype(jnp.float32) * (-8.0),
                        preferred_element_type=jnp.float32)
            out_ref[:] = (acc - z).astype(out_ref.dtype)
            return
        if variant == "batched":
            # group-BATCHED dots: (ng, T, gs) x (ng, gs, TN) -> (ng, T, TN),
            # then the scale-weighted reduce over ng on the VPU
            for c in range(half_chunks):
                b = w_ref[0, 0, c * KC : (c + 1) * KC, :]
                q_lo = jnp.bitwise_and(b, jnp.int8(0x0F)).reshape(KC // GS, GS, TN)
                q_hi16 = jnp.bitwise_and(b, jnp.int8(-16)).reshape(KC // GS, GS, TN)
                ng = KC // GS
                g0 = (c * KC) // GS
                t = xq_ref.shape[0]
                xlo = xq_ref[:, c * KC : (c + 1) * KC].reshape(t, ng, GS).transpose(1, 0, 2)
                xhi = xq_ref[:, k_half + c * KC : k_half + (c + 1) * KC].reshape(t, ng, GS).transpose(1, 0, 2)
                d_lo = jax.lax.dot_general(
                    xlo, q_lo,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)  # (ng, T, TN)
                d_hi = jax.lax.dot_general(
                    xhi, q_hi16,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)
                s_lo = s_ref[0, g0:g0 + ng, :]  # (ng, TN)
                s_hi = s_ref[0, g_half + g0:g_half + g0 + ng, :] * (1.0 / 16.0)
                acc = acc + jnp.sum(
                    d_lo.astype(jnp.float32) * s_lo[:, None, :], axis=0)
                acc = acc + jnp.sum(
                    d_hi.astype(jnp.float32) * s_hi[:, None, :], axis=0)
            z = jnp.dot(sxq_ref[:, g_half:],
                        s_ref[0, g_half:, :].astype(jnp.float32) * (-8.0),
                        preferred_element_type=jnp.float32)
            out_ref[:] = (acc - z).astype(out_ref.dtype)
            return
        for c in range(half_chunks):
            b = w_ref[0, 0, c * KC : (c + 1) * KC, :]
            q_lo = jnp.bitwise_and(b, jnp.int8(0x0F))
            q_hi16 = jnp.bitwise_and(b, jnp.int8(-16))
            ng = KC // GS
            g0 = (c * KC) // GS
            for gi in range(ng):
                gsl = slice(gi * GS, (gi + 1) * GS)
                d_lo = jax.lax.dot_general(
                    xq_ref[:, c * KC + gi * GS : c * KC + (gi + 1) * GS],
                    q_lo[gsl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=pet,
                )
                d_hi = jax.lax.dot_general(
                    xq_ref[
                        :,
                        k_half + c * KC + gi * GS : k_half
                        + c * KC
                        + (gi + 1) * GS,
                    ],
                    q_hi16[gsl],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=pet,
                )
                s_lo = s_ref[0, g0 + gi, :][None, :]
                s_hi = s_ref[0, g_half + g0 + gi, :][None, :] * (1.0 / 16.0)
                if variant == "noscale":
                    acc = acc + d_lo.astype(jnp.float32)
                    acc = acc + d_hi.astype(jnp.float32)
                elif variant == "splitacc":
                    acc = acc + d_lo.astype(jnp.float32) * s_lo
                    acc2 = acc2 + d_hi.astype(jnp.float32) * s_hi
                elif variant == "bf16acc":
                    acc = acc + (
                        d_lo.astype(jnp.bfloat16) * s_lo.astype(jnp.bfloat16)
                    ).astype(jnp.float32)
                    acc = acc + (
                        d_hi.astype(jnp.bfloat16) * s_hi.astype(jnp.bfloat16)
                    ).astype(jnp.float32)
                else:
                    acc = acc + d_lo.astype(jnp.float32) * s_lo
                    acc = acc + d_hi.astype(jnp.float32) * s_hi
        z = jnp.dot(
            sxq_ref[:, g_half:],
            s_ref[0, g_half:, :].astype(jnp.float32) * (-8.0),
            preferred_element_type=jnp.float32,
        )
        out_ref[:] = (acc + acc2 - z).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "n_iter"))
def run(xq, sxq, w, s, variant, n_iter):
    t = xq.shape[0]
    l, nt, k_half, tn = w.shape
    n = nt * tn

    def layer(carry, inputs):
        wl, sl = inputs
        if variant.endswith("+xvmem"):
            # x-side inputs live whole in VMEM for the entire call — no
            # possibility of per-cell refetch of the grid-constant blocks
            kern = make_kernel(variant[: -len("+xvmem")])

            def kernel(xq_ref, sxq_ref, w_ref, s_ref, out_ref):
                kern(xq_ref, sxq_ref, w_ref, s_ref, out_ref)

            x_specs = [
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ]
        else:
            kernel = make_kernel(variant)
            x_specs = [
                pl.BlockSpec((t, 2 * k_half), lambda j: (0, 0)),
                pl.BlockSpec((t, 2 * k_half // GS), lambda j: (0, 0)),
            ]
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t, n), jnp.bfloat16),
            grid=(nt,),
            in_specs=x_specs + [
                pl.BlockSpec((1, 1, k_half, TN), lambda j: (0, j, 0, 0)),
                pl.BlockSpec((1, 2 * k_half // GS, TN), lambda j: (0, 0, j)),
            ],
            out_specs=pl.BlockSpec((t, TN), lambda j: (0, j)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(xq, sxq, wl[None], sl[None])
        return carry + out[:, :1].astype(jnp.float32), None

    def it(i, acc0):
        # acc0 feeds the carry so iterations can't be collapsed/reordered
        acc, _ = jax.lax.scan(layer, acc0 * 1e-20, (w, s))
        return acc

    return jax.lax.fori_loop(
        0, n_iter, it, jnp.zeros((t, 1), jnp.float32)
    )


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    xq = jnp.asarray(rng.integers(-127, 127, (T, K)), jnp.int8)
    sxq = jnp.asarray(
        rng.standard_normal((T, K // GS)) * 100, jnp.float32
    )
    w = jnp.asarray(rng.integers(-128, 127, (L, N // TN, K // 2, TN)), jnp.int8)
    s = jnp.asarray(
        np.abs(rng.standard_normal((L, K // GS, N))) * 0.01, jnp.float32
    )
    wbytes = w.size
    variants = sys.argv[1:] or ["base", "bf16acc", "noscale", "bigdot", "batched"]
    for v in variants:
        try:
            # device-fetch forces real completion (block_until_ready lies
            # through the axon tunnel); difference two iteration counts to
            # cancel the RTT + fixed overhead
            np.asarray(run(xq, sxq, w, s, v, 2))
            np.asarray(run(xq, sxq, w, s, v, 22))
            t0 = time.perf_counter()
            np.asarray(run(xq, sxq, w, s, v, 2))
            t1 = time.perf_counter()
            np.asarray(run(xq, sxq, w, s, v, 22))
            t2 = time.perf_counter()
            dt = ((t2 - t1) - (t1 - t0)) / 20
            print(
                f"{v:10s} {dt*1e3:8.2f} ms  {wbytes/dt/1e9:7.1f} GB/s",
                flush=True,
            )
        except Exception as e:
            print(f"{v:10s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
