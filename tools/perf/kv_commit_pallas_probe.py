"""Probe: Pallas DMA-based KV commit vs the XLA row scatter, at the real
flagship pool shapes (fused [K|V] int8 pool, 32 layers x 128 reqs x 8 heads,
BS=128, 2D=256 lanes).

The rows-form scatter costs ~70ns/ROW and the commit has L*T*H = 32768 rows
-> ~2.5ms/step measured in profile_step. A Pallas kernel can instead issue
ONE DMA per (layer, token) covering all H heads (4096 descriptors of 2KB),
betting that DMA issue+completion is far cheaper than scatter row overhead.

Times via in-jit iteration differencing (wall over many iters amortizes the
axon tunnel RTT).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, T, H, BS, TD = 32, 128, 8, 128, 256  # TD = fused 2D lanes
NB_LAYER = 320
NB = L * NB_LAYER
rng = np.random.default_rng(0)


def make_slots():
    blocks = rng.permutation(NB_LAYER)[:T]
    offs = rng.integers(0, BS, T)
    return (blocks * BS + offs).astype(np.int32)  # layer-local token slots


SLOTS = make_slots()


# ---------------------------------------------------------------- scatter
@functools.partial(jax.jit, static_argnames=("n_iter",), donate_argnums=(0,))
def commit_scatter(pool, rows, vals, n_iter):
    def it(i, p):
        flat = p.reshape(NB * H * BS, TD)
        flat = flat.at[rows].set(
            vals + i.astype(vals.dtype),  # iteration-dependent: no hoisting
            mode="drop", unique_indices=True, indices_are_sorted=False,
        )
        return flat.reshape(p.shape)

    return jax.lax.fori_loop(0, n_iter, it, pool)


# ---------------------------------------------------------------- pallas
def _commit_kernel(pages_ref, offs_ref, vals_hbm, pool_hbm, out_ref, sem):
    # grid (L,): issue T DMAs, one per token, each (H, TD) into the
    # lane-flattened (NB, H, BS*TD) pool view at lane offset off*TD
    l = pl.program_id(0)
    for t in range(T):  # static unroll
        page = pages_ref[l * T + t]

        @pl.when(page < NB)
        def _(t=t, page=page):
            off = offs_ref[t]
            pltpu.make_async_copy(
                vals_hbm.at[l, t],  # (H, TD)
                pool_hbm.at[page, :, pl.ds(off * TD, TD)],
                sem.at[t % 16],
            ).start()
    # waits: byte-counted on 16 rotating sems; re-issue the wait descriptors
    for t in range(T):
        page = pages_ref[l * T + t]

        @pl.when(page < NB)
        def _(t=t, page=page):
            off = offs_ref[t]
            pltpu.make_async_copy(
                vals_hbm.at[l, t],
                pool_hbm.at[page, :, pl.ds(off * TD, TD)],
                sem.at[t % 16],
            ).wait()


# one DMA per TOKEN covering every layer: the layer-local slot is shared
# across layers, so the L target pages sit at a REGULAR stride NB_LAYER in
# the pool — a (L, H, TD) strided DMA per token, 128 descriptors per step
def _commit_kernel_tok(blocks_ref, offs_ref, vals_hbm, pool_hbm, out_ref,
                       sem):
    for t in range(T):  # static unroll
        b = blocks_ref[t]

        @pl.when(b < NB_LAYER)
        def _(t=t, b=b):
            off = offs_ref[t]
            pltpu.make_async_copy(
                vals_hbm.at[t],  # (L, H, TD)
                pool_hbm.at[:, b, :, pl.ds(off * TD, TD)],
                sem.at[t % 16],
            ).start()
    for t in range(T):
        b = blocks_ref[t]

        @pl.when(b < NB_LAYER)
        def _(t=t, b=b):
            off = offs_ref[t]
            pltpu.make_async_copy(
                vals_hbm.at[t],
                pool_hbm.at[:, b, :, pl.ds(off * TD, TD)],
                sem.at[t % 16],
            ).wait()


@functools.partial(jax.jit, static_argnames=("n_iter",), donate_argnums=(0,))
def commit_pallas_tok(pool, blocks, offs, vals_t, n_iter):
    call = pl.pallas_call(
        _commit_kernel_tok,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
        ),
        out_shape=jax.ShapeDtypeStruct((L, NB_LAYER, H, BS * TD), pool.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    def it(i, p):
        return call(
            blocks, offs, vals_t + i.astype(vals_t.dtype),
            p.reshape(L, NB_LAYER, H, BS * TD),
        ).reshape(p.shape)

    return jax.lax.fori_loop(0, n_iter, it, pool)


@functools.partial(jax.jit, static_argnames=("n_iter",), donate_argnums=(0,))
def commit_pallas(pool, pages, offs, vals, n_iter):
    call = pl.pallas_call(
        _commit_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(L,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
        ),
        out_shape=jax.ShapeDtypeStruct((NB, H, BS * TD), pool.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    def it(i, p):
        return call(pages, offs, vals, p.reshape(NB, H, BS * TD)).reshape(p.shape)

    return jax.lax.fori_loop(0, n_iter, it, pool)


def bench(name, fn, pool, *args, n_iter=30):
    from trace_time import device_time

    pool = fn(pool, *args, n_iter=n_iter)  # compile + warm (same shape)
    pool.block_until_ready()
    holder = [pool]

    def thunk():
        holder[0] = fn(holder[0], *args, n_iter=n_iter)
        holder[0].block_until_ready()

    total, ops = device_time(thunk, by_op=True)
    per = total / n_iter
    top = {k: round(v / n_iter, 3) for k, v in list(ops.items())[:4]}
    print(f"{name:24s} {per:8.3f} ms/commit   {top}")
    return holder[0]


def main():
    print(f"pool s8[{NB},{H},{BS},{TD}] = {NB * H * BS * TD / 1e9:.2f} GB")
    pool = jnp.zeros((NB, H, BS, TD), jnp.int8)
    vals = jnp.asarray(
        rng.integers(-127, 127, (L, T, H, TD)), jnp.int8
    )
    # scatter rows (L*T*H,)
    blocks = SLOTS // BS
    offs = SLOTS % BS
    rows = (
        (blocks[None, :, None] + np.arange(L)[:, None, None] * NB_LAYER) * H
        + np.arange(H)[None, None, :]
    ) * BS + offs[None, :, None]
    rows = jnp.asarray(rows.reshape(-1).astype(np.int32))
    pool = bench(
        "scatter_rows", commit_scatter, pool, rows,
        vals.reshape(L * T * H, TD),
    )

    pages = jnp.asarray(
        (blocks[None, :] + np.arange(L)[:, None] * NB_LAYER)
        .reshape(-1)
        .astype(np.int32)
    )
    offs_j = jnp.asarray(offs.astype(np.int32))
    pool2 = jnp.zeros((NB, H, BS, TD), jnp.int8)
    pool2 = bench("pallas_dma", commit_pallas, pool2, pages, offs_j, vals)

    pool3 = jnp.zeros((NB, H, BS, TD), jnp.int8)
    vals_t = vals.transpose(1, 0, 2, 3)  # (T, L, H, TD)
    pool3 = bench(
        "pallas_tok_dma", commit_pallas_tok, pool3,
        jnp.asarray(blocks.astype(np.int32)), offs_j,
        vals_t.copy(),
    )

    # correctness: all pools must hold the same rows (up to the additive
    # iteration constant — compare pool3 vs a scatter with the same final i)
    a = np.asarray(pool.reshape(NB * H * BS, TD)[np.asarray(rows)])
    b = np.asarray(pool2.reshape(NB * H * BS, TD)[np.asarray(rows)])
    c = np.asarray(pool3.reshape(NB * H * BS, TD)[np.asarray(rows)])
    print("scatter vs tok match:", np.array_equal(a, c))
    print("plain pallas rows present:", b.any())


if __name__ == "__main__":
    main()
