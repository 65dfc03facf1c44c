"""Measure TPU scatter cost vs row width / sortedness for the KV commit.

The decode-step KV commit is a row scatter; STATUS records ~70ns/row
regardless of width. If that holds, halving the row count by widening rows
(fused-KV 512B rows, token-major 2KB rows) is the whole game. Forms:

  rows256   — today's commit: L*T*H rows of 256B per k/v (two scatters)
  rows256s  — same but rows pre-sorted + indices_are_sorted=True
  rows512   — fused-KV layout: L*T*H rows of 512B, ONE scatter
  rows2048  — token-major layout: L*T rows of 2KB per k/v (two scatters)

All forms write the same 16.8MB. Times via in-jit iteration differencing.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

L, T, H, BS, D = 32, 128, 8, 16, 128
NB_LAYER = 300  # blocks per layer
rng = np.random.default_rng(0)


def make_rows(width_elems, n_rows_per_lt, sort):
    """Flat row ids: each (layer, token) writes n_rows_per_lt rows."""
    blocks = rng.permutation(NB_LAYER)[:T]  # distinct blocks per token
    offs = rng.integers(0, BS, T)
    rows = []
    for l in range(L):
        for t in range(T):
            base = ((l * NB_LAYER + blocks[t]) * H * BS + offs[t])
            for j in range(n_rows_per_lt):
                rows.append(base * 1 + j * BS)  # head-strided like real rows
    rows = np.asarray(rows, np.int32)
    if sort:
        rows = np.sort(rows)
    return jnp.asarray(rows)


@functools.partial(jax.jit, static_argnames=("sorted_", "n_iter"))
def scat(pool, rows, vals, sorted_, n_iter):
    def it(i, p):
        return p.at[rows].set(
            vals + i.astype(vals.dtype),
            mode="drop",
            unique_indices=True,
            indices_are_sorted=sorted_,
        )

    return jax.lax.fori_loop(0, n_iter, it, pool)


def bench(name, n_rows, width, sorted_, n_scat):
    total = L * NB_LAYER * H * BS
    pool = jnp.zeros((total, width), jnp.bfloat16)
    rows = make_rows(width, n_rows // (L * T), sorted_)
    vals = jnp.asarray(
        rng.standard_normal((rows.shape[0], width)), jnp.bfloat16
    )

    def run(n_iter):
        p = pool
        for _ in range(n_scat):
            p = scat(p, rows, vals, sorted_, n_iter)
        return np.asarray(p[:1, :1])

    run(2); run(22)
    t0 = time.perf_counter(); run(2)
    t1 = time.perf_counter(); run(22)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 20
    tot_rows = rows.shape[0] * n_scat
    print(
        f"{name:10s} {dt*1e3:7.2f} ms  {dt/tot_rows*1e9:6.1f} ns/row "
        f"({tot_rows} rows x {width*2}B)",
        flush=True,
    )


@functools.partial(jax.jit, static_argnames=("n_iter",))
def scat_sortperm(pool, blocks, offs, k_staged, n_iter):
    """Full in-jit composite: argsort tokens by block, permute the staged
    (L, T, H, D) values, scatter with indices_are_sorted=True."""
    def it(i, p):
        perm = jnp.argsort(blocks)
        b_s, o_s = blocks[perm], offs[perm]
        rows = (
            ((jnp.arange(L, dtype=jnp.int32)[:, None, None] * NB_LAYER
              + b_s[None, :, None]) * H
             + jnp.arange(H, dtype=jnp.int32)[None, None, :]) * BS
            + o_s[None, :, None]
        ).reshape(-1)
        vals = (k_staged[:, perm] + i.astype(k_staged.dtype)).reshape(-1, D)
        return p.at[rows].set(
            vals, mode="drop", unique_indices=True, indices_are_sorted=True)
    return jax.lax.fori_loop(0, n_iter, it, pool)


def bench_sortperm():
    total = L * NB_LAYER * H * BS
    pool = jnp.zeros((total, D), jnp.bfloat16)
    blocks = jnp.asarray(rng.permutation(NB_LAYER)[:T], jnp.int32)
    offs = jnp.asarray(rng.integers(0, BS, T), jnp.int32)
    k_staged = jnp.asarray(
        rng.standard_normal((L, T, H, D)), jnp.bfloat16)
    def run(n_iter):
        p = pool
        for _ in range(2):  # k and v
            p = scat_sortperm(p, blocks, offs, k_staged, n_iter)
        return np.asarray(p[:1, :1])
    run(2); run(22)
    t0 = time.perf_counter(); run(2)
    t1 = time.perf_counter(); run(22)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 20
    print(f"{'sortperm':10s} {dt*1e3:7.2f} ms  (argsort+permute+sorted scatter, k+v)",
          flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    bench_sortperm()
    bench("rows256", L * T * H, D, False, 2)
    bench("rows256s", L * T * H, D, True, 2)
    bench("rows512", L * T * H, 2 * D, False, 1)
    bench("rows2048", L * T, 8 * D * 2 // 2, False, 2)


if __name__ == "__main__":
    main()
