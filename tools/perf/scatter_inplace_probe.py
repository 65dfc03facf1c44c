"""Which scatter forms stay IN-PLACE on the engine's real pool shape?

The engine commits K/V with a row scatter on a bitcast view of the
(NB, H, BS, D) pool inside a while-loop carry. scatter_probe.py measures
forms on a flat pool and says sorted is 2x faster per row — but in the
engine both the cond'd and the plain sorted forms lost pool aliasing and
cost ~9.8ms (full copy) instead. This probe replicates the engine context
(4D pool, reshape around the scatter, fori_loop carry, donated jit) and
times each form.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

L, T, H, BS, D = 32, 128, 8, 32, 128
NBL = 1280  # blocks per layer
NB = L * NBL
rng = np.random.default_rng(0)


def rows_for(slots, sort):
    if sort:
        slots = np.sort(slots)
    block, off = slots // BS, slots % BS
    rows0 = (block[:, None] * H + np.arange(H)[None, :]) * BS + off[:, None]
    rows = rows0[None] + np.arange(L)[:, None, None] * (NBL * H * BS)
    return jnp.asarray(rows.reshape(-1), np.int32)


@functools.partial(
    jax.jit, static_argnames=("sorted_", "mode", "n_iter"), donate_argnums=(0,)
)
def run(pool, rows, vals, sorted_, mode, n_iter):
    def it(i, p):
        flat = p.reshape(NB * H * BS, D)
        flat = flat.at[rows].set(
            vals + i.astype(vals.dtype),
            mode=mode,
            unique_indices=True,
            indices_are_sorted=sorted_,
        )
        return flat.reshape(p.shape)

    return jax.lax.fori_loop(0, n_iter, it, pool)


def bench(name, sort, mode):
    slots = rng.permutation(NBL - 8)[:T] * BS + rng.integers(0, BS, T)
    rows = rows_for(slots, sort)
    vals = jnp.asarray(rng.standard_normal((L * T * H, D)), jnp.bfloat16)

    def go(n_iter):
        pool = jnp.zeros((NB, H, BS, D), jnp.bfloat16)
        t0 = time.perf_counter()
        run(pool, rows, vals, sort, mode, n_iter).block_until_ready()
        return time.perf_counter() - t0

    go(2)
    t4, t20 = go(10), go(90)
    per = (t20 - t4) / 80 * 1e3
    print(f"{name:28s} {per:7.3f} ms/scatter  ({per * 1e6 / rows.shape[0]:.1f} ns/row)")


def main():
    print("device:", jax.devices()[0].device_kind, " rows:", L * T * H)
    bench("unsorted drop", False, "drop")
    bench("sorted   drop", True, "drop")
    bench("unsorted promise_in_bounds", False, "promise_in_bounds")
    bench("sorted   promise_in_bounds", True, "promise_in_bounds")


if __name__ == "__main__":
    main()
