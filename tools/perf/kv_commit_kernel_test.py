"""Correctness + perf check of the slab-bounce commit kernel on TPU."""

import numpy as np
import jax
import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from trace_time import device_time  # noqa: E402

from vllm_metax_tpu.ops.pallas.kv_commit import commit_token_rows_pallas


def check(L, T, H, BS, TD, NBL, quantized, seed=0):
    rng = np.random.default_rng(seed)
    NB = L * NBL
    pool = jnp.asarray(rng.integers(-5, 5, (NB, H, BS, TD)), jnp.int8)
    vals = jnp.asarray(rng.integers(-127, 127, (L, T, H, TD)), jnp.int8)
    blocks = rng.permutation(NBL)[:T]
    offs = rng.integers(0, BS, T)
    slots = (blocks * BS + offs).astype(np.int32)
    slots[min(3, T - 1)] = NBL * BS + 5  # pad sentinel
    if quantized:
        ks = jnp.asarray(rng.standard_normal((NB, H, BS)), jnp.float32)
        vs = jnp.asarray(rng.standard_normal((NB, H, BS)), jnp.float32)
        news = jnp.asarray(rng.standard_normal((T, 2, L, H)), jnp.float32)
    else:
        ks = vs = news = None
    p0, k0, v0 = (np.asarray(pool),
                  None if ks is None else np.asarray(ks),
                  None if vs is None else np.asarray(vs))
    pools = (ks, vs) if quantized else ()
    out, oscales = commit_token_rows_pallas(
        pool, vals, jnp.asarray(slots), pools, news, NBL
    )
    oks, ovs = oscales if quantized else (None, None)
    out = np.asarray(out).reshape(L, NBL, H, BS, TD)
    ref = p0.reshape(L, NBL, H, BS, TD).copy()
    v = np.asarray(vals)
    if quantized:
        refk = k0.reshape(L, NBL, H, BS).copy()
        refv = v0.reshape(L, NBL, H, BS).copy()
        ns = np.asarray(news)
    for t in range(T):
        if slots[t] >= NBL * BS:
            continue
        for l in range(L):
            ref[l, blocks[t], :, offs[t], :] = v[l, t]
            if quantized:
                refk[l, blocks[t], :, offs[t]] = ns[t, 0, l]
                refv[l, blocks[t], :, offs[t]] = ns[t, 1, l]
    ok = np.array_equal(out, ref)
    if quantized:
        ok &= np.array_equal(np.asarray(oks).reshape(refk.shape), refk)
        ok &= np.array_equal(np.asarray(ovs).reshape(refv.shape), refv)
    print(f"L{L} T{T} H{H} BS{BS} TD{TD} quant={quantized}: "
          f"{'OK' if ok else 'MISMATCH'}")
    return ok


def perf():
    L, T, H, BS, TD, NBL = 32, 128, 8, 128, 256, 320
    rng = np.random.default_rng(0)
    NB = L * NBL
    pool = jnp.zeros((NB, H, BS, TD), jnp.int8)
    ks = jnp.ones((NB, H, BS), jnp.float32)
    vs = jnp.ones((NB, H, BS), jnp.float32)
    vals = jnp.asarray(rng.integers(-127, 127, (L, T, H, TD)), jnp.int8)
    news = jnp.asarray(rng.standard_normal((T, 2, L, H)), jnp.float32)
    blocks = rng.permutation(NBL)[:T]
    offs = rng.integers(0, BS, T)
    slots = jnp.asarray((blocks * BS + offs).astype(np.int32))

    import functools

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0, 1, 2))
    def loop(pool, ks, vs, n):
        def it(i, c):
            p, a, b = c
            p2, (a2, b2) = commit_token_rows_pallas(
                p, vals, slots, (a, b), news, NBL
            )
            return (p2, a2, b2)

        return jax.lax.fori_loop(0, n, it, (pool, ks, vs))

    n = 30
    pool, ks, vs = loop(pool, ks, vs, n)
    jax.block_until_ready((pool, ks, vs))
    holder = [(pool, ks, vs)]

    def thunk():
        holder[0] = loop(*holder[0], n)
        jax.block_until_ready(holder[0])

    total, ops = device_time(thunk, by_op=True)
    print(f"commit: {total / n:.3f} ms/step  "
          f"{ {k: round(val / n, 3) for k, val in list(ops.items())[:5]} }")


if __name__ == "__main__":
    assert check(4, 16, 8, 128, 256, 32, False)
    assert check(4, 16, 8, 128, 256, 32, True)
    assert check(2, 12, 8, 128, 128, 16, True)  # non-TB-multiple T
    perf()
