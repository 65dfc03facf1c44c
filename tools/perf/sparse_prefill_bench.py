"""Long-context prefill: dense vs vertical-slash sparse (serving path).

Measures the flagship-geometry attention cost of one long prefill chunk
with the dense ragged path vs ops/sparse_attention.sparse_prefill_attention
at serving sparsity (nnz_v=128, nnz_s=64, budget=NKB/4). Device times via
the profiler (wall clocks lie through the axon tunnel)."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from trace_time import device_time  # noqa: E402
from vllm_metax_tpu.ops.sparse_attention import (  # noqa: E402
    sparse_prefill_attention,
    sparse_prefill_attention_pallas,
)


def run(ctx, ql=1024, hq=8, hkv=2, d=128, budget_frac=0.25, n=8):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (ql, hq, d), jnp.bfloat16)
    k = jax.random.normal(key, (ctx, hkv, d), jnp.bfloat16)
    v = jax.random.normal(key, (ctx, hkv, d), jnp.bfloat16)
    scale = d**-0.5
    nkb = ctx // 64
    budget = max(4, int(nkb * budget_frac))

    @functools.partial(jax.jit, static_argnames=("nit", "mode"))
    def loop(q, k, v, nit, mode):
        def dense_once(q):
            g = hq // hkv
            qf = q.astype(jnp.float32).reshape(ql, hkv, g, d)
            s = jnp.einsum(
                "qhgd,chd->qhgc", qf, k.astype(jnp.float32)
            ) * scale
            pos_q = jnp.arange(ql) + (ctx - ql)
            causal = pos_q[:, None] >= jnp.arange(ctx)[None, :]
            s = jnp.where(causal[:, None, None, :], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum(
                "qhgc,chd->qhgd", p, v.astype(jnp.float32)
            ).reshape(ql, hq, d).astype(q.dtype)

        def it(i, acc):
            qq = q + acc[0, 0, 0].astype(q.dtype) * 0
            if mode == "sparse":
                return sparse_prefill_attention(
                    qq, k, v, scale, nnz_v=128, nnz_s=64,
                    block_budget=budget,
                )
            if mode == "pallas":
                return sparse_prefill_attention_pallas(
                    qq, k, v, scale, nnz_v=128, nnz_s=64,
                    block_budget=max(2, budget // 2),  # 64→128-wide blocks
                )
            return dense_once(qq)

        return jax.lax.fori_loop(0, nit, it, jnp.zeros((ql, hq, d), q.dtype))

    for mode in ("dense", "sparse", "pallas"):
        loop(q, k, v, n, mode).block_until_ready()
        t = device_time(
            lambda m=mode: loop(q, k, v, n, m).block_until_ready()
        )
        frac = f"(budget {budget}/{nkb} blocks)" if mode == "sparse" else ""
        print(f"ctx={ctx:6d} {mode:6s}: {t / n:8.2f} ms/chunk {frac}")


if __name__ == "__main__":
    # per-head cost scales linearly in heads; 8 q-heads keep the DENSE
    # baseline's (QL, HKV, G, CTX) f32 score tensor inside HBM
    for ctx in (8192, 16384, 32768):
        run(ctx)
