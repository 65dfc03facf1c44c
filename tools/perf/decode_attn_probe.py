"""Microbench the request-batched decode attention kernel at flagship
shapes (128 reqs, int8 fused [K|V] pool, ctx~256, HKV=8, G=4, D=128).

In-situ cost measured by profile_step: ~227us/layer-call at NR=8. HBM SOL
for the KV read is ~80us -> 2.8x gap. This probe sweeps the knobs
standalone to find what the kernel is actually bound by:
  - NR (requests per grid step): fixed-cost amortization vs O(NR^2) VPU
    softmax waste
  - deferred current-token row on/off
  - quantized scales on/off (DMA descriptor count: 3/page vs 1/page)

Usage: METAX_TPU_DECODE_NR=8 python decode_attn_probe.py [ctx]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from trace_time import device_time  # noqa: E402
from vllm_metax_tpu.ops.kv_cache import KVCache  # noqa: E402
from vllm_metax_tpu.ops.pallas.decode_attention import (  # noqa: E402
    paged_decode_attention_pallas,
)


from typing import NamedTuple


class MD(NamedTuple):
    seq_lens: object
    block_tables: object


def build(ctx, quantized=True, fused=True):
    R, HKV, G, D, BS = int(os.getenv("PROBE_R", "128")), 8, 4, 128, 128
    NB = 1280
    rng = np.random.default_rng(0)
    maxb = 4
    dtype = jnp.int8 if quantized else jnp.bfloat16
    td = 2 * D if fused else D
    k = jnp.asarray(
        rng.integers(-100, 100, (NB, HKV, BS, td)), dtype
    ) if quantized else jnp.asarray(
        rng.standard_normal((NB, HKV, BS, td)), dtype
    )
    v = jnp.zeros((NB, HKV, BS, 0), dtype) if fused else k
    ks = jnp.asarray(rng.random((NB, HKV, BS)) + 0.5, jnp.float32)
    cache = KVCache(k, v, ks, ks) if quantized else KVCache(k, v)
    # distinct pages per request
    bt = rng.permutation(NB - 8)[: R * maxb].reshape(R, maxb).astype(np.int32)
    seq_lens = np.full(R, ctx, np.int32)
    q = jnp.asarray(rng.standard_normal((R, HKV * G, D)), jnp.bfloat16)
    kcur = jnp.asarray(rng.standard_normal((R, HKV, D)), jnp.bfloat16)
    vcur = jnp.asarray(rng.standard_normal((R, HKV, D)), jnp.bfloat16)
    md = MD(jnp.asarray(seq_lens), jnp.asarray(bt))
    return q, cache, md, kcur, vcur


@functools.partial(jax.jit, static_argnames=("n", "deferred", "noscale"))
def loop(q, cache, seq_lens, bt, kcur, vcur, n, deferred, noscale=False):
    md = MD(seq_lens, bt)

    def it(i, acc):
        out = paged_decode_attention_pallas(
            q + acc[0, 0, 0].astype(q.dtype) * 0, cache, md, 0.088,
            k_cur=kcur if deferred else None,
            v_cur=vcur if deferred else None,
            _probe_skip_scale_dma=noscale,
        )
        return out

    return jax.lax.fori_loop(0, n, it, jnp.zeros_like(q))


def run(name, ctx, quantized=True, fused=True, deferred=True, n=50,
        noscale=False):
    q, cache, md, kcur, vcur = build(ctx, quantized, fused)
    out = loop(q, cache, md.seq_lens, md.block_tables, kcur, vcur, n,
               deferred, noscale)
    out.block_until_ready()

    def thunk():
        loop(q, cache, md.seq_lens, md.block_tables, kcur, vcur, n,
             deferred, noscale).block_until_ready()

    total, ops = device_time(thunk, by_op=True)
    per = total / n
    print(f"{name:32s} {per * 1e3:8.1f} us/call  "
          f"{ {k: round(v / n * 1e3, 1) for k, v in list(ops.items())[:3]} }")


if __name__ == "__main__":
    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nr = os.getenv("METAX_TPU_DECODE_NR", "8")
    run(f"NR={nr} ctx={ctx} int8 deferred", ctx)
    run(f"NR={nr} ctx={ctx} int8 eager", ctx, deferred=False)
    run(f"NR={nr} ctx={ctx} bf16 deferred", ctx, quantized=False)
    # numerically WRONG — quantifies the scale-DMA descriptor cost only
    run(f"NR={nr} ctx={ctx} int8 NOSCALE(probe)", ctx, noscale=True)
