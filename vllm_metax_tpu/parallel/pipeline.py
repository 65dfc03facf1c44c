"""GPipe-style SPMD pipeline parallelism inside one jitted step.

TPU-native analog of the reference's engine-level pipeline parallelism (PP
column of /root/reference/docs/models/supported_models.md; vLLM v1 keeps
pp_size scheduler batches in flight across process-separated stage workers).
On TPU the idiomatic form is intra-program pipelining under shard_map
(the "spmd_pipeline" pattern of the scaling book / praxis):

- the stacked (L, ...) layer banks and the flat KV page pool are sharded over
  mesh axis "pp" (stage s holds layers [s*L/S, (s+1)*L/S));
- one jitted step runs MB + S - 1 pipeline ticks; at tick t, stage s runs its
  local layer stack on microbatch (t - s), so microbatches flow through
  stages with at most S-1 idle ticks per stage (efficiency MB/(MB+S-1));
- activations (hidden, residual) move stage→stage with lax.ppermute over the
  ICI/DCN "pp" axis — no host involvement;
- every stage computes the (cheap, replicated) embedding; the last stage's
  outputs are broadcast with a masked psum so all ranks can compute logits
  and sample identically (no separate driver rank).

Invalid (warmup/drain) ticks run the layer stack on don't-care data; their KV
writes are dropped by pointing slot_mapping at an out-of-range sentinel (the
same mode="drop" scatter that drops pad tokens).

Microbatching (MB > 1) requires a pure-decode step (row i of the token batch
IS request i — md.decode_only); ragged prefill steps run MB = 1, which is
plain sequential staging.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_metax_tpu.ops.attention import AttentionMetadata

PP_AXIS = "pp"

# out-of-range slot → scatter drops the write. Python int, not jnp.int32:
# module-level device constants get hoisted as hidden executable args.
_SENTINEL = 2**30


def _gate_md(md: AttentionMetadata, valid) -> AttentionMetadata:
    """Drop KV writes on invalid pipeline ticks."""
    import dataclasses

    return dataclasses.replace(
        md, slot_mapping=jnp.where(valid, md.slot_mapping, _SENTINEL)
    )


def _slice_md(md: AttentionMetadata, j, rm: int, valid) -> AttentionMetadata:
    """Microbatch j's row window [j*rm, (j+1)*rm) of a pure-decode step
    (row i = request i, so token rows and request rows slice together)."""
    import dataclasses

    def rows(a):
        return jax.lax.dynamic_slice_in_dim(a, j * rm, rm, axis=0)

    return dataclasses.replace(
        md,
        slot_mapping=jnp.where(valid, rows(md.slot_mapping), _SENTINEL),
        block_tables=rows(md.block_tables),
        seq_lens=rows(md.seq_lens),
        query_start_loc=jnp.arange(rm + 1, dtype=jnp.int32),
        req_idx=jnp.arange(rm, dtype=jnp.int32),
        positions=rows(md.positions),
        num_seqs=jnp.asarray(rm, jnp.int32),
    )


def pipeline_forward(
    model,
    params: dict,
    input_ids: jnp.ndarray,  # (T,)
    kv_cache,
    md: AttentionMetadata,
    cfg,
    *,
    num_stages: int,
    microbatches: int = 1,
    num_q_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    axis_name: Optional[str] = None,
    ep_axis_name: Optional[str] = None,
):
    """Drop-in replacement for model.forward under a mesh with a "pp" axis.
    Requires the model module to expose embed / run_layers / finalize.
    Returns (hidden (T, E), new kv_cache)."""
    s = jax.lax.axis_index(PP_AXIS)
    t = input_ids.shape[0]
    mb = microbatches
    if t % mb:
        raise ValueError(f"microbatches={mb} must divide T={t}")
    tm = t // mb
    if mb > 1 and not md.decode_only:
        raise ValueError("microbatched PP needs a pure-decode step")
    n_local = cfg.num_hidden_layers // num_stages
    perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    import inspect

    if "md" in inspect.signature(model.embed).parameters:
        # learned-position models (gpt2/opt) need md.positions in embed
        h_all = model.embed(params, input_ids, cfg, md=md)
    else:
        h_all = model.embed(params, input_ids, cfg)  # (T, E) on every stage
    e = h_all.shape[-1]

    def tick(carry, tstep):
        buf_h, buf_r, kv, out_h, out_r = carry
        mbi = tstep - s
        valid = (mbi >= 0) & (mbi < mb)
        mbc = jnp.clip(mbi, 0, mb - 1)
        # stage 0 injects microbatch mbc; later stages consume the ppermuted
        # activation from the previous stage
        x_h = jnp.where(
            s == 0,
            jax.lax.dynamic_slice_in_dim(h_all, mbc * tm, tm, axis=0),
            buf_h,
        )
        x_r = jnp.where(s == 0, jnp.zeros((tm, e), buf_r.dtype), buf_r)
        md_mb = _slice_md(md, mbc, tm, valid) if mb > 1 else _gate_md(md, valid)
        y_h, y_r, kv = model.run_layers(
            params, x_h, x_r, kv, md_mb, cfg,
            num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
            axis_name=axis_name, ep_axis_name=ep_axis_name,
            num_layers=n_local,
            # global index of this stage's first layer (Gemma-2 window
            # parity and other global-position layer schedules)
            layer_offset=s * n_local,
        )
        # collect: on the last stage mbc only ever clamps DOWN (mbi < mb
        # always there), so a valid write is never overwritten by drain ticks
        out_h = jax.lax.dynamic_update_slice_in_dim(out_h, y_h, mbc * tm, 0)
        out_r = jax.lax.dynamic_update_slice_in_dim(out_r, y_r, mbc * tm, 0)
        buf_h = jax.lax.ppermute(y_h, PP_AXIS, perm)
        buf_r = jax.lax.ppermute(y_r, PP_AXIS, perm)
        return (buf_h, buf_r, kv, out_h, out_r), None

    zeros_tm = jnp.zeros((tm, e), h_all.dtype)
    zeros_t = jnp.zeros((t, e), h_all.dtype)
    (_, _, kv_cache, out_h, out_r), _ = jax.lax.scan(
        tick,
        (zeros_tm, zeros_tm, kv_cache, zeros_t, zeros_t),
        jnp.arange(mb + num_stages - 1, dtype=jnp.int32),
    )

    # broadcast the last stage's result to every stage (masked psum)
    last = s == num_stages - 1
    out_h = jax.lax.psum(jnp.where(last, out_h, 0), PP_AXIS)
    out_r = jax.lax.psum(jnp.where(last, out_r, 0), PP_AXIS)
    return model.finalize(out_h, out_r, cfg), kv_cache


def pp_param_specs(specs: dict) -> dict:
    """Prepend the "pp" mesh axis to the leading (stacked-L) dim of every
    layer-bank leaf spec. Non-layer params (embed, final_norm, lm_head,
    rope_cache) stay replicated over pp."""
    from jax.sharding import PartitionSpec as P

    def add_pp(sp):
        if not isinstance(sp, P):
            return sp
        rest = tuple(sp)[1:]
        return P(PP_AXIS, *rest)

    out = dict(specs)
    out["layers"] = jax.tree_util.tree_map(
        add_pp, specs["layers"], is_leaf=lambda x: isinstance(x, P)
    )
    return out


def pick_microbatches(rb: int, pp_size: int, min_rows: int = 8) -> int:
    """Largest MB ≤ 2*pp that divides rb with ≥ min_rows rows per microbatch
    (the request-batched decode kernel needs multiples of 8)."""
    mb = min(2 * pp_size, rb // min_rows)
    while mb > 1 and rb % mb:
        mb -= 1
    return max(1, mb)
