"""Tree speculative decoding: ancestor-masked verify + path compaction.

Ref analog: vllm_metax/v1/attention/backends/tree_attn.py (tree verify
masks) + the spec-token-tree proposer flow. Point-mass tree drafts keep
verification exact: greedy output with a draft TREE must equal spec OFF.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_metax_tpu.config import (
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ModelConfig,
    SchedulerConfig,
    SpeculativeConfig,
)
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.sample.params import SamplingParams


def test_tree_mask_matches_manual_reference(rng):
    """XLA attention with tree_bits == manual per-row masked attention."""
    from tests.test_pallas_attention import BS, D, _make_case
    from vllm_metax_tpu.ops.attention import ragged_paged_attention_xla

    # one request: ctx=5 committed + 5 scheduled rows (root + 4 tree nodes)
    # tree: root -> n0 -> n2 ; root -> n1 -> n3   (rows 1..4 = nodes 0..3)
    q, kv, md = _make_case(rng, seq_lens_ctx=[5], qlens=[5])
    parents = [-1, -1, 0, 1]
    bits = np.zeros(5, np.uint32)
    bits[0] = 1
    depth = {}
    for j, par in enumerate(parents):
        prow = 0 if par < 0 else par + 1
        depth[j] = 0 if par < 0 else depth[par] + 1
        bits[j + 1] = bits[prow] | (1 << (j + 1))
    import dataclasses

    # depth-based positions (siblings share a position)
    pos = np.asarray([5, 6, 6, 7, 7], np.int32)
    md = dataclasses.replace(
        md,
        tree_bits=jnp.asarray(bits),
        positions=jnp.asarray(pos),
    )
    out = np.asarray(ragged_paged_attention_xla(q, kv, md, 0.125))

    # manual reference over gathered K/V
    from vllm_metax_tpu.ops.kv_cache import gather_kv_for_requests

    k_all, v_all = gather_kv_for_requests(kv, md.block_tables, jnp.float32)
    k_all, v_all = np.asarray(k_all)[0], np.asarray(v_all)[0]  # (CTX, H, D)
    qn = np.asarray(q, np.float32)
    hq, hkv = q.shape[1], kv.num_kv_heads
    g = hq // hkv
    for row in range(5):
        allowed = list(range(5))  # committed ctx
        allowed += [5 + j for j in range(5) if (int(bits[row]) >> j) & 1]
        for h in range(hq):
            s = (qn[row, h] @ k_all[allowed, h // g].T) * 0.125
            p = np.exp(s - s.max())
            p /= p.sum()
            ref = p @ v_all[allowed, h // g]
            np.testing.assert_allclose(
                out[row, h], ref, rtol=1e-4, atol=1e-4, err_msg=f"row {row}"
            )


def test_move_kv_slots_all_layers(rng):
    from vllm_metax_tpu.ops.kv_cache import (
        move_kv_slots,
        new_kv_cache,
        write_to_kv_cache,
    )

    nl, nb_layer, bs, h, d = 3, 2, 8, 2, 16
    kv = new_kv_cache(nl * nb_layer, bs, h, d, jnp.float32,
                      model_dtype=jnp.float32)
    t = nb_layer * bs
    for layer in range(nl):
        rows_k = rng.standard_normal((t, h, d)).astype(np.float32) + layer
        kv = write_to_kv_cache(
            kv, jnp.asarray(rows_k), jnp.asarray(rows_k * 2),
            jnp.arange(t, dtype=jnp.int32) + layer * t,
        )
    before_k = np.asarray(kv.k).copy()
    src = jnp.asarray([5, 9, t], jnp.int32)  # last = OOB pad (skipped)
    dst = jnp.asarray([2, 3, t], jnp.int32)
    kv2 = move_kv_slots(kv, src, dst, nb_layer)
    after_k = np.asarray(kv2.k)
    flat_b = before_k.transpose(0, 2, 1, 3).reshape(nl * nb_layer * bs, h, d)
    flat_a = after_k.transpose(0, 2, 1, 3).reshape(nl * nb_layer * bs, h, d)
    for layer in range(nl):
        off = layer * t
        np.testing.assert_array_equal(flat_a[off + 2], flat_b[off + 5])
        np.testing.assert_array_equal(flat_a[off + 3], flat_b[off + 9])
        # untouched rows stay
        np.testing.assert_array_equal(flat_a[off + 7], flat_b[off + 7])


def _mc():
    return ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
        max_model_len=512,
        dtype="float32",
    )


def _config(branching: int):
    spec = (
        SpeculativeConfig(
            method="eagle",
            num_speculative_tokens=1,
            speculative_branching=branching,
        )
        if branching
        else SpeculativeConfig()
    )
    return EngineConfig(
        model_config=_mc(),
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
        speculative_config=spec,
    )


def _run(config, prompts, max_tokens=14):
    engine = EngineCore(config)
    for i, p in enumerate(prompts):
        engine.add_request(
            f"r{i}", p, SamplingParams(max_tokens=max_tokens, temperature=0.0)
        )
    acc = {f"r{i}": [] for i in range(len(prompts))}
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
        steps += 1
        assert steps < 250
    return [acc[f"r{i}"] for i in range(len(prompts))]


PROMPTS = [[1, 5, 9, 13, 200, 47], [7, 3, 11]]


@pytest.mark.parametrize("branching", [2, 3])
def test_eagle_tree_greedy_parity(branching):
    """Depth-1 draft trees (top-B EAGLE candidates) verified with ancestor
    masks + KV path compaction must reproduce the spec-off greedy output."""
    ref = _run(_config(0), PROMPTS)
    out = _run(_config(branching), PROMPTS)
    assert out == ref


def test_tree_mask_pallas_kernel_matches_xla(rng):
    """The unified Pallas kernel's in-kernel ancestor-bitmask path (TPU
    spec-verify fast path) == the XLA tree reference, in a MIXED batch
    (tree-verify request + plain causal prefill request)."""
    import dataclasses

    import jax.numpy as jnp

    from tests.test_pallas_attention import _make_case
    from vllm_metax_tpu.ops.attention import ragged_paged_attention_xla
    from vllm_metax_tpu.ops.pallas.ragged_attention import (
        ragged_paged_attention_pallas,
    )

    # req0: ctx 5 + 5 scheduled tree rows; req1: plain prefill of 7 tokens
    q, kv, md = _make_case(rng, seq_lens_ctx=[5, 10], qlens=[5, 7])
    parents = [-1, -1, 0, 1]
    bits = np.zeros(12, np.uint32)
    bits[0] = 1
    depth = {}
    for j, par in enumerate(parents):
        prow = 0 if par < 0 else par + 1
        depth[j] = 0 if par < 0 else depth[par] + 1
        bits[j + 1] = bits[prow] | (1 << (j + 1))
    pos = np.asarray(md.positions).copy()
    pos[:5] = [5, 6, 6, 7, 7]  # depth-based tree positions
    md = dataclasses.replace(
        md,
        tree_bits=jnp.asarray(bits),
        positions=jnp.asarray(pos),
    )
    ref = ragged_paged_attention_xla(q, kv, md, 0.125)
    out = ragged_paged_attention_pallas(q, kv, md, 0.125, interpret=True)
    t = int(md.query_start_loc[-1])
    np.testing.assert_allclose(
        np.asarray(out)[:t], np.asarray(ref)[:t], rtol=1e-3, atol=2e-3
    )
