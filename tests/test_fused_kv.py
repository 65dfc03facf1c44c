"""Fused [K‖V] page pools: K and V side by side in one (NB, H, BS, 2D)
array (ops/kv_cache.py new_kv_cache fused=True).

Why: the TPU scatter that commits decode-step KV costs per ROW (~70ns
regardless of row width — tools/perf/scatter_probe.py), and each attention
page fetch costs a DMA descriptor per pool. Fusing K and V into one row
halves both. Reference keeps split pools (csrc/cache_kernels.cu:450
reshape_and_cache_flash writes two arrays); on TPU the fused layout is
strictly cheaper because the scatter/DMA overheads dominate, not bytes.

Parity contract: every path (eager write, batched all-layer commit, XLA
attention, Pallas unified kernel, Pallas decode kernel incl. deferred
current-token K/V, quantized pools) produces bit-identical math on fused
vs split pools.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pallas_attention import BS, D, _make_case
from vllm_metax_tpu.ops.attention import ragged_paged_attention_xla
from vllm_metax_tpu.ops.kv_cache import (
    KVCache,
    gather_kv_for_requests,
    kv_fused_width,
    new_kv_cache,
    write_all_layers_to_kv_cache,
    write_to_kv_cache,
)
from vllm_metax_tpu.ops.pallas.decode_attention import (
    paged_decode_attention_pallas,
)
from vllm_metax_tpu.ops.pallas.ragged_attention import (
    ragged_paged_attention_pallas,
)


def _fuse(kv: KVCache) -> KVCache:
    """Split pool → equivalent fused pool (same contents)."""
    return kv._replace(
        k=jnp.concatenate([kv.k, kv.v], axis=-1),
        v=kv.v[..., :0],
    )


def test_fused_width_detection(rng):
    kv = new_kv_cache(8, BS, 2, D, jnp.bfloat16, fused=True)
    assert kv.k.shape[-1] == 2 * D and kv.v.shape[-1] == 0
    assert kv_fused_width(kv, D) == D
    split = new_kv_cache(8, BS, 2, D, jnp.bfloat16)
    assert kv_fused_width(split, D) == 0
    # MLA latent pools (k-width == q-width, zero v) must NOT read as fused
    mla = new_kv_cache(8, BS, 1, 2 * D, jnp.bfloat16, store_v=False)
    assert kv_fused_width(mla, 2 * D) == 0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
def test_eager_write_parity(rng, dtype):
    h, nb = 2, 8
    split = new_kv_cache(nb, BS, h, D, dtype)
    fused = new_kv_cache(nb, BS, h, D, dtype, fused=True)
    t = 13
    k = jnp.asarray(rng.standard_normal((t, h, D), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((t, h, D), dtype=np.float32))
    slots = jnp.asarray(
        rng.choice(nb * BS, size=t, replace=False), jnp.int32
    )
    split = write_to_kv_cache(split, k, v, slots)
    fused = write_to_kv_cache(fused, k, v, slots)
    np.testing.assert_array_equal(
        np.asarray(fused.k[..., :D]), np.asarray(split.k)
    )
    np.testing.assert_array_equal(
        np.asarray(fused.k[..., D:]), np.asarray(split.v)
    )
    if split.quantized:
        np.testing.assert_array_equal(
            np.asarray(fused.k_scale), np.asarray(split.k_scale)
        )
        np.testing.assert_array_equal(
            np.asarray(fused.v_scale), np.asarray(split.v_scale)
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
def test_all_layer_commit_parity(rng, dtype):
    h, nb_layer, n_layers = 2, 4, 3
    nb = nb_layer * n_layers
    split = new_kv_cache(nb, BS, h, D, dtype)
    fused = new_kv_cache(nb, BS, h, D, dtype, fused=True)
    t = 6
    k = jnp.asarray(rng.standard_normal((n_layers, t, h, D), np.float32))
    v = jnp.asarray(rng.standard_normal((n_layers, t, h, D), np.float32))
    # one pad sentinel slot in the mix
    slots = np.asarray(
        rng.choice(nb_layer * BS, size=t, replace=False), np.int32
    )
    slots[-1] = nb_layer * BS + 5
    slots = jnp.asarray(slots)
    split = write_all_layers_to_kv_cache(split, k, v, slots, nb_layer)
    fused = write_all_layers_to_kv_cache(fused, k, v, slots, nb_layer)
    np.testing.assert_array_equal(
        np.asarray(fused.k[..., :D]), np.asarray(split.k)
    )
    np.testing.assert_array_equal(
        np.asarray(fused.k[..., D:]), np.asarray(split.v)
    )
    if split.quantized:
        np.testing.assert_array_equal(
            np.asarray(fused.k_scale), np.asarray(split.k_scale)
        )
        np.testing.assert_array_equal(
            np.asarray(fused.v_scale), np.asarray(split.v_scale)
        )


def test_gather_split_parity(rng):
    _, kv, md = _make_case(rng, seq_lens_ctx=[30, 17], qlens=[1, 1])
    fused = _fuse(kv)
    k_s, v_s = gather_kv_for_requests(kv, md.block_tables, jnp.float32)
    k_f, v_f = gather_kv_for_requests(
        fused, md.block_tables, jnp.float32, fused_width=D
    )
    np.testing.assert_array_equal(np.asarray(k_f), np.asarray(k_s))
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_s))


def test_xla_attention_fused(rng):
    q, kv, md = _make_case(rng, seq_lens_ctx=[30, 17, 63, 5], qlens=[1, 1, 1, 1])
    out_s = ragged_paged_attention_xla(q, kv, md, 0.125)
    out_f = ragged_paged_attention_xla(q, _fuse(kv), md, 0.125)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_s), rtol=1e-6, atol=1e-6
    )


def test_unified_kernel_fused_mixed(rng):
    # mixed prefill+decode exercises the prefill-tile DMA path
    q, kv, md = _make_case(rng, seq_lens_ctx=[20, 0, 40], qlens=[1, 33, 1])
    out_x = ragged_paged_attention_xla(q, kv, md, 0.125)
    out_f = ragged_paged_attention_pallas(
        q, _fuse(kv), md, 0.125, interpret=True
    )
    t = int(md.query_start_loc[-1])
    np.testing.assert_allclose(
        np.asarray(out_f)[:t], np.asarray(out_x)[:t], rtol=1e-3, atol=2e-3
    )


def test_decode_kernel_fused(rng):
    q, kv, md = _make_case(
        rng,
        seq_lens_ctx=[30, 17, 63, 5, 2, 40, 9, 27],
        qlens=[1] * 8,
    )
    import dataclasses

    md = dataclasses.replace(md, decode_only=True)
    out_x = ragged_paged_attention_xla(q, kv, md, 0.125)
    out_f = paged_decode_attention_pallas(
        q, _fuse(kv), md, 0.125, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=1e-3, atol=2e-3
    )


def test_decode_kernel_fused_deferred(rng):
    """Deferred mode on a fused pool: current-token K/V rides ONE fused
    k_cur row set; the poisoned pool row proves it is never read."""
    from tests.test_deferred_kv import _split_current

    q, kv, md = _make_case(
        rng, seq_lens_ctx=[30, 17, 63, 5, 2, 40, 9, 27], qlens=[1] * 8
    )
    import dataclasses

    md = dataclasses.replace(md, decode_only=True)
    out_ref = ragged_paged_attention_xla(q, kv, md, 0.125)
    poisoned, k_cur, v_cur = _split_current(rng, kv, md)
    out_f = paged_decode_attention_pallas(
        q, _fuse(poisoned), md, 0.125,
        k_cur=k_cur, v_cur=v_cur, interpret=True,
    )
    assert np.isfinite(np.asarray(out_f)).all()
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_ref), rtol=1e-3, atol=2e-3
    )


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    path = str(tmp_path_factory.mktemp("ckpt") / "llama-tiny")
    model.save_pretrained(path, safe_serialization=True)
    return path


def test_engine_e2e_fused_matches_split(tiny_ckpt, monkeypatch):
    """Whole-engine greedy decode: fused pools change nothing token-wise."""
    from vllm_metax_tpu import LLM, SamplingParams

    rng = np.random.default_rng(3)
    prompts = [list(map(int, rng.integers(0, 256, size=n))) for n in (5, 19)]
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("METAX_TPU_KV_FUSED", flag)
        llm = LLM(
            model=tiny_ckpt,
            dtype="float32",
            num_kv_blocks=64,
            max_num_seqs=4,
            max_num_batched_tokens=64,
        )
        pool = llm.engine.runner.kv_cache
        assert (pool.v.shape[-1] == 0) == (flag == "1")
        outs[flag] = [
            o.outputs[0].token_ids
            for o in llm.generate(
                sampling_params=sp, prompt_token_ids=prompts
            )
        ]
        del llm
    assert outs["0"] == outs["1"]
