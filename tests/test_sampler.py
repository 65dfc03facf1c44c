"""Sampler: sort-free top-k / top-p (nucleus) masking vs sorted reference.

The production sampler avoids the full-vocab sort (csrc/sampler.cu analog)
via k-th-value thresholds and nucleus-threshold bisection; these tests verify
the selected support sets match the classic sorted definitions exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metax_tpu.sample.sampler import (
    SamplingTensors,
    _nucleus_threshold,
    sample,
)


def _st(r, **kw):
    base = dict(
        temperature=jnp.ones(r),
        top_k=jnp.zeros(r, jnp.int32),
        top_p=jnp.ones(r),
        min_p=jnp.zeros(r),
        seeds=jnp.arange(r, dtype=jnp.uint32),
        presence_penalty=jnp.zeros(r),
        frequency_penalty=jnp.zeros(r),
        repetition_penalty=jnp.ones(r),
    )
    base.update({k: jnp.asarray(v) for k, v in kw.items()})
    return SamplingTensors(**base)


def test_greedy_fast_path_matches(rng):
    logits = jnp.asarray(rng.standard_normal((4, 512), dtype=np.float32))
    st = _st(4, temperature=np.zeros(4, np.float32))
    fast = sample(logits, st, all_greedy=True, need_logprobs=False)
    full = sample(logits, st, all_greedy=False, need_logprobs=True)
    np.testing.assert_array_equal(
        np.asarray(fast.token_ids), np.asarray(full.token_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(fast.token_ids), np.asarray(jnp.argmax(logits, -1))
    )


def test_nucleus_threshold_matches_sorted_definition(rng):
    probs_np = rng.random((8, 1000)).astype(np.float32)
    probs_np /= probs_np.sum(-1, keepdims=True)
    for p in (0.1, 0.5, 0.9, 0.99):
        tau = np.asarray(
            _nucleus_threshold(jnp.asarray(probs_np), jnp.full(8, p, jnp.float32))
        )[:, 0]
        for i in range(8):
            keep = probs_np[i] >= tau[i]
            # kept mass covers p, and it's the minimal top-prob set: dropping
            # the smallest kept prob must fall below p
            assert keep.sum() >= 1
            mass = probs_np[i][keep].sum()
            assert mass >= p - 1e-5
            smallest_kept = probs_np[i][keep].min()
            assert mass - smallest_kept < p + 1e-5
            # the kept set is a prefix of the sorted order
            assert probs_np[i][keep].min() >= probs_np[i][~keep].max() - 1e-7


def test_top_k_threshold_restricts_support(rng):
    logits = jnp.asarray(rng.standard_normal((6, 512), dtype=np.float32))
    st = _st(6, top_k=np.full(6, 5, np.int32))
    # sample many times with different seeds; all outputs must be in the top-5
    top5 = np.asarray(jax.lax.top_k(logits, 5)[1])
    seen = set()
    for s in range(50):
        st2 = _st(6, top_k=np.full(6, 5, np.int32),
                  seeds=np.full(6, s, np.uint32))
        out = np.asarray(sample(logits, st2).token_ids)
        for i in range(6):
            assert out[i] in top5[i]
            seen.add((i, int(out[i])))
    assert len(seen) > 6  # actually random, not greedy


def test_min_p_restricts_support(rng):
    logits = jnp.zeros((1, 8)).at[0, 0].set(5.0)  # one dominant token
    st = _st(1, min_p=np.array([0.5], np.float32))
    for s in range(20):
        st2 = _st(1, min_p=np.array([0.5], np.float32),
                  seeds=np.array([s], np.uint32))
        out = int(np.asarray(sample(logits, st2).token_ids)[0])
        assert out == 0  # everything else is below 0.5 * pmax


def test_mixed_greedy_and_random_rows(rng):
    logits = jnp.asarray(rng.standard_normal((4, 256), dtype=np.float32))
    st = _st(4, temperature=np.array([0.0, 1.0, 0.0, 1.0], np.float32))
    out = sample(logits, st)
    greedy = np.asarray(jnp.argmax(logits, -1))
    got = np.asarray(out.token_ids)
    assert got[0] == greedy[0] and got[2] == greedy[2]


def test_logprobs_consistent(rng):
    logits = jnp.asarray(rng.standard_normal((3, 128), dtype=np.float32))
    st = _st(3, temperature=np.zeros(3, np.float32))
    out = sample(logits, st, need_logprobs=True)
    ref = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for i in range(3):
        tok = int(np.asarray(out.token_ids)[i])
        assert abs(float(np.asarray(out.chosen_logprob)[i]) - ref[i, tok]) < 1e-5
        # topk logprobs are the true top entries
        np.testing.assert_allclose(
            np.asarray(out.topk_logprobs)[i],
            np.sort(ref[i])[::-1][:8],
            rtol=1e-5,
        )


def test_categorical_two_level_marginals():
    """The block-decomposed inverse-CDF must sample the exact categorical,
    including mass near block boundaries (block = 128)."""
    import jax.numpy as jnp
    import numpy as np

    from vllm_metax_tpu.sample.sampler import _categorical

    rng = np.random.default_rng(0)
    v = 300  # spans 3 blocks with a ragged tail
    p = np.zeros(v, np.float32)
    support = [0, 127, 128, 255, 256, 299]  # block edges + tail
    p[support] = rng.random(len(support)).astype(np.float32) + 0.2
    r = 60_000
    probs = jnp.asarray(np.tile(p, (r, 1)))
    toks = np.asarray(
        _categorical(probs, jnp.arange(r, dtype=jnp.uint32))
    )
    assert set(np.unique(toks)) <= set(support)
    emp = np.bincount(toks, minlength=v)[support] / r
    np.testing.assert_allclose(emp, p[support] / p.sum(), atol=0.01)
