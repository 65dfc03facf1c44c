"""Distributional correctness of the general rejection sampler.

Reference analog: the acceptance/recovery semantics of
vllm_metax/patch/sample/rejection_sampler.py:9 (Leviathan-style spec-decode
verification). The core property: for drafts sampled from q, the emitted
token at each position is distributed EXACTLY per the target p, regardless
of q."""

import jax.numpy as jnp
import numpy as np

from vllm_metax_tpu.sample.rejection import rejection_sample

V = 8


def _rand_dist(rng, shape):
    x = rng.random(shape) + 1e-3
    return x / x.sum(axis=-1, keepdims=True)


def test_first_position_matches_target():
    """Marginal of the first emitted token == target p (drafts ~ q)."""
    rng = np.random.default_rng(0)
    r, s = 100_000, 2
    p = _rand_dist(rng, (V,))
    q = _rand_dist(rng, (V,))
    target = jnp.asarray(np.tile(p, (r, s + 1, 1)), jnp.float32)
    draft_probs = jnp.asarray(np.tile(q, (r, s, 1)), jnp.float32)
    draft_ids = jnp.asarray(
        rng.choice(V, size=(r, s), p=q).astype(np.int32)
    )
    out, n = rejection_sample(
        target, draft_ids, jnp.full((r,), s, jnp.int32),
        jnp.arange(r, dtype=jnp.uint32), draft_probs,
    )
    first = np.asarray(out[:, 0])
    emp = np.bincount(first, minlength=V) / r
    np.testing.assert_allclose(emp, p, atol=0.01)


def test_acceptance_rate_analytic():
    """E[accept at pos 0] == sum_x min(p(x), q(x))."""
    rng = np.random.default_rng(1)
    r, s = 100_000, 1
    p = _rand_dist(rng, (V,))
    q = _rand_dist(rng, (V,))
    expected = np.minimum(p, q).sum()
    target = jnp.asarray(np.tile(p, (r, s + 1, 1)), jnp.float32)
    draft_probs = jnp.asarray(np.tile(q, (r, s, 1)), jnp.float32)
    draft_ids = jnp.asarray(rng.choice(V, size=(r, s), p=q).astype(np.int32))
    out, n = rejection_sample(
        target, draft_ids, jnp.full((r,), s, jnp.int32),
        jnp.arange(r, dtype=jnp.uint32), draft_probs,
    )
    # accepted at pos 0 iff out[:,0] == draft AND n == 2 (draft + bonus)
    acc = (np.asarray(n) == 2).mean()
    np.testing.assert_allclose(acc, expected, atol=0.01)


def test_identical_p_q_always_accepts():
    rng = np.random.default_rng(2)
    r, s = 4096, 3
    p = _rand_dist(rng, (r, s + 1, V))
    draft_ids = np.stack(
        [
            np.array([rng.choice(V, p=p[i, j]) for j in range(s)])
            for i in range(r)
        ]
    ).astype(np.int32)
    out, n = rejection_sample(
        jnp.asarray(p, jnp.float32), jnp.asarray(draft_ids),
        jnp.full((r,), s, jnp.int32), jnp.arange(r, dtype=jnp.uint32),
        jnp.asarray(p[:, :s], jnp.float32),
    )
    assert (np.asarray(n) == s + 1).all()  # p==q → ratio 1 → accept all
    assert (np.asarray(out)[:, :s] == draft_ids).all()


def test_greedy_prefix_accept():
    """Greedy rows: accept while draft == argmax(p); recovery = argmax."""
    rng = np.random.default_rng(3)
    r, s = 64, 3
    p = _rand_dist(rng, (r, s + 1, V))
    am = p.argmax(-1)
    draft_ids = am[:, :s].astype(np.int32).copy()
    draft_ids[::2, 1] = (draft_ids[::2, 1] + 1) % V  # break at pos 1
    out, n = rejection_sample(
        jnp.asarray(p, jnp.float32), jnp.asarray(draft_ids),
        jnp.full((r,), s, jnp.int32), jnp.arange(r, dtype=jnp.uint32),
        None, greedy=jnp.ones((r,), bool),
    )
    out, n = np.asarray(out), np.asarray(n)
    assert (n[::2] == 2).all()  # 1 accepted + recovery
    assert (out[::2, 1] == am[::2, 1]).all()  # recovery = target argmax
    assert (n[1::2] == s + 1).all()  # all accepted + bonus
    assert (out[1::2, s] == am[1::2, s]).all()  # bonus = argmax at next pos


def test_point_mass_recovery_excludes_draft():
    """Point-mass rejects must never re-emit the rejected draft token."""
    rng = np.random.default_rng(4)
    r, s = 20_000, 1
    p = _rand_dist(rng, (V,))
    bad = int(np.argmin(p))  # unlikely token: mostly rejected
    target = jnp.asarray(np.tile(p, (r, s + 1, 1)), jnp.float32)
    draft_ids = jnp.full((r, s), bad, jnp.int32)
    out, n = rejection_sample(
        target, draft_ids, jnp.full((r,), s, jnp.int32),
        jnp.arange(r, dtype=jnp.uint32), None,
    )
    out, n = np.asarray(out), np.asarray(n)
    rejected = n == 1
    assert rejected.mean() > 0.5
    assert (out[rejected, 0] != bad).all()


def test_zero_drafts_row_emits_one_token():
    rng = np.random.default_rng(5)
    r, s = 1024, 2
    p = _rand_dist(rng, (r, s + 1, V))
    out, n = rejection_sample(
        jnp.asarray(p, jnp.float32), jnp.zeros((r, s), jnp.int32),
        jnp.zeros((r,), jnp.int32), jnp.arange(r, dtype=jnp.uint32),
        jnp.asarray(p[:, :s], jnp.float32),
    )
    n = np.asarray(n)
    assert (n == 1).all()  # bonus token only, sampled from p[:, 0]
    emp = np.bincount(np.asarray(out)[:, 0], minlength=V) / r
    np.testing.assert_allclose(emp, p[:, 0].mean(0), atol=0.05)
