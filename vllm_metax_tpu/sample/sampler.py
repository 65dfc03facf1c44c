"""Batched sampler, jitted with the model step.

Replaces the reference's sampling kernels (csrc/sampler.cu: top_k_per_row
:251, apply_repetition_penalties_ :11) with XLA sort/argmax — TPU-idiomatic:
one (R, V) sort covers top-k AND top-p AND min-p, and the gumbel-argmax trick
gives seeded categorical sampling without host sync.

Greedy rows (temperature == 0) and sampled rows coexist in one batch via
jnp.where — no host-side batch splitting (matches vLLM v1 sampler behavior
pinned by the reference's tests/v1/sample/).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

NUM_TOPK_LOGPROBS = 8
# Python float, not jnp.float32: module-level device constants get hoisted
# as hidden executable arguments and break cached-executable reuse.
_NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclass
class SamplingTensors:
    """Per-row sampling params, padded to the request bucket."""

    temperature: jnp.ndarray  # (R,) f32; 0 → greedy
    top_k: jnp.ndarray  # (R,) i32; 0 → off
    top_p: jnp.ndarray  # (R,) f32; 1 → off
    min_p: jnp.ndarray  # (R,) f32; 0 → off
    seeds: jnp.ndarray  # (R,) u32 per-step per-row seed
    # penalties (0/1.0 → off)
    presence_penalty: jnp.ndarray  # (R,) f32
    frequency_penalty: jnp.ndarray  # (R,) f32
    repetition_penalty: jnp.ndarray  # (R,) f32


@jax.tree_util.register_dataclass
@dataclass
class SamplerOutput:
    token_ids: jnp.ndarray  # (R,) i32
    chosen_logprob: jnp.ndarray  # (R,) f32 logprob of the sampled token
    topk_ids: jnp.ndarray  # (R, NUM_TOPK_LOGPROBS) i32
    topk_logprobs: jnp.ndarray  # (R, NUM_TOPK_LOGPROBS) f32


def apply_penalties(
    logits: jnp.ndarray,  # (R, V)
    output_counts: jnp.ndarray,  # (R, V) i32 counts of generated tokens
    prompt_mask: jnp.ndarray,  # (R, V) bool tokens present in prompt
    st: SamplingTensors,
) -> jnp.ndarray:
    """Reference math: csrc/sampler.cu:11 apply_repetition_penalties_ and the
    vLLM penalty definitions (presence/frequency over generated tokens,
    repetition over prompt+generated)."""
    out_mask = output_counts > 0
    seen = out_mask | prompt_mask
    rep = st.repetition_penalty[:, None]
    rep_applied = jnp.where(
        logits > 0, logits / rep, logits * rep
    )
    logits = jnp.where(seen, rep_applied, logits)
    logits = logits - st.frequency_penalty[:, None] * output_counts
    logits = logits - st.presence_penalty[:, None] * out_mask
    return logits


# Per-row top-k is applied via a k-th-value threshold from a partial top-k of
# this width — the TPU-idiomatic replacement for the full-vocab sort
# (csrc/sampler.cu:251 top_k_per_row). Rows asking for more are clamped.
TOP_K_CAP = 128


def _nucleus_threshold(probs: jnp.ndarray, top_p: jnp.ndarray, iters: int = 30):
    """Binary-search the probability threshold t such that keeping
    {p_i >= t} is the smallest set with mass >= top_p — the nucleus set,
    computed without sorting (O(iters) masked reductions instead)."""
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    lo = jnp.zeros_like(pmax)
    hi = pmax

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0), axis=-1, keepdims=True)
        ok = mass >= top_p[:, None]
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def _categorical(p: jnp.ndarray, seeds: jnp.ndarray) -> jnp.ndarray:
    """Seeded exact categorical over unnormalized row probs via TWO-LEVEL
    inverse-CDF: block sums (one reduction pass) pick the 128-wide block,
    then a tiny in-block cumsum picks the token.

    One uniform per row; no per-row (V,) gumbel field (threefry for R*V
    values cost ~6ms/step at R=128, V=128k) and no full-vocab cumsum (XLA
    materialized three (R, V) layout copies, ~0.6ms/step)."""
    r, v = p.shape
    keys = jax.vmap(lambda s: jax.random.fold_in(jax.random.PRNGKey(0), s))(
        seeds
    )
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (), jnp.float32))(keys)
    blk = 128
    nb = (v + blk - 1) // blk
    pad = nb * blk - v
    pp = jnp.pad(p, ((0, 0), (0, pad))) if pad else p
    pb = pp.reshape(r, nb, blk)
    sums = jnp.sum(pb, axis=-1)  # (R, NB) — the only full-vocab pass
    csum = jnp.cumsum(sums, axis=-1)
    target = u * csum[:, -1]
    b_idx = jnp.minimum(
        jnp.sum(csum < target[:, None], axis=-1), nb - 1
    ).astype(jnp.int32)
    prev = jnp.where(
        b_idx > 0,
        jnp.take_along_axis(csum, jnp.maximum(b_idx - 1, 0)[:, None], axis=1)[
            :, 0
        ],
        0.0,
    )
    inner = jnp.take_along_axis(pb, b_idx[:, None, None], axis=1)[:, 0]  # (R, blk)
    icdf = jnp.cumsum(inner, axis=-1)
    off = jnp.sum(icdf < (target - prev)[:, None], axis=-1).astype(jnp.int32)
    off = jnp.minimum(off, blk - 1)
    return jnp.minimum(b_idx * blk + off, v - 1)


def sample(
    logits: jnp.ndarray,  # (R, V) f32
    st: SamplingTensors,
    all_greedy: bool = False,
    need_logprobs: bool = True,
    plain: bool = False,
) -> SamplerOutput:
    """Batched sampling without a full-vocab sort.

    `all_greedy` / `need_logprobs` / `plain` are STATIC fast-path switches
    (the runner compiles a variant per combination): a pure-greedy no-logprob
    decode step is a single argmax over the logits, and `plain` (no row uses
    top-k/top-p/min-p) skips the truncation machinery entirely — the common
    serving cases.
    """
    r, v = logits.shape
    logits = logits.astype(jnp.float32)
    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if need_logprobs:
        # logprobs of the pre-temperature distribution (vLLM semantics)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        topk_lps, topk_ids = jax.lax.top_k(logprobs, NUM_TOPK_LOGPROBS)
    else:
        topk_ids = jnp.zeros((r, NUM_TOPK_LOGPROBS), jnp.int32)
        topk_lps = jnp.zeros((r, NUM_TOPK_LOGPROBS), jnp.float32)

    if all_greedy:
        token_ids = greedy_ids
    else:
        temp = jnp.maximum(st.temperature, 1e-6)[:, None]
        scaled = logits / temp
        if plain:
            # _categorical consumes UNNORMALIZED row probs — exp(x - max)
            # skips softmax's full-vocab sum+divide pass (one fewer (R, V)
            # f32 read/write per decode step)
            probs = jnp.exp(
                scaled - jnp.max(scaled, axis=-1, keepdims=True)
            )
        else:
            # top-k via the k-th value threshold (partial top-k, no full sort)
            cap = min(TOP_K_CAP, v)
            kvals = jax.lax.top_k(scaled, cap)[0]  # (R, cap) descending
            k_eff = jnp.clip(st.top_k, 0, cap)
            kth = jnp.take_along_axis(
                kvals, jnp.maximum(k_eff - 1, 0)[:, None], axis=-1
            )
            masked = jnp.where(
                (st.top_k[:, None] > 0) & (scaled < kth), _NEG_INF, scaled
            )
            probs = jax.nn.softmax(masked, axis=-1)
            # top-p (nucleus) via threshold bisection
            tau = _nucleus_threshold(probs, st.top_p)
            probs = jnp.where(probs < tau, 0.0, probs)
            # min-p
            pmax = jnp.max(probs, axis=-1, keepdims=True)
            probs = jnp.where(
                probs < st.min_p[:, None] * pmax, 0.0, probs
            )
        sampled_ids = _categorical(probs, st.seeds)
        token_ids = jnp.where(st.temperature == 0.0, greedy_ids, sampled_ids)

    if need_logprobs:
        chosen_lp = jnp.take_along_axis(logprobs, token_ids[:, None], axis=-1)[:, 0]
    else:
        chosen_lp = jnp.zeros((r,), jnp.float32)
    return SamplerOutput(token_ids, chosen_lp, topk_ids, topk_lps)


def gather_logprobs(
    logprobs: jnp.ndarray, token_ids: jnp.ndarray
) -> jnp.ndarray:
    return jnp.take_along_axis(logprobs, token_ids[:, None], axis=-1)[:, 0]
