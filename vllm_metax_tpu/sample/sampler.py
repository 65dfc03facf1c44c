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
_NEG_INF = jnp.float32(-1e30)


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


def sample(
    logits: jnp.ndarray,  # (R, V) f32
    st: SamplingTensors,
) -> SamplerOutput:
    r, v = logits.shape
    logits = logits.astype(jnp.float32)

    # logprobs of the *pre-temperature* distribution (vLLM semantics: logprobs
    # reflect sampling distribution; we report raw-logit logprobs like
    # greedy-compatible engines — see RequestOutput docs)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    topk_lps, topk_ids = jax.lax.top_k(logprobs, NUM_TOPK_LOGPROBS)

    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # --- random path: sort once, mask in sorted space
    temp = jnp.maximum(st.temperature, 1e-6)[:, None]
    scaled = logits / temp
    sorted_logits, sorted_ids = jax.lax.sort_key_val(
        -scaled, jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32), (r, v)), dimension=-1
    )
    sorted_logits = -sorted_logits  # descending
    ranks = jax.lax.broadcasted_iota(jnp.int32, (r, v), 1)

    mask = jnp.ones((r, v), dtype=bool)
    # top-k
    k = jnp.where(st.top_k > 0, st.top_k, v)[:, None]
    mask &= ranks < k
    # top-p (in sorted space): keep the smallest prefix with cumprob >= top_p
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    mask &= (cum - probs) < st.top_p[:, None]
    # min-p
    pmax = probs[:, :1]
    mask &= probs >= st.min_p[:, None] * pmax

    masked = jnp.where(mask, sorted_logits, _NEG_INF)
    # seeded gumbel-argmax categorical
    keys = jax.vmap(lambda s: jax.random.fold_in(jax.random.PRNGKey(0), s))(st.seeds)
    gumbel = jax.vmap(lambda kk: jax.random.gumbel(kk, (v,), dtype=jnp.float32))(keys)
    sampled_rank = jnp.argmax(masked + gumbel, axis=-1)
    sampled_ids = jnp.take_along_axis(
        sorted_ids, sampled_rank[:, None], axis=-1
    )[:, 0].astype(jnp.int32)

    token_ids = jnp.where(st.temperature == 0.0, greedy_ids, sampled_ids)
    chosen_lp = jnp.take_along_axis(logprobs, token_ids[:, None], axis=-1)[:, 0]
    return SamplerOutput(token_ids, chosen_lp, topk_ids, topk_lps)


def gather_logprobs(
    logprobs: jnp.ndarray, token_ids: jnp.ndarray
) -> jnp.ndarray:
    return jnp.take_along_axis(logprobs, token_ids[:, None], axis=-1)[:, 0]
