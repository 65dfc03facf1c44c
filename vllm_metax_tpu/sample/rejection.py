"""Batched rejection sampling for distributional draft proposals.

Reference analog: vllm_metax/patch/sample/rejection_sampler.py:9 (the v1
rejection sampler the reference patches for MACA) — the standard
speculative-decoding accept/recover rule (Leviathan et al.):

  for draft position j with draft token d_j ~ q_j:
    accept d_j iff  u_j < p_j(d_j) / q_j(d_j)          (u_j ~ U[0,1))
    on first reject, emit a RECOVERY token ~ normalize(max(0, p_j - q_j))
    if all S drafts accept, emit a BONUS token ~ p_S (the target's next-pos
    distribution)

This preserves the target distribution exactly for ANY proposal q (MTP /
EAGLE / draft-model). Point-mass proposals (ngram: q = one-hot) reduce to
prefix-accept — the sampler the runner used for ngram remains a special case.

Greedy rows (temperature 0) use argmax semantics: accept while the draft
equals the target argmax; recovery/bonus are the argmax token.

All-vector JAX; no host sync. Shapes are (R, S, V) target logprobs over the
verify window and (R, S) draft ids; S = max drafts in the batch, per-row
lengths via draft_lens.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def rejection_sample(
    target_probs: jnp.ndarray,  # (R, S+1, V) f32, rows are POST-temperature
    draft_ids: jnp.ndarray,  # (R, S) i32
    draft_lens: jnp.ndarray,  # (R,) i32 actual drafts per row (<= S)
    seeds: jnp.ndarray,  # (R,) u32
    draft_probs: Optional[jnp.ndarray] = None,  # (R, S, V) f32; None = point-mass
    greedy: Optional[jnp.ndarray] = None,  # (R,) bool rows using argmax
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out_ids (R, S+1) i32, num_emitted (R,) i32).

    out_ids[r, :num_emitted[r]] are the committed tokens: accepted drafts,
    then the recovery token (on first reject) or the bonus token (all
    accepted). num_emitted is in [1, S+1]."""
    r, s1, v = target_probs.shape
    s = s1 - 1
    key = jax.vmap(lambda sd: jax.random.key_data(jax.random.key(sd)))(seeds)

    def row_uniforms(sd):
        k = jax.random.wrap_key_data(sd)
        return jax.random.uniform(k, (s + 1,), jnp.float32)

    u = jax.vmap(row_uniforms)(key)  # (R, S+1); last col drives recovery

    pos = jnp.arange(s, dtype=jnp.int32)[None, :]  # (1, S)
    in_len = pos < draft_lens[:, None]  # (R, S) real draft positions

    p_draft = jnp.take_along_axis(
        target_probs[:, :s, :], draft_ids[..., None], axis=-1
    )[..., 0]  # (R, S) target prob of each draft token
    if draft_probs is not None:
        q_draft = jnp.take_along_axis(
            draft_probs, draft_ids[..., None], axis=-1
        )[..., 0]
        ratio = p_draft / jnp.maximum(q_draft, 1e-20)
    else:
        ratio = p_draft  # point-mass: q(d)=1 → accept with prob p(d)

    if greedy is None:
        greedy = jnp.zeros((r,), bool)
    argmax_tok = jnp.argmax(target_probs, axis=-1).astype(jnp.int32)  # (R,S+1)
    accept_sampled = u[:, :s] < ratio
    accept_greedy = draft_ids == argmax_tok[:, :s]
    accept = jnp.where(greedy[:, None], accept_greedy, accept_sampled)
    accept = accept & in_len

    # number of accepted = length of the all-True prefix
    acc_prefix = jnp.cumprod(accept.astype(jnp.int32), axis=1)  # (R, S)
    n_acc = jnp.sum(acc_prefix, axis=1).astype(jnp.int32)  # (R,)
    n_drafts = draft_lens
    all_accepted = n_acc == n_drafts

    # recovery distribution at the first rejected position
    rej_pos = jnp.minimum(n_acc, s - 1)  # clamp for gather; unused if all acc
    p_rej = jnp.take_along_axis(
        target_probs[:, :s, :], rej_pos[:, None, None], axis=1
    )[:, 0, :]  # (R, V)
    if draft_probs is not None:
        q_rej = jnp.take_along_axis(
            draft_probs, rej_pos[:, None, None], axis=1
        )[:, 0, :]
        resid = jnp.maximum(p_rej - q_rej, 0.0)
        # degenerate q==p → residual 0: fall back to p
        norm = jnp.sum(resid, axis=-1, keepdims=True)
        resid = jnp.where(norm > 1e-9, resid / jnp.maximum(norm, 1e-9), p_rej)
    else:
        # point-mass recovery: p with the draft token zeroed, renormalized
        d_rej = jnp.take_along_axis(draft_ids, rej_pos[:, None], axis=1)[:, 0]
        resid = p_rej.at[jnp.arange(r), d_rej].set(0.0)
        norm = jnp.sum(resid, axis=-1, keepdims=True)
        resid = jnp.where(norm > 1e-9, resid / jnp.maximum(norm, 1e-9), p_rej)

    def cat_sample(probs, uu):
        # inverse-CDF with a single cumsum (probs sum to 1 row-wise)
        cdf = jnp.cumsum(probs, axis=-1)
        return jnp.sum(cdf < uu[:, None], axis=-1).astype(jnp.int32)

    recovery = cat_sample(resid, u[:, s])
    recovery = jnp.where(
        greedy, jnp.argmax(resid, axis=-1).astype(jnp.int32), recovery
    )

    # bonus: target sample at position n_drafts (the row after the drafts)
    p_bonus = jnp.take_along_axis(
        target_probs, n_drafts[:, None, None], axis=1
    )[:, 0, :]
    bonus = cat_sample(p_bonus, u[:, s])
    bonus = jnp.where(greedy, argmax_tok[jnp.arange(r), n_drafts], bonus)

    extra = jnp.where(all_accepted, bonus, recovery)  # (R,)
    # out_ids: accepted drafts then the extra token
    out = jnp.where(
        pos < n_acc[:, None], draft_ids, 0
    )  # (R, S) accepted prefix
    out = jnp.concatenate([out, jnp.zeros((r, 1), jnp.int32)], axis=1)
    out = out.at[jnp.arange(r), n_acc].set(extra)
    num_emitted = n_acc + 1
    return out, num_emitted
