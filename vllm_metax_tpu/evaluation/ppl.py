"""Perplexity / teacher-forced logprob evaluation.

The reference's accuracy gate: WikiText-2 perplexity vs HuggingFace with
relative tolerance 0.01 (tests/models/language/generation_ppl_test/
ppl_utils.py:15-20). This module computes exact per-token logprobs by running
the model in teacher-forcing mode over sliding windows, the same evaluation
the reference's PPL harness performs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from vllm_metax_tpu.ops.attention import AttentionMetadata
from vllm_metax_tpu.utils import cdiv


def compute_token_logprobs(runner, token_ids: list[int]) -> np.ndarray:
    """log p(t_i | t_<i) for i in [1, len) — one prefill pass per window."""
    mc = runner.model_cfg
    model, params = runner.model, runner.params
    window = min(mc.max_model_len, runner.config.scheduler_config.max_num_batched_tokens)
    bs = runner.cache_cfg.block_size
    out: list[np.ndarray] = []

    @jax.jit
    def window_logprobs(kv, ids, md):
        hidden, kv = model.forward(params, ids, kv, md, mc)
        logits = model.compute_logits(params, hidden, mc)
        return jax.nn.log_softmax(logits, axis=-1), kv

    # fresh cache region: reuse the runner's cache but separate block range 0..
    kv = runner.kv_cache
    n = len(token_ids)
    maxb = cdiv(min(n, mc.max_model_len), bs)
    for start in range(0, n - 1, window):
        chunk = token_ids[start : start + window]
        t = len(chunk)
        pad_t = window
        ids = np.zeros(pad_t, np.int32)
        ids[:t] = chunk
        positions = np.zeros(pad_t, np.int32)
        positions[:t] = np.arange(start, start + t)
        slots = np.full(pad_t, runner.num_slots, np.int32)
        slots[:t] = np.arange(start, start + t)
        block_tables = np.arange(maxb, dtype=np.int32)[None, :]
        md = AttentionMetadata(
            slot_mapping=jnp.asarray(slots),
            block_tables=jnp.asarray(block_tables),
            seq_lens=jnp.asarray([start + t], jnp.int32),
            query_start_loc=jnp.asarray([0, t], jnp.int32),
            req_idx=jnp.zeros(pad_t, jnp.int32),
            positions=jnp.asarray(positions),
            num_seqs=jnp.asarray(1, jnp.int32),
        )
        lps, kv = window_logprobs(kv, jnp.asarray(ids), md)
        lps = np.asarray(lps[:t])
        # row i predicts token_ids[start+i+1]
        nxt = token_ids[start + 1 : start + t + 1]
        rows = np.arange(len(nxt))
        out.append(lps[rows, np.asarray(nxt)])
        if start + t >= n:
            break
    runner.kv_cache = kv  # cache contents are scratch; block 0.. reused
    return np.concatenate(out)[: n - 1]


def _prefill_hidden(runner, token_ids: list[int]) -> jnp.ndarray:
    """Final-layer hidden states (T, E) for a token sequence (teacher-forced
    prefill; basis for pooled embeddings)."""
    mc = runner.model_cfg
    model, params = runner.model, runner.params
    bs = runner.cache_cfg.block_size
    n = len(token_ids)
    if n > mc.max_model_len:
        raise ValueError(f"sequence ({n}) exceeds max_model_len")
    maxb = cdiv(n, bs)
    ids = jnp.asarray(np.asarray(token_ids, np.int32))
    md = AttentionMetadata(
        slot_mapping=jnp.arange(n, dtype=jnp.int32),
        block_tables=jnp.arange(maxb, dtype=jnp.int32)[None, :],
        seq_lens=jnp.asarray([n], jnp.int32),
        query_start_loc=jnp.asarray([0, n], jnp.int32),
        req_idx=jnp.zeros(n, jnp.int32),
        positions=jnp.arange(n, dtype=jnp.int32),
        num_seqs=jnp.asarray(1, jnp.int32),
    )
    hidden, kv = model.forward(params, ids, runner.kv_cache, md, mc)
    runner.kv_cache = kv
    return hidden


def compute_ppl(runner, token_ids: list[int]) -> float:
    """exp(mean NLL) over the sequence (the reference's PPL definition)."""
    lps = compute_token_logprobs(runner, token_ids)
    return float(math.exp(-float(np.mean(lps))))
