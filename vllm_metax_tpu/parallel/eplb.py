"""Expert-parallel load balancing (EPLB).

Analog of the reference's expert rearrangement machinery
(vllm_metax/model_executor/layers/fused_moe/fused_moe.py:1273 and vLLM's
EPLB): under EP, hot experts concentrated on one rank serialize the whole
mesh. EPLB periodically re-permutes the PHYSICAL placement of experts so
per-rank load evens out; routing stays logical via a per-layer
`expert_map` (logical id → physical slot) applied before dispatch
(ops/moe.py fused_experts callers).

TPU-native shape: the placement permutes the stacked expert-bank leaves
(axis 1 of (L, E, ...)) once per rebalance — a single gather + re-shard
(device_put restores the "ep" sharding, so bank rows migrate over ICI) —
and the id map rides the params tree into the jitted step.
"""

from __future__ import annotations

import numpy as np


def balanced_placement(loads: np.ndarray, ep: int) -> np.ndarray:
    """Greedy longest-processing-time partition of experts over ep ranks.

    loads: (E,) nonnegative per-expert load. Returns placement (E,) int32:
    logical expert e → physical slot placement[e]; each rank owns the
    contiguous slot span [r*E/ep, (r+1)*E/ep)."""
    e = loads.shape[0]
    if e % ep:
        raise ValueError(f"num_experts={e} must divide ep={ep}")
    cap = e // ep
    order = np.argsort(-np.asarray(loads, np.float64), kind="stable")
    rank_load = np.zeros(ep, np.float64)
    rank_fill = np.zeros(ep, np.int64)
    placement = np.zeros(e, np.int32)
    for expert in order:
        # least-loaded rank with a free slot
        open_ranks = np.flatnonzero(rank_fill < cap)
        r = open_ranks[np.argmin(rank_load[open_ranks])]
        placement[expert] = r * cap + rank_fill[r]
        rank_fill[r] += 1
        rank_load[r] += loads[expert]
    return placement


def rank_loads(loads: np.ndarray, placement: np.ndarray, ep: int) -> np.ndarray:
    """Per-rank total load under a placement (for tests/metrics)."""
    e = loads.shape[0]
    cap = e // ep
    out = np.zeros(ep, np.float64)
    for expert, slot in enumerate(placement):
        out[slot // cap] += loads[expert]
    return out
