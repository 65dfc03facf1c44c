"""EPLB: rebalance expert placement under expert parallelism
(ref: the reference's expert rearrangement, fused_moe.py:1273).

Placement is semantically neutral — outputs are identical before and
after; only per-rank load (and therefore step latency) changes.
"""

import numpy as np

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(
    model="/models/Mixtral-8x7B-Instruct",  # local checkpoint dir
    expert_parallel_size=2,
)

prompts = ["The theory of relativity says"]
print(llm.generate(prompts, SamplingParams(max_tokens=32))[0].outputs[0].text)

# feed load statistics (per-expert routing counts you observed — e.g. from
# sampled router outputs) and re-permute the physical placement
loads = np.random.default_rng(0).random((32, 8))  # (num_moe_layers, E)
llm.engine.rebalance_experts(loads)

print(llm.generate(prompts, SamplingParams(max_tokens=32))[0].outputs[0].text)
