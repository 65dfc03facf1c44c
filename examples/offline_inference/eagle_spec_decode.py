"""EAGLE speculative decoding (ref: examples/offline_inference/spec_decode.py
in the reference + vLLM's EAGLE flow).

The EAGLE-1 draft head (fc over [embed | hidden] + one decoder layer) lives
in its own checkpoint (e.g. yuhuili/EAGLE-LLaMA3-Instruct-8B). Point-mass
drafts keep verification exact: greedy output matches spec-off token for
token — drafts only change throughput.

`speculative_branching=B` proposes the head's top-B candidates per step as a
depth-1 draft TREE, verified in one pass with ancestor-masked tree attention.
"""

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(
    model="/models/Meta-Llama-3-8B-Instruct",  # local checkpoint dir
    speculative_config=dict(
        method="eagle",
        num_speculative_tokens=1,
        draft_model="/models/EAGLE-LLaMA3-Instruct-8B",
        speculative_branching=2,  # top-2 candidate tree per step
    ),
)

out = llm.generate(
    ["The capital of France is"],
    SamplingParams(max_tokens=64, temperature=0.0),
)
print(out[0].outputs[0].text)
