"""Speculative decoding: ngram drafts, DeepSeek MTP, or an EAGLE head
(analog of the reference's spec-decode test/example surface)."""

from vllm_metax_tpu import LLM, SamplingParams

# ngram: no draft model needed
llm = LLM(
    model="/path/to/model",
    speculative_config={
        "method": "ngram",
        "num_speculative_tokens": 4,
        "prompt_lookup_max": 4,
    },
)
# EAGLE: draft head checkpoint; speculative_branching>1 builds top-B trees
# verified with ancestor-bitmask attention
# llm = LLM(model=..., speculative_config={
#     "method": "eagle", "model": "/path/to/eagle-head",
#     "num_speculative_tokens": 4, "speculative_branching": 2})
print(llm.generate(["Count: 1 2 3 4"], SamplingParams(max_tokens=32))[0]
      .outputs[0].text)
