"""N-gram speculative decoding (ref: tests/v1/e2e/test_spec_decode.py)."""

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(
    model="/path/to/checkpoint",
    speculative_config=dict(
        method="ngram", num_speculative_tokens=4,
        prompt_lookup_min=1, prompt_lookup_max=4,
    ),
)
out = llm.generate(
    ["Repeat after me: the quick brown fox jumps over the lazy dog. The quick"],
    SamplingParams(max_tokens=32, temperature=0.0),
)
print(out[0].outputs[0].text)
