"""Basic offline generation (ref: examples/offline_inference/basic/)."""

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(model="/path/to/hf/checkpoint")
outputs = llm.generate(
    ["Hello, my name is", "The capital of France is"],
    SamplingParams(max_tokens=32, temperature=0.8, top_p=0.95),
)
for out in outputs:
    print(f"{out.prompt!r} -> {out.outputs[0].text!r}")
