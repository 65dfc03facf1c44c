"""Basic offline generation (analog of the reference's
examples/offline_inference/basic)."""

from vllm_metax_tpu import LLM, SamplingParams

prompts = [
    "Hello, my name is",
    "The capital of France is",
    "The future of AI is",
]

llm = LLM(model="/path/to/your/model")  # local HF checkpoint or .gguf file
outputs = llm.generate(
    prompts, SamplingParams(temperature=0.8, top_p=0.95, max_tokens=64)
)
for out in outputs:
    print(f"Prompt: {out.prompt!r}")
    print(f"Generated: {out.outputs[0].text!r}\n")
