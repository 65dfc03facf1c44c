"""Parallel sampling: n completions per prompt (OpenAI `n`)."""

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(model="/path/to/checkpoint")

# n=4 fans out into 4 engine requests; the prefix cache dedups the shared
# prompt prefill. With a seed, child k samples with seed+k (reproducible).
sp = SamplingParams(n=4, max_tokens=32, temperature=0.9, seed=0)
out = llm.generate(["Write a haiku about the sea:"], sp)
for completion in out[0].outputs:
    print(f"--- choice {completion.index} ---")
    print(completion.text)
