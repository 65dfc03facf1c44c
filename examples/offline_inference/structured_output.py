"""Guided-choice structured decoding."""

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(model="/path/to/checkpoint")
sp = SamplingParams(max_tokens=8, temperature=0.0,
                    guided_choice=["positive", "negative", "neutral"])
out = llm.generate(["Sentiment of 'I love this': "], sp)
print(out[0].outputs[0].text)  # one of the three choices
