"""Persist the post-processed (merged/quantized/repacked) weights for fast
restart (ref: examples/offline_inference/save_sharded_state.py)."""

from vllm_metax_tpu import LLM, SamplingParams

LLM(model="/path/to/checkpoint", quantization="gptq").save_sharded_state(
    "/path/to/state"
)
# later: skips checkpoint parsing + quantization entirely
llm = LLM(model="/path/to/state", load_format="sharded_state")
print(llm.generate(["x"], SamplingParams(max_tokens=4))[0].outputs[0].text)
