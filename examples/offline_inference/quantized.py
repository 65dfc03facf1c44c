"""GPTQ/AWQ checkpoints load directly; bf16 checkpoints can be quantized at
load (ref: quantized CI targets, .modelpath/all.json)."""

from vllm_metax_tpu import LLM, SamplingParams

# pre-quantized checkpoint (GPTQ or AWQ metadata is auto-detected)
llm = LLM(model="/path/to/llama-3-8b-gptq")
# ... or quantize a bf16 checkpoint on the fly:
llm = LLM(model="/path/to/llama-3-8b", quantization="int8")
# INT8 KV cache on top (beyond the reference, whose fp8-KV path is stubbed):
llm = LLM(model="/path/to/llama-3-8b-gptq", kv_cache_dtype="int8")
print(llm.generate(["test"], SamplingParams(max_tokens=8))[0].outputs[0].text)
