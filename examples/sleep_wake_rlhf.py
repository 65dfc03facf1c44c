"""Sleep/wake weight offload between serving bursts — the RLHF weight-sync
pattern (analog of the reference's CuMem sleep-mode allocator,
vllm_metax/device_allocator/cumem.py)."""

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(model="/path/to/model")
print(llm.generate(["warmup"], SamplingParams(max_tokens=8))[0].outputs[0].text)

llm.sleep(level=1)  # weights to host, KV freed — HBM released for training
# ... the trainer updates weights elsewhere ...
llm.wake_up()  # weights re-materialized on device
print(llm.generate(["resumed"], SamplingParams(max_tokens=8))[0].outputs[0].text)
