"""Sleep/wake for RLHF-style weight refresh (ref: patched Worker.sleep,
patch/device_allocator/device_allocator.py)."""

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(model="/path/to/checkpoint")
print(llm.generate(["a"], SamplingParams(max_tokens=4))[0].outputs[0].text)
llm.sleep(level=1)   # weights offloaded to host, KV freed
# ... train / update weights elsewhere ...
llm.wake_up()        # weights restored, engine serves again
print(llm.generate(["a"], SamplingParams(max_tokens=4))[0].outputs[0].text)
