"""Multi-LoRA serving (ref: examples/offline_inference/multilora_inference.py
+ lora_with_quantization_inference.py).

Adapters are served BATCHED: one step can mix requests with different
adapters (and no adapter) — the TPU-native mask-and-matmul replaces punica
BGMV (vllm_metax_tpu/lora.py). Works on quantized base weights too.
"""

from vllm_metax_tpu import LLM, SamplingParams
from vllm_metax_tpu.lora import LoRARequest

llm = LLM(
    model="/models/Meta-Llama-3-8B-Instruct",  # plain or GPTQ/AWQ checkpoint
    enable_lora=True,
    max_loras=4,
    max_lora_rank=16,
)

sql = LoRARequest("sql-adapter", 1, "/adapters/sql-lora")
tldr = LoRARequest("tldr-adapter", 2, "/adapters/summarize-lora")

outs = llm.generate(
    [
        "List the top 5 customers by revenue:",  # base model
        "SELECT the top 5 customers by revenue:",  # sql adapter
        "Summarize: the quick brown fox...",  # tldr adapter
    ],
    SamplingParams(max_tokens=48, temperature=0.0),
    lora_request=[None, sql, tldr],
)
for o in outs:
    print(o.outputs[0].text)
