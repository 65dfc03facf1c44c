"""LoRA adapters over a QUANTIZED base model.

Reference analog: examples/offline_inference/lora_with_quantization_inference.py
— adapters compose with GPTQ/AWQ bases because the low-rank delta is added
AFTER the quantized base matmul (layers/linear.py), so any base layout
works. Also shows the round-5 adapter breadth: lm_head + embedding
adapters and (opt-in) per-expert MoE adapters.

Usage: python lora_with_quantization.py <gptq_checkpoint> <adapter_dir>
"""

import sys

from vllm_metax_tpu import LLM, SamplingParams
from vllm_metax_tpu.lora import LoRARequest


def main():
    base, adapter = sys.argv[1], sys.argv[2]
    llm = LLM(
        model=base,               # GPTQ/AWQ checkpoint, or quantization="gptq"
        enable_lora=True,
        max_loras=4,
        max_lora_rank=16,
        # enable_lora_experts=True,  # per-expert MoE adapter banks (opt-in)
    )
    sp = SamplingParams(max_tokens=48, temperature=0.0)
    prompts = ["The fastest way to learn a language is"]

    base_out = llm.generate(prompts, sp)[0].outputs[0].text
    lora_out = llm.generate(
        prompts, sp, lora_request=LoRARequest("my-adapter", 1, adapter)
    )[0].outputs[0].text
    print("base :", base_out)
    print("lora :", lora_out)


if __name__ == "__main__":
    main()
