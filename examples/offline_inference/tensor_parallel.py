"""TP/EP over the chip mesh (ref: tests/e2e/test_offline_inference_parallel.py).
Run under a multi-chip slice; for CPU experimentation:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
"""

from vllm_metax_tpu import LLM, SamplingParams

llm = LLM(
    model="/path/to/checkpoint",
    tensor_parallel_size=4,
    expert_parallel_size=2,  # MoE models: experts sharded on the ep axis
)
print(llm.generate(["hi"], SamplingParams(max_tokens=16))[0].outputs[0].text)
