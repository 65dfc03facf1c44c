"""vllm_metax_tpu — a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas serving engine with the capabilities of the
vLLM-MetaX stack (reference: lianjiezh/vLLM-metax — the MetaX GPU plugin plus
the upstream vLLM v1 engine it drives), re-designed TPU-first:

- paged KV cache + continuous batching scheduler (ref: vllm v1 engine surface,
  pinned by reference tests/v1/core/)
- weight-only INT4/INT8 group quantization (GPTQ/AWQ-style; ref:
  vllm_metax/quant_config/{gptq,awq}.py + csrc/quantization/gptq/)
- W8A8 int8 / fp8 (ref: csrc/quantization/cutlass_w8a8/)
- quantized KV cache (int8/fp8 with scales)
- Pallas kernels for the hot ops; XLA collectives over an ICI/DCN mesh for
  TP/EP/DCP (replaces the reference's MCCL shim,
  vllm_metax/patch/distributed/pynccl_wrapper.py)
"""

__version__ = "0.1.0"

__all__ = ["LLM", "SamplingParams", "__version__"]


def __getattr__(name):
    # Lazy so that `import vllm_metax_tpu.ops...` doesn't pull the engine.
    if name == "LLM":
        from vllm_metax_tpu.entrypoints.llm import LLM

        return LLM
    if name == "SamplingParams":
        from vllm_metax_tpu.sample.params import SamplingParams

        return SamplingParams
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
