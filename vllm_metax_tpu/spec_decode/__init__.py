"""Speculative decoding (reference analogs: ngram proposer + rejection
sampler — tests/v1/spec_decode/test_ngram.py, patch/sample/rejection_sampler.py,
DeepSeekMTP models/deepseek_mtp.py)."""

from vllm_metax_tpu.spec_decode.ngram import NgramProposer

__all__ = ["NgramProposer"]
