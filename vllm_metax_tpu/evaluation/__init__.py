from vllm_metax_tpu.evaluation.ppl import compute_ppl, compute_token_logprobs

__all__ = ["compute_ppl", "compute_token_logprobs"]
