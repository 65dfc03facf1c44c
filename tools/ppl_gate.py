"""Quantization-quality gate: PPL deltas on the largest CPU-feasible
synthetic checkpoint.

BASELINE asks for WikiText-2 PPL within 0.1 of the reference INT4
checkpoint (ref: tests/models/language/generation_ppl_test/ppl_utils.py:15).
This environment has no network egress and no real checkpoints on disk
(recorded in STATUS.md), so the closest attainable evidence is the PPL
DELTA of each quantization mode vs the bf16/f32 baseline on a mid-size
random-weight transformer — a numeric-fidelity proxy: the quantization
error path (int4 g128 weights, int8 per-channel, int8 KV) is identical to
what a trained checkpoint would traverse.

Usage: python tools/ppl_gate.py [hidden] [layers]
Prints one PPL row per mode and the relative deltas.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    hidden = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=hidden,
        intermediate_size=hidden * 3,
        num_hidden_layers=layers,
        num_attention_heads=hidden // 64,
        num_key_value_heads=max(1, hidden // 256),
        vocab_size=32000,
        max_position_embeddings=2048,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = LlamaForCausalLM(cfg).eval()
    path = "/tmp/ppl_gate_ckpt"
    m.save_pretrained(path, safe_serialization=True)
    nparams = sum(p.numel() for p in m.parameters())
    print(f"model: hidden={hidden} layers={layers} params={nparams/1e6:.0f}M")

    # Zipf-distributed token stream (natural-text-like unigram stats)
    rng = np.random.default_rng(0)
    toks = (rng.zipf(1.3, size=2048) % 32000).astype(np.int64).tolist()

    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        ModelConfig,
        QuantizationConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.runner import ModelRunner
    from vllm_metax_tpu.evaluation import compute_ppl

    def run(qc, kv_dtype="auto", env=None):
        import os as _os

        for k, v in (env or {}).items():
            _os.environ[k] = v
        config = EngineConfig(
            model_config=ModelConfig.from_pretrained(
                path, dtype="float32", max_model_len=2048
            ),
            cache_config=CacheConfig(
                block_size=16, num_blocks=160, kv_cache_dtype=kv_dtype
            ),
            scheduler_config=SchedulerConfig(
                max_num_seqs=1, max_num_batched_tokens=512
            ),
            load_config=LoadConfig(),
            quant_config=qc,
        )
        runner = ModelRunner(config)
        ppl = compute_ppl(runner, toks)
        for k in (env or {}):
            import os as _os

            _os.environ.pop(k, None)
        return ppl

    base = run(QuantizationConfig())
    rows = [("f32 baseline", base, 0.0)]
    for name, qc, kvd in [
        ("int4 g128 (gptq-style)",
         QuantizationConfig(method="gptq", bits=4, group_size=128), "auto"),
        ("int8 per-channel",
         QuantizationConfig(method="int8", bits=8), "auto"),
        ("int8 KV cache", QuantizationConfig(), "int8"),
        ("int4 + int8 KV",
         QuantizationConfig(method="gptq", bits=4, group_size=128), "int8"),
    ]:
        ppl = run(qc, kvd)
        rows.append((name, ppl, (ppl - base) / base))
    # prefill int8-requant (METAX_TPU_PREFILL_REQUANT): double quantization
    # int4 -> f32 -> int8 per-channel; PPL evaluates full sequences, which
    # is exactly the prefill path this mode rides, so the delta here is the
    # direct quality gate for flipping it on in serving
    ppl = run(
        QuantizationConfig(method="gptq", bits=4, group_size=128),
        "auto",
        env={"METAX_TPU_PREFILL_REQUANT": "1", "METAX_TPU_PREFILL_MIN_T": "1"},
    )
    rows.append(
        ("int4 + prefill-requant-int8", ppl, (ppl - base) / base)
    )
    print(f"{'mode':28s} {'PPL':>12s} {'rel delta':>10s}")
    for name, ppl, delta in rows:
        print(f"{name:28s} {ppl:12.4f} {delta:+10.4%}")


if __name__ == "__main__":
    main()
