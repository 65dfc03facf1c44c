"""Host-RAM KV tier: revisit-TTFT measurement (VERDICT r4 item 6 done-bar:
a second wave of evicted-prefix prompts must prefill much faster than
recompute).

Flagship-geometry engine with a DELIBERATELY small device pool: wave A
prefills long prompts, wave B churns the pool (evicting+spilling A's
pages), then wave A re-sends. With the tier on, the revisit restores
pages host->device and prefill computes only the tails.

MEASURED 2026-08-20 on the axon-TUNNELED v5e: tier ON revisit 18.4s vs
0.47s recompute — the tunnel moves device<->host at ~30MB/s, so shipping
~600MB of pages LOSES to recomputing 3.6k tokens on a 200+TFLOP chip.
The mechanics are correct (56 spilled / 72 restored, token-exact); on a
co-located host (PCIe-class ~16GB/s) the same restore is ~40ms, a >10x
win over recompute — the reference's LMCache tier makes the same
bandwidth assumption. Keep host_swap_blocks=0 on remote-attached chips."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("METAX_TPU_W4A8", "1")

import numpy as np  # noqa: E402

from vllm_metax_tpu.config import (  # noqa: E402
    CacheConfig,
    EngineConfig,
    LoadConfig,
    ModelConfig,
    QuantizationConfig,
    SchedulerConfig,
)
from vllm_metax_tpu.core.engine import EngineCore  # noqa: E402
from vllm_metax_tpu.sample.params import SamplingParams  # noqa: E402


def build(host_swap_blocks):
    mc = ModelConfig(
        model="llama-3-8b-dummy",
        architecture="LlamaForCausalLM",
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        vocab_size=128256,
        max_position_embeddings=8192,
        max_model_len=2048,
        rope_theta=500000.0,
        dtype="bfloat16",
    )
    return EngineCore(EngineConfig(
        model_config=mc,
        # pool fits ONE wave with little slack -> wave B evicts wave A
        cache_config=CacheConfig(block_size=128, num_blocks=40,
                                 kv_cache_dtype="int8",
                                 host_swap_blocks=host_swap_blocks),
        scheduler_config=SchedulerConfig(
            max_num_seqs=8, max_num_batched_tokens=4096, num_decode_steps=8,
        ),
        load_config=LoadConfig(load_format="dummy", seed=0),
        quant_config=QuantizationConfig(
            method="gptq", bits=4, group_size=128, lm_head_quantized=True
        ),
    ))


def wave(eng, prompts, tag):
    t0 = time.perf_counter()
    first = {}
    for i, p in enumerate(prompts):
        eng.add_request(f"{tag}{i}", p,
                        SamplingParams(max_tokens=2, temperature=0.0))
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.new_token_ids and o.req_id not in first:
                first[o.req_id] = time.perf_counter() - t0
    return max(first.values())  # wave prefill completion time


def main():
    rng = np.random.default_rng(0)
    wave_a = [rng.integers(1, 100000, size=896).tolist() for _ in range(4)]
    wave_b = [rng.integers(1, 100000, size=896).tolist() for _ in range(4)]

    for tier_blocks, name in ((256, "tier ON "), (0, "tier OFF")):
        eng = build(tier_blocks)
        wave(eng, wave_a, "warm")  # compile warmup with the same shapes
        wave(eng, wave_b, "warmb")
        t_first = wave(eng, wave_a, "a")
        wave(eng, wave_b, "b")  # churn: evict (and spill) wave A
        t_revisit = wave(eng, wave_a, "a2")
        extra = ""
        if eng.host_tier is not None:
            extra = (f" spilled={eng.host_tier.spilled}"
                     f" restored={eng.host_tier.restored}")
        print(f"{name}: first {t_first:6.2f}s  revisit {t_revisit:6.2f}s "
              f"({t_first / max(t_revisit, 1e-9):.2f}x){extra}",
              flush=True)
        # drop device memory explicitly before the next engine build
        try:
            eng.scheduler.kv_manager.reset_prefix_cache()
            eng.runner.sleep(level=2)
        except Exception:  # noqa: BLE001
            pass
        del eng
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
