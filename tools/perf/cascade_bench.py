"""Cascade / shared-prefix decode bench (the VERDICT r3 item-5 'done' bar:
measured tok/s gain on a shared-prefix batch).

64 requests share a 512-token prefix (primed into the prefix cache) and
carry distinct tails; steady-state decode throughput is measured with
METAX_TPU_CASCADE on vs off. The cascade path reads the shared pages ONCE
per step for the whole batch instead of once per request
(ops/attention.py _cascade_prefix_attention; ref: flash_attn.py:1013).

Run on the real TPU: python tools/perf/cascade_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("METAX_TPU_W4A8", "1")

import jax  # noqa: E402
import numpy as np  # noqa: E402

NUM_REQS = 64
PREFIX = 512
TAIL = 32
DECODE = 128


def build_engine():
    from vllm_metax_tpu.config import (
        CacheConfig,
        EngineConfig,
        LoadConfig,
        ModelConfig,
        QuantizationConfig,
        SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore

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
    qc = QuantizationConfig(
        method="gptq", bits=4, group_size=128, lm_head_quantized=True
    )
    need = NUM_REQS * (PREFIX + TAIL + DECODE)
    cache = CacheConfig(
        block_size=128,
        num_blocks=max(300, 5 * need // (4 * 128) + PREFIX // 128 + 2),
        kv_cache_dtype="int8",
    )
    sched = SchedulerConfig(
        max_num_seqs=NUM_REQS,
        max_num_batched_tokens=4096,
        num_decode_steps=DECODE,
    )
    return EngineCore(
        EngineConfig(
            model_config=mc,
            cache_config=cache,
            scheduler_config=sched,
            load_config=LoadConfig(load_format="dummy", seed=0),
            quant_config=qc,
        )
    )


def run_wave(engine, rng, tag):
    from vllm_metax_tpu.sample.params import SamplingParams

    vocab = engine.config.model_config.vocab_size
    shared = rng.integers(1, vocab, size=PREFIX).tolist()
    # prime the shared prefix so the batch actually shares pages
    engine.add_request(
        f"{tag}-prime", shared, SamplingParams(max_tokens=1, temperature=0.0)
    )
    while engine.has_unfinished_requests():
        engine.step()
    for i in range(NUM_REQS):
        tail = rng.integers(1, vocab, size=TAIL).tolist()
        engine.add_request(
            f"{tag}-{i}",
            shared + tail,
            SamplingParams(max_tokens=DECODE, temperature=0.8, seed=i),
        )
    first = set()
    decode_t0 = None
    decode_tokens = 0
    while engine.has_unfinished_requests():
        outs = engine.step()
        now = time.perf_counter()
        if decode_t0 is not None:
            decode_tokens += sum(len(o.new_token_ids) for o in outs)
        for o in outs:
            if o.new_token_ids:
                first.add(o.req_id)
        if decode_t0 is None and len(first) >= NUM_REQS:
            decode_t0 = now
    dt = time.perf_counter() - decode_t0 if decode_t0 else float("nan")
    return decode_tokens / dt if decode_tokens else 0.0


def measure(cascade_on):
    os.environ["METAX_TPU_CASCADE"] = "1" if cascade_on else "0"
    engine = build_engine()
    rng = np.random.default_rng(0)
    run_wave(engine, rng, "warm")  # compile
    rng = np.random.default_rng(1)
    return run_wave(engine, rng, "meas")


def main():
    if len(sys.argv) > 1:  # child: one mode, print the number
        print("RESULT", measure(sys.argv[1] == "on"))
        return
    # parent: one subprocess per mode — the 8B engine's HBM must be freed
    # between modes, and the cleanest release is process exit
    import subprocess

    def child(mode):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            capture_output=True, text=True, timeout=1500,
            env=dict(os.environ),
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT"):
                return float(line.split()[1])
        raise RuntimeError(out.stderr[-1500:])

    off = child("off")
    on = child("on")
    print(
        json.dumps(
            {
                "metric": "cascade_decode_tok_s",
                "shared_prefix": PREFIX,
                "num_reqs": NUM_REQS,
                "cascade_off": round(off, 1),
                "cascade_on": round(on, 1),
                "speedup": round(on / off, 3) if off else None,
            }
        )
    )


if __name__ == "__main__":
    main()
