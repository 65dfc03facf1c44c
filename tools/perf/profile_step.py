"""Profile the flagship decode step on the real TPU with jax.profiler.

Builds the bench.py engine (Llama-3-8B-arch GPTQ-INT4, dummy weights),
advances it into steady-state decode, traces a few multi-step windows, and
aggregates per-op device time from the trace JSON.

block_until_ready lies through the axon tunnel — only the profiler gives
true device times (see bench.py)."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

import bench  # noqa: E402


def main():
    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    engine, num_reqs, prompt_len, decode_len = bench._build_engine(on_tpu)
    from vllm_metax_tpu.sample.params import SamplingParams

    import numpy as np

    rng = np.random.default_rng(0)
    vocab = engine.config.model_config.vocab_size
    for i in range(num_reqs):
        engine.add_request(
            f"r{i}",
            rng.integers(1, vocab, size=prompt_len).tolist(),
            SamplingParams(max_tokens=decode_len, temperature=0.8, seed=i),
        )
    # warmup wave: run to completion so every executable (prefill buckets,
    # decode window) is compiled, then enqueue a FRESH wave and advance it
    # until every request has prefilled — the traced steps are then pure
    # steady-state decode windows.
    while engine.has_unfinished_requests():
        engine.step()
    for i in range(num_reqs):
        engine.add_request(
            f"t{i}",
            rng.integers(1, vocab, size=prompt_len).tolist(),
            SamplingParams(max_tokens=decode_len, temperature=0.8, seed=i),
        )
    first = set()
    for _ in range(400):
        if len(first) == num_reqs:
            break
        for o in engine.step():
            if o.new_token_ids:
                first.add(o.req_id)

    trace_dir = "/tmp/jaxtrace_step"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    steps = 0
    while engine.has_unfinished_requests() and steps < 4:
        engine.step()
        steps += 1
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace written")
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    evs = trace.get("traceEvents", [])
    dev_pids = {
        ev["pid"]
        for ev in evs
        if ev.get("ph") == "M"
        and ev.get("name") == "process_name"
        and "TPU" in str(ev.get("args", {}).get("name", ""))
    }
    by_op = defaultdict(float)
    n_op = defaultdict(int)
    total = 0.0
    for ev in evs:
        if ev.get("ph") != "X" or "dur" not in ev or ev.get("pid") not in dev_pids:
            continue
        key = ev.get("name", "").split(".")[0][:60]
        if key == "while" or key.startswith("jit_"):
            continue  # outer wrappers double-count their contents
        by_op[key] += ev["dur"] / 1e3  # ms
        n_op[key] += 1
        total += ev["dur"] / 1e3
    print(f"\n== device time over {steps} engine steps (ms) ==")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v / steps:9.3f}  x{n_op[k] // steps:6d}  {k}")
    print(f"{total / steps:9.3f}  TOTAL per engine step")


if __name__ == "__main__":
    main()
