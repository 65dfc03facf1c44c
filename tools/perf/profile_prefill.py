"""Profile the PREFILL phase of the flagship bench config on the real TPU.

Counterpart of profile_step.py (which profiles steady-state decode windows):
enqueues a fresh wave after warmup and traces the chunked-prefill steps
(2048-token buckets), aggregating per-op device time. TTFT lives here —
the decode path has had three rounds of attention; prefill none (VERDICT r3
weak item 3).
"""

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

    def add_wave(tag):
        for i in range(num_reqs):
            engine.add_request(
                f"{tag}{i}",
                rng.integers(1, vocab, size=prompt_len).tolist(),
                SamplingParams(max_tokens=decode_len, temperature=0.8, seed=i),
            )

    # warmup wave compiles every prefill bucket + decode window
    add_wave("w")
    while engine.has_unfinished_requests():
        engine.step()

    add_wave("t")
    trace_dir = "/tmp/jaxtrace_prefill"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    # trace ONLY the prefill steps: stop as soon as every request produced
    # its first token
    first = set()
    steps = 0
    while engine.has_unfinished_requests() and len(first) < num_reqs:
        for o in engine.step():
            if o.new_token_ids:
                first.add(o.req_id)
        steps += 1
    jax.profiler.stop_trace()
    # drain
    while engine.has_unfinished_requests():
        engine.step()

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
            continue
        by_op[key] += ev["dur"] / 1e3
        n_op[key] += 1
        total += ev["dur"] / 1e3
    toks = num_reqs * prompt_len
    print(f"\n== prefill device time over {steps} engine steps "
          f"({toks} prompt tokens) ==")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v:9.3f}ms  x{n_op[k]:6d}  {k}")
    print(f"{total:9.3f}  TOTAL device ms  "
          f"({toks / max(total, 1e-9):.1f} ktok/s-device)")


if __name__ == "__main__":
    main()
