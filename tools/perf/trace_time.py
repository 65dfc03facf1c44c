"""Profiler-based device timing helper for perf probes.

block_until_ready wall times lie through the axon tunnel (see bench.py /
STATUS.md) — the only truthful clock is the on-device trace. `device_time`
runs a thunk under jax.profiler and returns total device ms across TPU pids.
"""

import glob
import gzip
import json
import os
import shutil
from collections import defaultdict

import jax


def device_time(thunk, trace_dir="/tmp/jaxtrace_probe", by_op=False):
    """Run thunk() under the profiler; return total device-op ms (and
    optionally a per-op breakdown dict)."""
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    thunk()
    jax.profiler.stop_trace()
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise RuntimeError("no trace written")
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
    ops = defaultdict(float)
    total = 0.0
    for ev in evs:
        if ev.get("ph") != "X" or "dur" not in ev or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        key = name.split(".")[0][:60]
        if key == "while" or key.startswith("jit_"):
            continue
        ops[key] += ev["dur"] / 1e3
        total += ev["dur"] / 1e3
    if by_op:
        return total, dict(sorted(ops.items(), key=lambda kv: -kv[1]))
    return total
