"""Aggregate the last profile_step trace by FULL op name (fusion.N) to find
the specific heavy fusions, so they can be looked up in the dumped HLO."""

import glob
import gzip
import json
import sys
from collections import defaultdict

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_step"
files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
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
args_of = {}
for ev in evs:
    if ev.get("ph") != "X" or "dur" not in ev or ev.get("pid") not in dev_pids:
        continue
    key = ev.get("name", "")[:100]
    if key == "while" or key.startswith("jit_") or key.startswith("cond"):
        continue
    by_op[key] += ev["dur"] / 1e3
    n_op[key] += 1
    if key not in args_of:
        args_of[key] = ev.get("args", {})
for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
    extra = ""
    a = args_of.get(k, {})
    for f in ("long_name", "tf_op", "source", "shape"):
        if a.get(f):
            extra += f" | {f}={str(a[f])[:160]}"
    print(f"{v:9.3f}ms  x{n_op[k]:6d}  {k}{extra}")
