"""One-stop decode perf sweep for the flagship bench config.

Runs bench.py's engine across the knob matrix SERIALLY on the real chip and
prints one JSON line per configuration. Designed for the slow axon tunnel:
each configuration is a subprocess with a hard timeout, so a wedged compile
(see memory: block-RMW incident) skips to the next knob instead of hanging
the sweep.

Usage:  python tools/perf/sweep_decode.py [timeout_s_per_config]
"""

import json
import os
import subprocess
import sys

CONFIGS = [
    # name, env overrides
    ("baseline_rows", {}),
    ("kv_block", {"METAX_TPU_KV_COMMIT": "block"}),
    ("nr16", {"METAX_TPU_DECODE_NR": "16"}),
    ("fused_actq", {"METAX_TPU_FUSED_ACT_QUANT": "1"}),
    ("nr16_kvblock", {
        "METAX_TPU_DECODE_NR": "16", "METAX_TPU_KV_COMMIT": "block",
    }),
    ("all_on", {
        "METAX_TPU_DECODE_NR": "16",
        "METAX_TPU_KV_COMMIT": "block",
        "METAX_TPU_FUSED_ACT_QUANT": "1",
    }),
    ("gemm_tile512", {"METAX_TPU_GEMM_TILE_N": "512"}),
    ("gemm_tile128", {"METAX_TPU_GEMM_TILE_N": "128"}),
    ("gemm_kc256", {"METAX_TPU_GEMM_KC": "256"}),
    ("gemm_kc512", {"METAX_TPU_GEMM_KC": "512"}),
]


def main():
    timeout = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    root = os.path.join(os.path.dirname(__file__), "..", "..")
    results = {}
    for name, env in CONFIGS:
        full_env = dict(os.environ, **env)
        try:
            out = subprocess.run(
                [sys.executable, "bench.py"],
                cwd=root,
                env=full_env,
                capture_output=True,
                text=True,
                timeout=timeout,
            )
            line = [
                ln for ln in out.stdout.splitlines() if ln.startswith("{")
            ]
            rec = json.loads(line[-1]) if line else {
                "error": out.stderr.strip().splitlines()[-1:] or "no output"
            }
        except subprocess.TimeoutExpired:
            rec = {"error": f"timeout>{timeout}s (likely compiler hang)"}
        results[name] = rec
        print(json.dumps({"config": name, **rec}), flush=True)
    best = max(
        (r for r in results.values() if "value" in r),
        key=lambda r: r["value"],
        default=None,
    )
    if best:
        print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
