"""Environment diagnostics CLI (ref: vllm_collect_env, collect_env.py /
pyproject.toml:41). Run: python -m vllm_metax_tpu.collect_env"""

from __future__ import annotations

import importlib
import json
import platform
import sys


def collect() -> dict:
    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "machine": platform.machine(),
    }
    for mod in ("jax", "jaxlib", "numpy", "transformers", "safetensors", "torch"):
        try:
            info[mod] = importlib.import_module(mod).__version__
        except Exception:
            info[mod] = None
    try:
        import jax

        devs = jax.devices()
        info["devices"] = [
            {"kind": d.device_kind, "platform": d.platform, "id": d.id}
            for d in devs
        ]
        info["default_backend"] = jax.default_backend()
    except Exception as e:
        info["devices"] = f"unavailable: {e}"
    try:
        import psutil

        vm = psutil.virtual_memory()
        info["host_memory_gb"] = round(vm.total / 2**30, 1)
        info["cpu_count"] = psutil.cpu_count()
    except Exception:
        pass
    import vllm_metax_tpu

    info["vllm_metax_tpu"] = getattr(vllm_metax_tpu, "__version__", "dev")
    return info


def main() -> None:
    print(json.dumps(collect(), indent=2))


if __name__ == "__main__":
    main()
