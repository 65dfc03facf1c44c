"""HF safetensors checkpoint reading.

Covers plain + sharded (index.json) checkpoints, incl. GPTQ/AWQ quantized
tensor names. (Reference analog: vLLM's weight loader driven by the plugin's
quant configs, quant_config/gptq.py:27-45.)
"""

from __future__ import annotations

import json
import os

import numpy as np


class CheckpointReader:
    """Lazy reader over one or more .safetensors files in a directory.

    A single-file .gguf path returns a GGUFCheckpointReader instead (same
    has/get/names surface, tensors dequantized to dense on read —
    weights/gguf.py); __init__ is skipped for the foreign class."""

    def __new__(cls, path: str):
        if path.endswith(".gguf") and os.path.isfile(path):
            from vllm_metax_tpu.weights.gguf import GGUFCheckpointReader

            return GGUFCheckpointReader(path)
        return super().__new__(cls)

    def __init__(self, path: str):
        self.path = path
        self._name_to_file: dict[str, str] = {}
        index = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(index):
            with open(index) as f:
                weight_map = json.load(f)["weight_map"]
            for name, fname in weight_map.items():
                self._name_to_file[name] = os.path.join(path, fname)
        else:
            import glob

            files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
            if not files:
                raise FileNotFoundError(f"no safetensors files under {path}")
            from safetensors import safe_open

            for fname in files:
                with safe_open(fname, framework="numpy") as f:
                    for name in f.keys():
                        self._name_to_file[name] = fname
        self._open_files: dict[str, object] = {}

    def names(self) -> list[str]:
        return list(self._name_to_file)

    def has(self, name: str) -> bool:
        return name in self._name_to_file

    def get(self, name: str) -> np.ndarray:
        from safetensors import safe_open

        fname = self._name_to_file[name]
        if fname not in self._open_files:
            # torch framework handles bf16/fp8 dtypes numpy lacks
            self._open_files[fname] = safe_open(fname, framework="pt")
        t = self._open_files[fname].get_tensor(name)
        import torch

        if t.dtype in (torch.bfloat16, torch.float16):
            return t.to(torch.float32).numpy()
        if t.dtype == torch.float8_e4m3fn:
            import ml_dtypes

            return t.view(torch.uint8).numpy().view(ml_dtypes.float8_e4m3fn)
        return t.numpy()
