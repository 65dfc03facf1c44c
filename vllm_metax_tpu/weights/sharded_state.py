"""Save/load the post-processed param tree (sharded-state fast restart).

Reference analog: examples/offline_inference/save_sharded_state.py /
load_sharded_state.py — persisting the already-merged, already-quantized,
already-repacked weights so engine restart skips checkpoint parsing and
quantization. TPU note: we save the host copy of the whole tree; TP resharding
happens at load via the normal shard_params path.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "::"


def _flatten(params) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = _SEP.join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        flat[name] = leaf
    return flat


def save_sharded_state(params, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    flat = _flatten(params)
    meta = {}
    arrays = {}
    for name, leaf in flat.items():
        arr = np.asarray(jax.device_get(leaf))
        dtype_name = leaf.dtype.name
        if arr.dtype == np.dtype("bfloat16") or dtype_name in (
            "bfloat16",
            "float8_e4m3fn",
            "float8_e5m2",
        ):
            meta[name] = dtype_name
            arr = arr.view(np.uint8) if arr.dtype.itemsize == 1 else arr.view(
                np.uint16
            )
        arrays[name] = arr
    np.savez(os.path.join(path, "sharded_state.npz"), **arrays)
    with open(os.path.join(path, "sharded_state.json"), "w") as f:
        json.dump({"dtypes": meta}, f)


def load_sharded_state(ref_params_structure, path: str):
    """Rebuild the pytree saved by save_sharded_state. ref_params_structure
    may be None — then a nested dict mirroring the saved names is returned."""
    import ml_dtypes

    data = np.load(os.path.join(path, "sharded_state.npz"))
    with open(os.path.join(path, "sharded_state.json")) as f:
        meta = json.load(f)["dtypes"]
    nested: dict = {}
    for name in data.files:
        arr = data[name]
        if name in meta:
            arr = arr.view(getattr(ml_dtypes, meta[name]))
        node = nested
        parts = name.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return nested
