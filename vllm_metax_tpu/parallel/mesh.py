"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's process-group + MCCL machinery
(vllm_metax/patch/distributed/pynccl_wrapper.py): one jax.sharding.Mesh whose
axes express TP/DP/EP; XLA emits the ICI/DCN collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

TP_AXIS = "tp"
DP_AXIS = "dp"


def make_tp_mesh(tp_size: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < tp_size:
        raise ValueError(
            f"tensor_parallel_size={tp_size} but only {len(devices)} devices"
        )
    return Mesh(np.asarray(devices[:tp_size]).reshape(tp_size), (TP_AXIS,))


def make_mesh(tp_size: int = 1, dp_size: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = tp_size * dp_size
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def filter_specs(specs, params):
    """Prune a spec tree to the keys actually present in params (a model's
    param_specs covers optional keys like biases/quant layouts)."""
    if isinstance(params, dict):
        return {
            k: filter_specs(specs[k], v) if isinstance(specs, dict) else specs
            for k, v in params.items()
        }
    return specs


def shard_params(params, specs, mesh: Mesh):
    specs = filter_specs(specs, params)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
