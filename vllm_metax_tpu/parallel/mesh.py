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
EP_AXIS = "ep"
DP_AXIS = "dp"
PP_AXIS = "pp"
DCP_AXIS = "dcp"


def make_tp_mesh(
    tp_size: int, ep_size: int = 1, devices=None, pp_size: int = 1,
    dcp_size: int = 1,
) -> Mesh:
    """Model-parallel mesh: ("pp", "ep", "dcp", "tp") axes over
    pp*ep*dcp*tp devices (size-1 axes omitted; tp always present).
    Attention and dense layers shard over tp; MoE expert banks over ep;
    pipeline stages (stacked layer banks + the layer-major KV page pool)
    over pp; KV pages of long sequences over dcp (parallel/dcp.py). pp is
    OUTERMOST so stage hops ride the slowest links (DCN-friendly); dcp sits
    next to tp so its softmax psum rides ICI."""
    devices = devices if devices is not None else jax.devices()
    n = tp_size * ep_size * pp_size * dcp_size
    if len(devices) < n:
        raise ValueError(
            f"pp={pp_size} x ep={ep_size} x dcp={dcp_size} x tp={tp_size} "
            f"needs {n} devices, have {len(devices)}"
        )
    shape, names = [], []
    if pp_size > 1:
        shape.append(pp_size)
        names.append(PP_AXIS)
    if ep_size > 1:
        shape.append(ep_size)
        names.append(EP_AXIS)
    if dcp_size > 1:
        shape.append(dcp_size)
        names.append(DCP_AXIS)
    shape.append(tp_size)
    names.append(TP_AXIS)
    return Mesh(np.asarray(devices[:n]).reshape(shape), tuple(names))


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
    if isinstance(params, list) and isinstance(specs, list):
        # per-layer param lists (heterogeneous models, e.g. baichuan_moe)
        return [filter_specs(sp, pv) for sp, pv in zip(specs, params)]
    return specs


def _sanitize_spec(spec: P, shape: tuple, mesh_axes=None) -> P:
    """Drop named axes on size-1 dims (e.g. per-channel quant scales with a
    single group: replication there is exact) and axes the mesh doesn't have
    (e.g. "ep" on a tp-only mesh). Real divisibility errors on larger dims
    still surface from device_put."""
    axes = list(spec) + [None] * (len(shape) - len(spec))

    def keep(i, ax):
        if ax is None or shape[i] == 1:
            return None
        if isinstance(ax, tuple):  # multi-axis dim, e.g. ("pp", "dcp")
            sub = tuple(
                a for a in ax if mesh_axes is None or a in mesh_axes
            )
            return sub if len(sub) > 1 else (sub[0] if sub else None)
        if mesh_axes is not None and ax not in mesh_axes:
            return None
        return ax

    return P(*[keep(i, ax) for i, ax in enumerate(axes)])


def sanitize_specs(specs, params, mesh: Optional[Mesh] = None):
    """filter_specs + per-leaf size-1/unknown-axis dropping; the canonical
    spec tree for both device_put and shard_map in_specs."""
    specs = filter_specs(specs, params)
    mesh_axes = set(mesh.axis_names) if mesh is not None else None
    return jax.tree_util.tree_map(
        lambda a, s: _sanitize_spec(s, a.shape, mesh_axes), params, specs
    )


def shard_params(params, specs, mesh: Mesh):
    specs = sanitize_specs(specs, params, mesh)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
