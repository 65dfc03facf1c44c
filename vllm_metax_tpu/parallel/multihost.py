"""Multi-host (DCN) bootstrap and request-plane helpers.

TPU-native replacement for the reference's cross-node NCCL bootstrap
(vllm_metax/patch/distributed/pynccl_wrapper.py:28-196 binds the full MCCL
comm surface; vLLM's multi-node DP example wires --node-size/--node-rank/
--master-addr, examples/offline_inference/data_parallel.py:17-28). On TPU
none of that library surface exists: `jax.distributed.initialize` brings up
the coordination service, after which `jax.devices()` is the GLOBAL device
list and one jit program spans hosts — XLA routes collectives over ICI
within a slice and DCN across hosts.

Execution model (multi-controller SPMD, the standard JAX serving shape):
every host runs the SAME engine loop over the SAME request stream; the
scheduler is deterministic, so all hosts issue identical jit calls and the
global arrays stay consistent. Host 0 is the request source — followers
receive each step's new requests/aborts via `broadcast_pyobj` (backed by
jax.experimental.multihost_utils, i.e. the same device fabric — no side
TCP channel to operate).
"""

from __future__ import annotations

import pickle
from typing import Any, Optional

import jax
import numpy as np

_initialized = False


def initialize(
    coordinator_address: str,
    num_hosts: int,
    host_rank: int,
    local_device_ids: Optional[list[int]] = None,
) -> None:
    """Bring up the JAX coordination service (idempotent). Must run before
    the first device query. Replaces the NCCL unique-id broadcast the
    reference inherits (pynccl_wrapper.py ncclGetUniqueId/CommInitRank)."""
    global _initialized
    from jax._src import distributed as _dist

    # NB: jax.process_count() would itself initialize the XLA backend —
    # probe the coordination client directly instead
    if _initialized or _dist.global_state.client is not None:
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_hosts,
        process_id=host_rank,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def is_multihost() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    return jax.process_index() == 0


def host_rank() -> int:
    return jax.process_index()


def broadcast_pyobj(obj: Any = None) -> Any:
    """Broadcast an arbitrary picklable object from host 0 to all hosts.
    Non-primary hosts pass obj=None and receive host 0's value. Two rounds
    (length, then padded payload) because broadcast_one_to_all needs equal
    shapes on every host."""
    from jax.experimental import multihost_utils

    if is_primary():
        payload = np.frombuffer(
            pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL), np.uint8
        )
        n = np.asarray([payload.size], np.int64)
    else:
        payload = np.zeros((0,), np.uint8)
        n = np.zeros((1,), np.int64)
    n = int(multihost_utils.broadcast_one_to_all(n)[0])
    buf = np.zeros((n,), np.uint8)
    if is_primary():
        buf[: payload.size] = payload
    buf = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(np.asarray(buf[:n]).tobytes())


def sync_hosts(name: str = "barrier") -> None:
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
