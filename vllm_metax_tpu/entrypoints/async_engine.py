"""Threaded async engine: continuous batching across concurrent clients.

Analog of vLLM v1's AsyncLLM ↔ EngineCore split (the reference inherits it;
behavior pinned by tests/v1/engine/test_async_llm.py): submitters enqueue
requests, a dedicated engine thread runs the schedule→execute→update loop and
fans results out to per-request queues. In-thread rather than cross-process —
the JAX dispatch already releases the GIL during device work, and one process
per host is the TPU-native deployment shape (SPMD inside).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Iterator, Optional

from vllm_metax_tpu.config import EngineConfig
from vllm_metax_tpu.core.engine import EngineCore
from vllm_metax_tpu.core.scheduler import EngineCoreOutput
from vllm_metax_tpu.logger import init_logger
from vllm_metax_tpu.sample.params import SamplingParams
from vllm_metax_tpu.utils import Counter

logger = init_logger(__name__)


@dataclass
class StreamItem:
    new_token_ids: list[int]
    finished: bool
    finish_reason: Optional[str] = None
    stop_reason: Optional[str] = None
    logprobs: Optional[list] = None


@dataclass
class _Pending:
    req_id: str
    prompt_token_ids: list[int]
    sampling_params: SamplingParams
    out_queue: "queue.Queue[StreamItem]" = field(default_factory=queue.Queue)


class EnginePool:
    """Data-parallel engine replicas over disjoint device slices with
    round-robin dispatch (the reference's DP serving surface: per-DP-rank
    device env + front-end LB, patch/maca_visible_device.py:28 and the
    internal/external LB test suites)."""

    def __init__(self, config: EngineConfig, dp_size: int = 1):
        import jax

        from vllm_metax_tpu.parallel.mesh import make_tp_mesh

        pc = config.parallel_config
        per_rank = (
            pc.tensor_parallel_size
            * pc.expert_parallel_size
            * pc.pipeline_parallel_size
            * pc.decode_context_parallel_size
        )
        devices = jax.devices()
        if dp_size * per_rank > len(devices):
            raise ValueError(
                f"dp={dp_size} x (tp*ep)={per_rank} needs "
                f"{dp_size * per_rank} devices, have {len(devices)}"
            )
        self.engines = []
        for r in range(dp_size):
            slice_devices = devices[r * per_rank : (r + 1) * per_rank]
            mesh = (
                make_tp_mesh(
                    pc.tensor_parallel_size,
                    pc.expert_parallel_size,
                    devices=slice_devices,
                    pp_size=pc.pipeline_parallel_size,
                    dcp_size=pc.decode_context_parallel_size,
                )
                if per_rank > 1 or dp_size > 1
                else None
            )
            self.engines.append(AsyncEngine(config, mesh=mesh))
        self._rr = Counter()

    def pick(self) -> "AsyncEngine":
        """Least-loaded engine (falls back to round robin on ties)."""
        loads = [
            e.engine.scheduler.get_num_unfinished_requests() for e in self.engines
        ]
        m = min(loads)
        candidates = [i for i, l in enumerate(loads) if l == m]
        return self.engines[candidates[next(self._rr) % len(candidates)]]

    def stream(self, *args, **kwargs):
        return self.pick().stream(*args, **kwargs)

    def get_stats(self) -> dict:
        stats = [e.get_stats() for e in self.engines]
        agg = dict(stats[0])
        for s in stats[1:]:
            for k, v in s.items():
                if isinstance(v, (int, float)):
                    agg[k] = agg.get(k, 0) + v
        agg["num_engines"] = len(self.engines)
        return agg

    def shutdown(self) -> None:
        for e in self.engines:
            e.shutdown()


class AsyncEngine:
    """Thread-safe front end over EngineCore."""

    def __init__(self, config: EngineConfig, mesh=None):
        self.config = config
        self.engine = EngineCore(config, mesh=mesh)
        self._intake: "queue.Queue[_Pending]" = queue.Queue()
        self._streams: dict[str, _Pending] = {}
        self._aborted: set[str] = set()
        self._counter = Counter()
        self._shutdown = False
        self._wake = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ----------------------------------------------------------- client API

    def submit(
        self,
        prompt_token_ids: list[int],
        sampling_params: SamplingParams,
        eos_token_id: Optional[int] = None,
        req_id: Optional[str] = None,
    ) -> tuple[str, "queue.Queue[StreamItem]"]:
        req_id = req_id or f"req-{next(self._counter)}"
        pending = _Pending(req_id, list(prompt_token_ids), sampling_params)
        pending.eos_token_id = eos_token_id
        self._intake.put(pending)
        self._wake.set()
        return req_id, pending.out_queue

    def stream(
        self,
        prompt_token_ids: list[int],
        sampling_params: SamplingParams,
        eos_token_id: Optional[int] = None,
        timeout: float = 600.0,
    ) -> Iterator[StreamItem]:
        req_id, q = self.submit(prompt_token_ids, sampling_params, eos_token_id)
        try:
            while True:
                item = q.get(timeout=timeout)
                yield item
                if item.finished:
                    return
        finally:
            # consumer went away mid-stream (client disconnect): free the
            # request (ref behavior: tests/v1/shutdown/test_delete.py)
            self.abort(req_id)

    def abort(self, req_id: str) -> None:
        self._aborted.add(req_id)
        self._wake.set()

    def get_stats(self) -> dict:
        s = self.engine.stats.snapshot()
        s["num_waiting"] = self.engine.scheduler.get_num_unfinished_requests()
        s["num_preemptions"] = self.engine.scheduler.num_preemptions
        s["prefix_cached_tokens"] = self.engine.scheduler.num_prefix_cached_tokens
        return s

    def shutdown(self) -> None:
        self._shutdown = True
        self._wake.set()
        self._thread.join(timeout=5)

    # ----------------------------------------------------------- engine loop

    def _drain_intake(self) -> None:
        while True:
            try:
                p = self._intake.get_nowait()
            except queue.Empty:
                return
            try:
                self.engine.add_request(
                    p.req_id,
                    p.prompt_token_ids,
                    p.sampling_params,
                    getattr(p, "eos_token_id", None),
                )
                self._streams[p.req_id] = p
            except ValueError as e:
                p.out_queue.put(
                    StreamItem([], True, finish_reason="error", stop_reason=str(e))
                )

    def _loop(self) -> None:
        while not self._shutdown:
            self._drain_intake()
            for rid in list(self._aborted):
                self._aborted.discard(rid)
                self.engine.abort_request(rid)
                p = self._streams.pop(rid, None)
                if p:
                    p.out_queue.put(StreamItem([], True, finish_reason="abort"))
            if not self.engine.has_unfinished_requests():
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            outputs: list[EngineCoreOutput] = self.engine.step()
            for out in outputs:
                p = self._streams.get(out.req_id)
                if p is None:
                    continue
                p.out_queue.put(
                    StreamItem(
                        out.new_token_ids,
                        out.finished,
                        out.finish_reason,
                        out.stop_reason,
                        out.new_logprobs,
                    )
                )
                if out.finished:
                    del self._streams[out.req_id]
