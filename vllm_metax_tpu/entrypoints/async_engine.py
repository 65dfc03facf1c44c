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
    prompt_logprobs: Optional[list] = None


@dataclass
class _Pending:
    req_id: str
    prompt_token_ids: list[int]
    sampling_params: SamplingParams
    out_queue: "queue.Queue[StreamItem]" = field(default_factory=queue.Queue)
    multi_modal_data: object = None


class EnginePool:
    """Data-parallel engine replicas over disjoint device slices with
    round-robin dispatch (the reference's DP serving surface: per-DP-rank
    device env + front-end LB, patch/maca_visible_device.py:28 and the
    internal/external LB test suites)."""

    def __init__(
        self, config: EngineConfig, dp_size: int = 1, backend: str = "thread"
    ):
        pc = config.parallel_config
        per_rank = (
            pc.tensor_parallel_size
            * pc.expert_parallel_size
            * pc.pipeline_parallel_size
            * pc.decode_context_parallel_size
        )
        self._rr = Counter()
        if backend == "process":
            # per-replica engine PROCESSES: schedulers/detokenizers never
            # share a GIL, and each process owns its device slice (the
            # reference's per-DP-rank isolation, maca_visible_device.py:28)
            self.engines = [
                ProcEngine(config, r, per_rank) for r in range(dp_size)
            ]
            return
        import jax

        from vllm_metax_tpu.parallel.mesh import make_tp_mesh

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

    def pick(self):
        """Least-loaded engine (falls back to round robin on ties)."""
        loads = [
            e.engine.scheduler.get_num_unfinished_requests()
            if isinstance(e, AsyncEngine)
            else e.inflight
            for e in self.engines
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
        self._embed_jobs: "queue.Queue" = queue.Queue()
        self._streams: dict[str, _Pending] = {}
        self._aborted: set[str] = set()
        self._counter = Counter()
        self._shutdown = False
        self._wake = threading.Event()
        # multi-host SPMD serving: host 0 broadcasts each loop tick's new
        # requests/aborts; followers apply them and step in lockstep (the
        # broadcast collective is the rendezvous — parallel/multihost.py)
        self._multihost = config.parallel_config.num_hosts > 1
        self._mh_new: list[dict] = []
        self._mh_aborts: list[str] = []
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ----------------------------------------------------------- client API

    def submit(
        self,
        prompt_token_ids: list[int],
        sampling_params: SamplingParams,
        eos_token_id: Optional[int] = None,
        req_id: Optional[str] = None,
        multi_modal_data=None,
    ) -> tuple[str, "queue.Queue[StreamItem]"]:
        req_id = req_id or f"req-{next(self._counter)}"
        pending = _Pending(req_id, list(prompt_token_ids), sampling_params,
                           multi_modal_data=multi_modal_data)
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
        multi_modal_data=None,
    ) -> Iterator[StreamItem]:
        req_id, q = self.submit(prompt_token_ids, sampling_params,
                                eos_token_id,
                                multi_modal_data=multi_modal_data)
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

    def embed(self, prompt_token_ids, pooling: str = "last", timeout=600.0):
        """Pooled hidden-state embeddings, executed ON the engine thread
        between steps (the runner is single-threaded state)."""
        out: "queue.Queue" = queue.Queue()
        self._embed_jobs.put((list(prompt_token_ids), pooling, out))
        self._wake.set()
        res = out.get(timeout=timeout)
        if isinstance(res, Exception):
            raise res
        return res

    def get_stats(self) -> dict:
        s = self.engine.stats.snapshot()
        s["num_waiting"] = self.engine.scheduler.get_num_unfinished_requests()
        s["num_preemptions"] = self.engine.scheduler.num_preemptions
        s["prefix_cached_tokens"] = self.engine.scheduler.num_prefix_cached_tokens
        return s

    def prometheus_lines(self, model_name: str, engine: str = "0") -> list:
        """Per-request latency histograms (TTFT/TPOT/queue/e2e) in
        Prometheus text form (tests/v1/test_metrics_reader.py:19-31)."""
        return self.engine.stats.render_prometheus(model_name, engine)

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
                    multi_modal_data=p.multi_modal_data,
                )
                self._streams[p.req_id] = p
                if self._multihost:
                    # mm data is host-0-encoded; the skeleton ships text
                    # requests only (mm + multihost: future work)
                    self._mh_new.append(
                        {
                            "req_id": p.req_id,
                            "prompt_token_ids": p.prompt_token_ids,
                            "sampling_params": p.sampling_params,
                            "eos_token_id": getattr(p, "eos_token_id", None),
                        }
                    )
            except ValueError as e:
                p.out_queue.put(
                    StreamItem([], True, finish_reason="error", stop_reason=str(e))
                )

    def _drain_embeds(self) -> None:
        while True:
            try:
                toks_list, pooling, out = self._embed_jobs.get_nowait()
            except queue.Empty:
                return
            try:
                import numpy as np

                from vllm_metax_tpu.evaluation.ppl import _prefill_hidden

                vecs = []
                for toks in toks_list:
                    hidden = np.asarray(
                        _prefill_hidden(self.engine.runner, list(toks))
                    )
                    vecs.append(
                        hidden.mean(axis=0) if pooling == "mean"
                        else hidden[-1]
                    )
                out.put(vecs)
            except Exception as e:  # surface to the caller
                out.put(e)

    def _multihost_sync(self) -> None:
        """Rendezvous with the other hosts: host 0 ships this tick's intake;
        followers apply it so every host's scheduler sees the identical
        request stream (the deterministic-SPMD serving contract)."""
        from vllm_metax_tpu.parallel import multihost

        if multihost.is_primary():
            payload = {"reqs": self._mh_new, "aborts": self._mh_aborts}
            self._mh_new, self._mh_aborts = [], []
            multihost.broadcast_pyobj(payload)
        else:
            payload = multihost.broadcast_pyobj()
            for r in payload["reqs"]:
                try:
                    self.engine.add_request(
                        r["req_id"], r["prompt_token_ids"],
                        r["sampling_params"], r.get("eos_token_id"),
                    )
                except ValueError:
                    pass  # host 0 already rejected/errored it
            for rid in payload["aborts"]:
                self.engine.abort_request(rid)

    def _loop(self) -> None:
        while not self._shutdown:
            self._drain_intake()
            self._drain_embeds()
            for rid in list(self._aborted):
                self._aborted.discard(rid)
                self.engine.abort_request(rid)
                p = self._streams.pop(rid, None)
                if p:
                    p.out_queue.put(StreamItem([], True, finish_reason="abort"))
                if self._multihost:
                    self._mh_aborts.append(rid)
            if self._multihost:
                self._multihost_sync()
            if not self.engine.has_unfinished_requests():
                if self._multihost:
                    continue  # the broadcast collective paces the idle loop
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
                        out.prompt_logprobs,
                    )
                )
                if out.finished:
                    del self._streams[out.req_id]


# ------------------------------------------------------------ process DP

def _engine_worker(config, dp_rank: int, per_rank: int, req_q, out_q):
    """Engine replica process body (spawn-safe top-level function).

    The reference isolates each DP engine in its own process with its own
    device visibility (patch/maca_visible_device.py:28); the TPU analog
    restricts this process's chips via TPU_VISIBLE_CHIPS before jax loads,
    so scheduling/detokenization of replicas never share a GIL."""
    import os

    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "tpu" not in plat and "cpu" in plat:
        pass  # test mode: CPU client per process
    elif "TPU_VISIBLE_CHIPS" not in os.environ:
        chips = ",".join(
            str(c) for c in range(dp_rank * per_rank, (dp_rank + 1) * per_rank)
        )
        os.environ["TPU_VISIBLE_CHIPS"] = chips
        os.environ.setdefault("TPU_CHIPS_PER_PROCESS_BOUNDS", "1,1,1")
    import jax

    if plat:
        # env alone loses to an axon/site-pinned platform — force via config
        jax.config.update("jax_platforms", plat.split(",")[0])

    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.parallel.mesh import make_tp_mesh

    pc = config.parallel_config
    mesh = (
        make_tp_mesh(
            pc.tensor_parallel_size,
            pc.expert_parallel_size,
            devices=jax.devices()[:per_rank],
            pp_size=pc.pipeline_parallel_size,
            dcp_size=pc.decode_context_parallel_size,
        )
        if per_rank > 1
        else None
    )
    engine = EngineCore(config, mesh=mesh)
    import queue as _queue

    live = True
    while live:
        # drain control messages: block briefly when idle, poll when busy
        first = True
        while True:
            try:
                if first and not engine.has_unfinished_requests():
                    msg = req_q.get(timeout=0.05)
                else:
                    msg = req_q.get_nowait()
            except _queue.Empty:
                break
            first = False
            kind = msg[0]
            if kind == "add":
                _, rid, prompt, params, eos, mmd = (
                    msg if len(msg) == 6 else (*msg, None)
                )
                try:
                    engine.add_request(rid, prompt, params, eos,
                                       multi_modal_data=mmd)
                except ValueError as e:
                    out_q.put((rid, [], True, "error", str(e), None))
            elif kind == "abort":
                engine.abort_request(msg[1])
                out_q.put((msg[1], [], True, "abort", None, None))
            elif kind == "stop":
                live = False
                break
        if live and engine.has_unfinished_requests():
            for out in engine.step():
                out_q.put(
                    (
                        out.req_id,
                        out.new_token_ids,
                        out.finished,
                        out.finish_reason,
                        out.stop_reason,
                        out.new_logprobs,
                    )
                )
    out_q.put(("__exit__", [], True, None, None, None))


class ProcEngine:
    """AsyncEngine-shaped facade over an engine replica PROCESS. Used by
    EnginePool(backend='process') — the reference's per-DP-rank engine
    process isolation (no shared GIL between replica schedulers)."""

    def __init__(self, config: EngineConfig, dp_rank: int, per_rank: int):
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        self._req_q = ctx.Queue()
        self._out_q = ctx.Queue()
        self._proc = ctx.Process(
            target=_engine_worker,
            args=(config, dp_rank, per_rank, self._req_q, self._out_q),
            daemon=True,
        )
        self._proc.start()
        self._streams: dict[str, queue.Queue] = {}
        self._lock = threading.Lock()
        self._counter = Counter()
        self.inflight = 0
        self._collector = threading.Thread(target=self._collect, daemon=True)
        self._collector.start()

    def _collect(self) -> None:
        while True:
            rid, toks, fin, reason, stop, lps = self._out_q.get()
            if rid == "__exit__":
                return
            with self._lock:
                q = self._streams.get(rid)
                if fin:
                    self._streams.pop(rid, None)
                    self.inflight = max(0, self.inflight - 1)
            if q is not None:
                q.put(StreamItem(toks, fin, reason, stop, lps))

    def submit(self, prompt_token_ids, sampling_params, eos_token_id=None,
               req_id=None, multi_modal_data=None):
        req_id = req_id or f"req-{next(self._counter)}"
        out: "queue.Queue[StreamItem]" = queue.Queue()
        with self._lock:
            self._streams[req_id] = out
            self.inflight += 1
        self._req_q.put(
            ("add", req_id, list(prompt_token_ids), sampling_params,
             eos_token_id, multi_modal_data)
        )
        return req_id, out

    def stream(self, prompt_token_ids, sampling_params, eos_token_id=None,
               timeout: float = 600.0, multi_modal_data=None):
        req_id, q = self.submit(prompt_token_ids, sampling_params,
                                eos_token_id,
                                multi_modal_data=multi_modal_data)
        try:
            while True:
                item = q.get(timeout=timeout)
                yield item
                if item.finished:
                    return
        finally:
            self.abort(req_id)

    def abort(self, req_id: str) -> None:
        with self._lock:
            known = req_id in self._streams
        if known:
            self._req_q.put(("abort", req_id))

    def get_stats(self) -> dict:
        return {"num_waiting": self.inflight}

    def shutdown(self) -> None:
        self._req_q.put(("stop",))
        self._proc.join(timeout=10)
        if self._proc.is_alive():
            self._proc.terminate()
