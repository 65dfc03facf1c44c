"""EngineCore: the schedule → execute → update loop.

Analog of vLLM v1's EngineCore (behavior pinned by the reference's
tests/v1/engine/test_engine_core.py). In-process for now; the multi-process
split (API proc ↔ engine proc over zmq) layers on top.
"""

from __future__ import annotations

import time
from typing import Optional

from vllm_metax_tpu.config import EngineConfig
from vllm_metax_tpu.core.request import Request, RequestStatus
from vllm_metax_tpu.core.runner import ModelRunner
from vllm_metax_tpu.core.scheduler import EngineCoreOutput, Scheduler
from vllm_metax_tpu.logger import init_logger
from vllm_metax_tpu.metrics import EngineStats
from vllm_metax_tpu.sample.params import SamplingParams
from vllm_metax_tpu.tracing import RequestTrace, init_tracing

logger = init_logger(__name__)


class EngineCore:
    def __init__(self, config: EngineConfig, params=None, mesh=None):
        self.config = config
        self.runner = ModelRunner(config, params=params, mesh=mesh)
        self.scheduler = Scheduler(
            config.scheduler_config,
            config.cache_config,
            config.model_config.max_model_len,
            speculative_config=config.speculative_config,
            dcp_size=config.parallel_config.decode_context_parallel_size,
        )
        self.stats = EngineStats()
        self.traces: dict[str, RequestTrace] = {}
        # async scheduling: (scheduler_output, runner handle, preapply map)
        # of a launched-but-unresolved decode window
        self._pending: Optional[tuple] = None
        self._async_sched = (
            config.scheduler_config.async_scheduling
            and config.scheduler_config.num_decode_steps > 1
        )
        # host-RAM KV offload tier (core/host_kv_tier.py; ref: swap_blocks
        # + LMCache offloading)
        self.host_tier = None
        if config.cache_config.host_swap_blocks > 0:
            from vllm_metax_tpu.core.host_kv_tier import HostKVTier

            self.host_tier = HostKVTier(config.cache_config.host_swap_blocks)
            for p in self.scheduler.kv_manager.pools:
                p.log_evictions = True
        oc = config.observability_config
        if oc.otlp_traces_endpoint:
            init_tracing(oc.otlp_traces_endpoint)

    def add_request(
        self,
        req_id: str,
        prompt_token_ids: list[int],
        sampling_params: SamplingParams,
        eos_token_id: Optional[int] = None,
        lora_name: Optional[str] = None,
        multi_modal_data: Optional[dict] = None,
    ) -> None:
        if len(prompt_token_ids) >= self.config.model_config.max_model_len:
            raise ValueError(
                f"prompt ({len(prompt_token_ids)} tokens) exceeds max_model_len "
                f"({self.config.model_config.max_model_len})"
            )
        if not prompt_token_ids:
            raise ValueError("empty prompt")
        vocab = self.config.model_config.vocab_size
        # cheap min/max check first — a full list scan per add_request costs
        # measurable host latency on 100k+-token prompts; only collect the
        # offending ids (for the message) once the gate trips
        if not (0 <= min(prompt_token_ids) and max(prompt_token_ids) < vocab):
            bad = [t for t in prompt_token_ids if not 0 <= t < vocab]
            # reject poisoned requests at the door — a bad id must error ONE
            # request, never the engine (ref: tests/v1/shutdown/
            # test_forward_error.py engine-robustness bar)
            raise ValueError(
                f"prompt contains out-of-vocabulary token ids {bad[:5]} "
                f"(vocab_size={vocab})"
            )
        request = Request(
            req_id=req_id,
            prompt_token_ids=list(prompt_token_ids),
            sampling_params=sampling_params,
            eos_token_id=eos_token_id,
            arrival_time=time.time(),
            lora_name=lora_name,
            multi_modal_data=multi_modal_data,
        )
        if self.host_tier is not None:
            # restore spilled prefix pages from host RAM before scheduling,
            # so get_computed_blocks sees them as cached (prefill skips the
            # restored span — one host→device transfer instead of recompute)
            from vllm_metax_tpu.core.host_kv_tier import try_restore

            try_restore(self, request)
        self.scheduler.add_request(
            request
        )
        self.traces[req_id] = RequestTrace(
            req_id, prompt_tokens=len(prompt_token_ids)
        )

    def abort_request(self, req_id: str) -> None:
        self.scheduler.abort_request(req_id)

    # ----------------------------------------------------------- sleep/wake

    def scale_ep(self, new_ep_size: int) -> None:
        """Elastic EP: change the expert-parallel world size live between
        serving bursts (ref: examples/online_serving/elastic_ep/scale.py).
        Outputs are invariant — placement is physical only."""
        if self.has_unfinished_requests():
            raise RuntimeError("cannot rescale EP with unfinished requests")
        self.runner.rescale_ep(new_ep_size)

    def rebalance_experts(self, loads) -> None:
        """EPLB: re-permute expert placement to balance EP rank load
        (parallel/eplb.py; ref: fused_moe.py:1273). loads: (E,) or
        (L_moe, E) per-expert statistics. Placement is semantically
        neutral — outputs are unchanged."""
        self.runner.rebalance_experts(loads)

    def sleep(self, level: int = 1) -> None:
        """Offload/free device memory between serving bursts (RLHF weight
        sync pattern; ref: patched Worker.sleep, device_allocator.py:15)."""
        if self.has_unfinished_requests():
            raise RuntimeError("cannot sleep with unfinished requests")
        self.runner.sleep(level)
        self.scheduler.kv_manager.reset_prefix_cache()

    def wake_up(self) -> None:
        self.runner.wake_up()

    @property
    def is_sleeping(self) -> bool:
        return self.runner.is_sleeping

    def save_sharded_state(self, path: str) -> None:
        from vllm_metax_tpu.weights.sharded_state import save_sharded_state

        save_sharded_state(self.runner.params, path)

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_requests()

    def step(self) -> list[EngineCoreOutput]:
        if self._pending is not None:
            return self._step_pipelined()
        scheduler_output = self.scheduler.schedule()
        if scheduler_output.total_num_scheduled_tokens == 0:
            # nothing schedulable (all waiting on blocks) — shouldn't spin
            if self.scheduler.has_unfinished_requests():
                logger.warning("scheduler produced an empty step with pending work")
            return []
        self._maybe_spill()
        for rid in scheduler_output.num_scheduled_tokens:
            tr = self.traces.get(rid)
            if tr:
                tr.mark_scheduled()
        if self._async_sched and self.runner.can_execute_async(scheduler_output):
            # async scheduling: launch without blocking; the next step()
            # schedules the following window while this one runs on device
            try:
                handle = self.runner.execute_model_async(scheduler_output)
            except Exception as e:  # noqa: BLE001
                return self._error_window(scheduler_output, e)
            pre = self.scheduler.preapply_window(scheduler_output)
            self._pending = (scheduler_output, handle, pre)
            # an abort between steps must not free blocks the in-flight
            # window is writing
            self.scheduler.begin_deferred_free()
            return []
        if (
            self._async_sched
            and scheduler_output.num_decode_steps == 1
            and not scheduler_output.num_scheduled_spec_tokens
            and not self.runner.mtp
            and self.scheduler.can_schedule_ahead_prefill()
        ):
            # async PREFILL overlap: launch this chunk without blocking so
            # the next prefill-only chunk's host build + dispatch hides
            # under its device time (the dominant TTFT term on
            # remote-attached TPUs is the per-chunk host round trip)
            try:
                handle = self.runner.execute_model_async(scheduler_output)
            except Exception as e:  # noqa: BLE001
                return self._error_window(scheduler_output, e)
            pre = self.scheduler.preapply_prefill(scheduler_output)
            self._pending = (scheduler_output, handle, pre)
            self.scheduler.begin_deferred_free()
            return []
        return self._dispatch_sync(scheduler_output)

    def _maybe_spill(self) -> None:
        """Spill freshly evicted prefix-cache pages to the host tier.

        Must run after a schedule() (where evictions happen) and before any
        launch whose KV writes would overwrite the evicted rows."""
        if self.host_tier is None:
            return
        ev = self.scheduler.kv_manager.take_evictions()
        if not ev:
            return
        from vllm_metax_tpu.core.host_kv_tier import spill_evictions

        spill_evictions(self, ev)

    def _error_window(self, so, e) -> list[EngineCoreOutput]:
        # forward-error containment: a failing batch errors the
        # SCHEDULED requests, not the engine — subsequent requests keep
        # serving (ref: tests/v1/shutdown/test_forward_error.py)
        logger.error("model execution failed, erroring batch: %s", e)
        failed = []
        for rid in list(so.num_scheduled_tokens):
            self.scheduler.abort_request(rid)
            self.traces.pop(rid, None)
            failed.append(
                EngineCoreOutput(
                    req_id=rid,
                    new_token_ids=[],
                    finished=True,
                    finish_reason="error",
                    stop_reason=str(e),
                )
            )
        return failed

    def _step_pipelined(self) -> list[EngineCoreOutput]:
        """Resolve the in-flight window, having first (when safe) scheduled
        and launched the NEXT window — the async-scheduling overlap: host
        scheduling + metadata work and the device window run concurrently
        (ref: tests/v1/core/test_async_scheduler.py)."""
        so_prev, h_prev, pre_prev = self._pending
        self._pending = None
        so_next = h_next = pre_next = None
        if self._async_sched and self.scheduler.can_schedule_ahead(so_prev):
            so_next = self.scheduler.schedule()
            self._maybe_spill()  # BEFORE any launch overwrites evicted rows
            for rid in so_next.num_scheduled_tokens:
                tr = self.traces.get(rid)
                if tr:
                    tr.mark_scheduled()
            if (
                so_next.num_decode_steps == so_prev.num_decode_steps
                and tuple(so_next.num_scheduled_tokens)
                == tuple(so_prev.num_scheduled_tokens)
                and self.runner.can_execute_async(so_next)
                and self.runner.is_warm_for(so_next)
            ):
                h_next = self.runner.execute_model_async(so_next)
                pre_next = self.scheduler.preapply_window(so_next)
        elif (
            self._async_sched
            and not self.runner.mtp
            and self.scheduler.can_schedule_ahead_prefill()
        ):
            # prefill-ahead: only prompt-known work (waiting admissions +
            # mid-prefill continuations) — launched under the in-flight step
            so_next = self.scheduler.schedule_prefill_ahead()
            self._maybe_spill()
            if so_next.total_num_scheduled_tokens > 0:
                for rid in so_next.num_scheduled_tokens:
                    tr = self.traces.get(rid)
                    if tr:
                        tr.mark_scheduled()
                h_next = self.runner.execute_model_async(so_next)
                pre_next = self.scheduler.preapply_prefill(so_next)
            else:
                # nothing schedulable after all (e.g. out of blocks):
                # return the drained finished ids and drop the empty step
                self.scheduler.finished_req_ids |= so_next.finished_req_ids
                so_next = None
        try:
            runner_output = self.runner.resolve_async(h_prev)
        except Exception as e:  # noqa: BLE001
            outs = self._error_window(so_prev, e)
            if so_next is not None:
                outs += self._error_window(so_next, e)
            self.scheduler.flush_deferred_free()
            return outs
        # the resolved window was the last possible writer of any blocks
        # deferred at the PREVIOUS resolve — free them now
        self.scheduler.flush_deferred_free()
        if so_next is not None:
            # finishes discovered below must not reuse blocks a launched (or
            # still-to-run) next window writes
            self.scheduler.begin_deferred_free()
        sampled = dict(
            zip(runner_output.req_ids, runner_output.sampled_token_ids)
        )
        outputs = self.scheduler.resolve_window(so_prev, sampled, pre_prev)
        outputs = self._postprocess(so_prev, runner_output, outputs)
        if h_next is not None:
            self._pending = (so_next, h_next, pre_next)
        elif so_next is not None:
            # scheduled but not launchable ahead (cold inputs / mode change):
            # run it synchronously now that the previous window resolved
            outputs = outputs + self._dispatch_sync(so_next)
            self.scheduler.flush_deferred_free()
        return outputs

    def _dispatch_sync(self, scheduler_output) -> list[EngineCoreOutput]:
        try:
            runner_output = self.runner.execute_model(scheduler_output)
        except Exception as e:  # noqa: BLE001
            return self._error_window(scheduler_output, e)
        sampled = dict(zip(runner_output.req_ids, runner_output.sampled_token_ids))
        outputs = self.scheduler.update_from_output(scheduler_output, sampled)
        return self._postprocess(scheduler_output, runner_output, outputs)

    def _postprocess(
        self, scheduler_output, runner_output, outputs
    ) -> list[EngineCoreOutput]:
        # MTP/EAGLE drafts from the runner's draft head become the next
        # step's speculative tokens (scheduler external_drafts mode)
        for rid, drafts in runner_output.draft_tokens.items():
            req = self.scheduler.requests.get(rid)
            if req is not None and req.status == RequestStatus.RUNNING:
                req.spec_token_ids = list(drafts)
                req.spec_token_parents = list(
                    runner_output.draft_parents.get(rid, ())
                )
        # attach logprobs
        lp_by_req = dict(zip(runner_output.req_ids, runner_output.logprobs))
        for out in outputs:
            lp = lp_by_req.get(out.req_id)
            if lp is not None and out.new_token_ids:
                out.new_logprobs = lp[: len(out.new_token_ids)]
            plp = runner_output.prompt_logprobs.get(out.req_id)
            if plp is not None:
                out.prompt_logprobs = plp
        for out in outputs:
            tr = self.traces.get(out.req_id)
            if tr:
                if out.new_token_ids:
                    tr.mark_first_token()
                    tr.completion_tokens += len(out.new_token_ids)
                if out.finished:
                    tr.finish()
                    self.stats.record_finished(tr, out.finish_reason)
                    del self.traces[out.req_id]
        self.stats.record_step(
            num_tokens=scheduler_output.total_num_scheduled_tokens,
            num_reqs=scheduler_output.num_reqs,
            num_generated=sum(len(o.new_token_ids) for o in outputs),
            kv_usage=self.scheduler.kv_manager.usage,
        )
        return outputs
