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
        self.scheduler.add_request(
            Request(
                req_id=req_id,
                prompt_token_ids=list(prompt_token_ids),
                sampling_params=sampling_params,
                eos_token_id=eos_token_id,
                arrival_time=time.time(),
                lora_name=lora_name,
                multi_modal_data=multi_modal_data,
            )
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
        scheduler_output = self.scheduler.schedule()
        if scheduler_output.total_num_scheduled_tokens == 0:
            # nothing schedulable (all waiting on blocks) — shouldn't spin
            if self.scheduler.has_unfinished_requests():
                logger.warning("scheduler produced an empty step with pending work")
            return []
        for rid in scheduler_output.num_scheduled_tokens:
            tr = self.traces.get(rid)
            if tr:
                tr.mark_scheduled()
        try:
            runner_output = self.runner.execute_model(scheduler_output)
        except Exception as e:  # noqa: BLE001
            # forward-error containment: a failing batch errors the
            # SCHEDULED requests, not the engine — subsequent requests keep
            # serving (ref: tests/v1/shutdown/test_forward_error.py)
            logger.error("model execution failed, erroring batch: %s", e)
            failed = []
            for rid in list(scheduler_output.num_scheduled_tokens):
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
        sampled = dict(zip(runner_output.req_ids, runner_output.sampled_token_ids))
        outputs = self.scheduler.update_from_output(scheduler_output, sampled)
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
