"""Continuous-batching scheduler with chunked prefill.

Behavioral model: vLLM v1's Scheduler, whose surface the reference pins via
tests/v1/core/test_scheduler.py (token budgets, chunked prefill, prefix-cache
interaction, preemption-by-recompute). TPU addition: the schedule is later
padded to compile buckets by the runner — the scheduler itself stays
shape-agnostic.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from typing import Optional

from vllm_metax_tpu.config import CacheConfig, SchedulerConfig
from vllm_metax_tpu.core.kv_cache_manager import KVCacheManager
from vllm_metax_tpu.core.request import Request, RequestStatus
from vllm_metax_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclass
class NewReqData:
    req_id: str
    prompt_token_ids: list[int]
    block_ids: list[int]
    num_computed_tokens: int
    sampling_params: object
    eos_token_id: object = None
    lora_name: object = None
    multi_modal_data: object = None


@dataclass
class CachedReqData:
    req_id: str
    new_block_ids: list[int]
    num_computed_tokens: int
    resumed_from_preemption: bool = False
    new_token_ids: list[int] = field(default_factory=list)  # for resumed reqs


@dataclass
class SchedulerOutput:
    scheduled_new_reqs: list[NewReqData] = field(default_factory=list)
    scheduled_cached_reqs: list[CachedReqData] = field(default_factory=list)
    num_scheduled_tokens: dict[str, int] = field(default_factory=dict)
    total_num_scheduled_tokens: int = 0
    num_scheduled_spec_tokens: dict[str, list[int]] = field(default_factory=dict)
    # tree drafts: parent index per spec token (-1 = committed root);
    # absent key = linear chain (ref: v1/attention/backends/tree_attn.py)
    spec_token_parents: dict[str, list[int]] = field(default_factory=dict)
    finished_req_ids: set[str] = field(default_factory=set)
    preempted_req_ids: set[str] = field(default_factory=set)
    # >1 → the runner may run this many decode steps on-device before
    # returning (KV slots for all steps are pre-allocated); the TPU analog of
    # amortizing per-step host latency, cf. the reference's CUDA-graph replay
    # loop (platform.py:425-426)
    num_decode_steps: int = 1

    @property
    def num_reqs(self) -> int:
        return len(self.num_scheduled_tokens)


@dataclass
class EngineCoreOutput:
    req_id: str
    new_token_ids: list[int]
    finished: bool
    finish_reason: Optional[str] = None
    stop_reason: Optional[str] = None
    new_logprobs: Optional[list[dict[int, float]]] = None
    # [None, {tok: lp}, ...] per prompt position; delivered once, with the
    # first output token after prefill (SamplingParams.prompt_logprobs)
    prompt_logprobs: Optional[list] = None


class Scheduler:
    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        max_model_len: int,
        speculative_config=None,
        dcp_size: int = 1,
    ):
        self.config = scheduler_config
        self.max_model_len = max_model_len
        self.proposer = None
        # MTP/EAGLE-style drafts are produced by the RUNNER (model draft
        # head) and fed back via req.spec_token_ids between steps; the
        # scheduler only schedules the verify rows.
        self.external_drafts = False
        if speculative_config is not None and speculative_config.enabled:
            if speculative_config.method == "ngram":
                from vllm_metax_tpu.spec_decode import NgramProposer

                self.proposer = NgramProposer(
                    speculative_config.prompt_lookup_min,
                    speculative_config.prompt_lookup_max,
                    speculative_config.num_speculative_tokens,
                )
            elif speculative_config.method in ("mtp", "eagle"):
                self.external_drafts = True
            else:
                raise ValueError(
                    f"unsupported speculative method {speculative_config.method!r}"
                )
        self.kv_manager = KVCacheManager(
            cache_config.num_blocks,
            cache_config.block_size,
            cache_config.enable_prefix_caching,
            dcp_size=dcp_size,
        )
        self.block_size = cache_config.block_size
        self.waiting: deque[Request] = deque()
        self.running: list[Request] = []
        self.requests: dict[str, Request] = {}
        self.finished_req_ids: set[str] = set()
        # async scheduling: requests whose blocks must outlive an in-flight
        # speculatively-scheduled window (freed via flush_deferred_free)
        self._defer_free = False
        self._deferred_free_reqs: list[Request] = []
        # stats
        self.num_preemptions = 0
        self.num_prefix_cached_tokens = 0

    # ------------------------------------------------------------- intake

    def add_request(self, request: Request) -> None:
        request.arrival_time = request.arrival_time or time.time()
        self.requests[request.req_id] = request
        self.waiting.append(request)

    def abort_request(self, req_id: str) -> None:
        req = self.requests.get(req_id)
        if req is None or req.status.finished:
            return
        req.status = RequestStatus.FINISHED_ABORTED
        if req in self.running:
            self.running.remove(req)
            self._free_or_defer(req)
        else:
            try:
                self.waiting.remove(req)
            except ValueError:
                pass
            if req.num_computed_tokens:
                self._free_or_defer(req)
        self.finished_req_ids.add(req_id)

    def _free_or_defer(self, req: Request) -> None:
        if self._defer_free:
            self._deferred_free_reqs.append(req)
        else:
            self.kv_manager.free(req)

    def has_unfinished_requests(self) -> bool:
        return bool(self.waiting or self.running)

    def get_num_unfinished_requests(self) -> int:
        return len(self.waiting) + len(self.running)

    # ------------------------------------------------------------- schedule

    def schedule(self) -> SchedulerOutput:
        out = SchedulerOutput()
        out.finished_req_ids, self.finished_req_ids = self.finished_req_ids, set()
        token_budget = self.config.max_num_batched_tokens

        # Speculative decoding: propose ngram drafts for decode-ready
        # requests (each then schedules 1 + num_drafts tokens; the runner
        # verifies them in one forward and the update truncates rejects).
        if self.proposer is not None:
            for req in self.running:
                req.spec_token_ids = []
                if (
                    req.status == RequestStatus.RUNNING
                    and req.num_tokens - req.num_computed_tokens == 1
                    and req.num_output_tokens > 0
                    and not getattr(
                        req.sampling_params, "_guided_token_choices", None
                    )
                    # Any FSM constraint (guided_regex/guided_json) must also
                    # skip drafts: the runner builds per-row allow-lists from
                    # the pre-draft FSM state, so accepted draft positions
                    # would be constrained by a stale state.
                    and not getattr(req.sampling_params, "_guided_fsm", None)
                ):
                    room = self.max_model_len - req.num_tokens - 1
                    drafts = self.proposer.propose(req.all_token_ids)[: max(room, 0)]
                    req.spec_token_ids = drafts
                    if drafts:
                        out.num_scheduled_spec_tokens[req.req_id] = list(drafts)
        elif self.external_drafts:
            # drafts were set on the request by the engine from the runner's
            # MTP head output after the previous step
            for req in self.running:
                drafts = req.spec_token_ids
                ok = (
                    req.status == RequestStatus.RUNNING
                    and req.num_tokens - req.num_computed_tokens == 1
                    and req.num_output_tokens > 0
                    and not getattr(
                        req.sampling_params, "_guided_token_choices", None
                    )
                    and not getattr(req.sampling_params, "_guided_fsm", None)
                )
                if not ok:
                    req.spec_token_ids = []
                    req.spec_token_parents = []
                    continue
                room = self.max_model_len - req.num_tokens - 1
                req.spec_token_ids = drafts = list(drafts)[: max(room, 0)]
                parents = list(req.spec_token_parents)[: len(drafts)]
                req.spec_token_parents = parents
                if drafts:
                    out.num_scheduled_spec_tokens[req.req_id] = list(drafts)
                    if parents and parents != list(range(-1, len(drafts) - 1)):
                        out.spec_token_parents[req.req_id] = parents

        # Multi-step decode: when every running request is decode-ready and
        # nothing is waiting, reserve KV slots for M steps so the runner can
        # loop on-device without per-step host round-trips.
        multi = 1
        if self.config.num_decode_steps > 1 and not self.waiting and self.running:
            reqs = [r for r in self.running if r.status == RequestStatus.RUNNING]
            if reqs and all(
                r.num_tokens_with_spec + r.inflight_tokens
                - r.num_computed_tokens - r.inflight_computed == 1
                for r in reqs
            ):
                room = min(
                    self.max_model_len - r.num_tokens - r.inflight_tokens + 1
                    for r in reqs
                )
                # cap by the LONGEST-living request's remaining output budget
                # (shorter requests stop writing KV mid-window via the
                # runner's per-request write-end mask, so they don't need
                # slots past their budget — reserving the full window per
                # request caused preemption storms at block_size=128: the
                # phantom lookahead block × 128 requests exceeded the pool)
                rem_max = max(
                    (r.sampling_params.max_tokens or (1 << 30))
                    - r.num_output_tokens
                    - r.inflight_tokens
                    for r in reqs
                )
                multi = max(1, min(self.config.num_decode_steps, room, rem_max))
        out.num_decode_steps = multi

        # 1. running requests first (decode or in-flight chunked prefill)
        preempted: list[Request] = []
        for req in list(self.running):
            if token_budget <= 0:
                break
            if req.status != RequestStatus.RUNNING:
                continue  # preempted as a victim earlier in this pass
            num_new = (
                req.num_tokens_with_spec + req.inflight_tokens
                - req.num_computed_tokens - req.inflight_computed
            )
            num_new = min(num_new, token_budget)
            if self.config.long_prefill_token_threshold > 0:
                num_new = min(num_new, self.config.long_prefill_token_threshold)
            if num_new <= 0:
                continue
            # reserve slots for the extra on-device steps as well — but only
            # up to this request's own remaining output budget (the runner
            # masks its KV writes past that; see write-end mask)
            if multi > 1:
                rem_r = (
                    req.sampling_params.max_tokens or (1 << 30)
                ) - req.num_output_tokens - req.inflight_tokens
                num_slots = num_new + min(multi, max(rem_r, 1)) - 1
            else:
                num_slots = num_new
            while True:
                new_blocks = self.kv_manager.allocate_slots(req, num_slots)
                if new_blocks is not None:
                    break
                # out of blocks: preempt the lowest-priority running request
                victim = self.running[-1]
                self._preempt(victim)
                preempted.append(victim)
                if victim is req:
                    break
            if req.status == RequestStatus.PREEMPTED:
                continue
            out.scheduled_cached_reqs.append(
                CachedReqData(
                    req_id=req.req_id,
                    new_block_ids=new_blocks.block_ids,
                    # in-flight window tokens count as computed for the
                    # runner's view (device-side positions already advanced)
                    num_computed_tokens=req.num_computed_tokens
                    + req.inflight_tokens,
                )
            )
            out.num_scheduled_tokens[req.req_id] = num_new
            token_budget -= num_new

        # 2. admit waiting requests (incl. resumed preempted ones)
        while self.waiting and token_budget > 0:
            if len(self.running) >= self.config.max_num_seqs:
                break
            req = self.waiting[0]
            resumed = req.status == RequestStatus.PREEMPTED

            skip_cache = (
                req.sampling_params is not None
                and req.sampling_params.prompt_logprobs is not None
            )
            if resumed or skip_cache or not self.kv_manager.enable_caching:
                # mm requests participate too: their hash chains are seeded
                # with a pixel-content digest (kv_cache_manager.mm_hash_seed).
                # prompt_logprobs requests bypass prefix-cache hits: cached
                # positions would never be forwarded, leaving holes in the
                # per-position logprob list (vLLM makes the same trade)
                computed_blocks, num_computed = None, req.num_computed_tokens
            else:
                computed_blocks, num_computed = self.kv_manager.get_computed_blocks(
                    req
                )
                self.num_prefix_cached_tokens += num_computed

            # get_computed_blocks never covers the full prompt, so num_new >= 1
            num_new = req.num_tokens - num_computed
            if not self.config.enable_chunked_prefill and num_new > token_budget:
                break
            num_new = min(num_new, token_budget)
            if self.config.long_prefill_token_threshold > 0:
                num_new = min(num_new, self.config.long_prefill_token_threshold)

            req.num_computed_tokens = num_computed
            new_blocks = self.kv_manager.allocate_slots(
                req, num_new, computed_blocks
            )
            if new_blocks is None:
                break  # no space; keep waiting
            self.waiting.popleft()
            self.running.append(req)
            req.status = RequestStatus.RUNNING
            if resumed:
                out.scheduled_cached_reqs.append(
                    CachedReqData(
                        req_id=req.req_id,
                        new_block_ids=self.kv_manager.get_block_ids(req.req_id),
                        num_computed_tokens=num_computed,
                        resumed_from_preemption=True,
                        new_token_ids=req.all_token_ids[num_computed:],
                    )
                )
            else:
                out.scheduled_new_reqs.append(
                    NewReqData(
                        req_id=req.req_id,
                        prompt_token_ids=req.prompt_token_ids,
                        block_ids=self.kv_manager.get_block_ids(req.req_id),
                        num_computed_tokens=num_computed,
                        sampling_params=req.sampling_params,
                        eos_token_id=req.eos_token_id,
                        lora_name=req.lora_name,
                        multi_modal_data=req.multi_modal_data,
                    )
                )
            out.num_scheduled_tokens[req.req_id] = num_new
            token_budget -= num_new

        out.preempted_req_ids = {r.req_id for r in preempted}
        out.total_num_scheduled_tokens = sum(out.num_scheduled_tokens.values())
        return out

    def _preempt(self, req: Request) -> None:
        self.running.remove(req)
        self.kv_manager.free(req)
        req.status = RequestStatus.PREEMPTED
        req.num_computed_tokens = 0
        req.num_preemptions += 1
        self.num_preemptions += 1
        self.waiting.appendleft(req)
        logger.debug("preempted request %s", req.req_id)

    # ------------------------------------------------- async scheduling

    def can_schedule_ahead(self, so_prev: SchedulerOutput) -> bool:
        """True when the NEXT decode window can be scheduled while `so_prev`
        is still executing: same request set, everything decode-ready, the
        window length will match (warm device inputs), and enough free
        blocks that no preemption can occur (a preemption would free blocks
        the in-flight window is writing)."""
        from vllm_metax_tpu.utils import cdiv

        if self.waiting or not self.running:
            return False
        if self.proposer is not None or self.external_drafts:
            return False
        m = so_prev.num_decode_steps
        if self.config.num_decode_steps <= 1 or m <= 1:
            return False
        prev_ids = set(so_prev.num_scheduled_tokens)
        if {r.req_id for r in self.running} != prev_ids:
            return False
        km = self.kv_manager
        need = [0] * km.dcp_size
        room_min = 1 << 30
        rem_vals = []
        for req in self.running:
            if req.status != RequestStatus.RUNNING or req.spec_token_ids:
                return False
            sp = req.sampling_params
            if (
                getattr(sp, "_guided_fsm", None)
                or getattr(sp, "_guided_token_choices", None)
                or sp.prompt_logprobs is not None
            ):
                return False
            mt = sp.max_tokens if sp.max_tokens is not None else 1 << 30
            rem = mt - req.num_output_tokens - req.inflight_tokens
            room = (
                self.max_model_len - req.num_tokens - req.inflight_tokens + 1
            )
            if rem <= 0 or room <= 1:
                return False  # request finishes in the in-flight window
            rem_vals.append(rem)
            room_min = min(room_min, room)
            total = req.num_computed_tokens + req.inflight_computed + m
            cur = len(km.req_blocks.get(req.req_id, []))
            for pos in range(cur, cdiv(total, self.block_size)):
                need[pos % km.dcp_size] += 1
        # the next window must be the SAME length m (warm fingerprint)
        if min(self.config.num_decode_steps, room_min, max(rem_vals)) != m:
            return False
        return all(
            need[d] <= km.pools[d].get_num_free_blocks()
            for d in range(km.dcp_size)
        )

    def preapply_window(self, so: SchedulerOutput) -> dict[str, int]:
        """Mark a launched-but-unresolved decode window's tokens as in
        flight, so the NEXT window can be scheduled (slot allocation, length
        budgets) while the device still runs this one — the overlap the
        reference pins in tests/v1/core/test_async_scheduler.py. Token
        VALUES stay unknown; resolve_window() applies the real results."""
        m = so.num_decode_steps
        rec: dict[str, int] = {}
        for rid in so.num_scheduled_tokens:
            req = self.requests.get(rid)
            if req is None or req.status != RequestStatus.RUNNING:
                continue
            sp = req.sampling_params
            mt = sp.max_tokens if sp.max_tokens is not None else 1 << 30
            room = min(
                mt - req.num_output_tokens - req.inflight_tokens,
                self.max_model_len - req.num_tokens - req.inflight_tokens,
            )
            opt = max(min(m, room), 0)
            req.inflight_tokens += opt
            req.inflight_computed += opt
            rec[rid] = (opt, opt)
        return rec

    def can_schedule_ahead_prefill(self) -> bool:
        """There is prefill work whose inputs don't depend on any in-flight
        step: fresh waiting admissions or mid-prefill continuations (their
        inputs are prompt tokens, host-known)."""
        if self.proposer is not None or self.external_drafts:
            return False  # draft bookkeeping is not preapply-aware
        if any(r.status == RequestStatus.WAITING for r in self.waiting):
            return True
        return any(
            r.status == RequestStatus.RUNNING
            and (
                r.num_tokens + r.inflight_tokens
                - r.num_computed_tokens - r.inflight_computed
            ) > 1
            for r in self.running
        )

    def schedule_prefill_ahead(self) -> SchedulerOutput:
        """PREFILL-ONLY schedule while a previous step is still in flight —
        the async prefill overlap (host metadata build + dispatch of the
        next chunk hides under the in-flight chunk's device time; ref
        behavior: tests/v1/core/test_async_scheduler.py generalized to
        prefill). Only mid-prefill continuations and fresh waiting
        admissions are eligible (inputs = prompt tokens); requests whose
        next input is an in-flight sampled token are skipped, and
        allocation failures skip instead of preempting (a victim's blocks
        may be mid-write on device)."""
        out = SchedulerOutput()
        out.finished_req_ids, self.finished_req_ids = (
            self.finished_req_ids, set(),
        )
        token_budget = self.config.max_num_batched_tokens

        for req in list(self.running):
            if token_budget <= 0:
                break
            if req.status != RequestStatus.RUNNING or req.spec_token_ids:
                continue
            remaining = (
                req.num_tokens + req.inflight_tokens
                - req.num_computed_tokens - req.inflight_computed
            )
            if remaining <= 1:
                continue  # decode-ready / pending-completion — sync path
            num_new = min(remaining, token_budget)
            if self.config.long_prefill_token_threshold > 0:
                num_new = min(num_new, self.config.long_prefill_token_threshold)
            new_blocks = self.kv_manager.allocate_slots(req, num_new)
            if new_blocks is None:
                continue  # never preempt in an ahead schedule
            out.scheduled_cached_reqs.append(
                CachedReqData(
                    req_id=req.req_id,
                    new_block_ids=new_blocks.block_ids,
                    num_computed_tokens=req.num_computed_tokens
                    + req.inflight_computed,
                )
            )
            out.num_scheduled_tokens[req.req_id] = num_new
            token_budget -= num_new

        while self.waiting and token_budget > 0:
            if len(self.running) >= self.config.max_num_seqs:
                break
            req = self.waiting[0]
            if req.status == RequestStatus.PREEMPTED:
                break  # resumed requests re-enter via the sync path
            skip_cache = (
                req.sampling_params is not None
                and req.sampling_params.prompt_logprobs is not None
            )
            if skip_cache or not self.kv_manager.enable_caching:
                computed_blocks, num_computed = None, req.num_computed_tokens
            else:
                computed_blocks, num_computed = (
                    self.kv_manager.get_computed_blocks(req)
                )
                self.num_prefix_cached_tokens += num_computed
            num_new = req.num_tokens - num_computed
            if (
                not self.config.enable_chunked_prefill
                and num_new > token_budget
            ):
                break
            num_new = min(num_new, token_budget)
            if self.config.long_prefill_token_threshold > 0:
                num_new = min(num_new, self.config.long_prefill_token_threshold)
            req.num_computed_tokens = num_computed
            new_blocks = self.kv_manager.allocate_slots(
                req, num_new, computed_blocks
            )
            if new_blocks is None:
                break
            self.waiting.popleft()
            self.running.append(req)
            req.status = RequestStatus.RUNNING
            out.scheduled_new_reqs.append(
                NewReqData(
                    req_id=req.req_id,
                    prompt_token_ids=req.prompt_token_ids,
                    block_ids=self.kv_manager.get_block_ids(req.req_id),
                    num_computed_tokens=num_computed,
                    sampling_params=req.sampling_params,
                    eos_token_id=req.eos_token_id,
                    lora_name=req.lora_name,
                    multi_modal_data=req.multi_modal_data,
                )
            )
            out.num_scheduled_tokens[req.req_id] = num_new
            token_budget -= num_new

        out.total_num_scheduled_tokens = sum(
            out.num_scheduled_tokens.values()
        )
        return out

    def preapply_prefill(self, so: SchedulerOutput) -> dict[str, tuple]:
        """Mark a launched prefill/mixed step's scheduled tokens as
        computed-in-flight (no outputs assumed — completions resolve
        normally). Lets the NEXT prefill-only step be scheduled while this
        one runs (async prefill overlap)."""
        rec: dict[str, tuple] = {}
        for rid, n in so.num_scheduled_tokens.items():
            req = self.requests.get(rid)
            if req is None or req.status != RequestStatus.RUNNING:
                continue
            req.inflight_computed += n
            rec[rid] = (0, n)
        return rec

    def resolve_window(
        self,
        so: SchedulerOutput,
        sampled: dict[str, list[int]],
        preapplied: dict[str, int],
    ) -> list[EngineCoreOutput]:
        """Retire a preapplied window: drop its in-flight marks, then run the
        normal output update (true tokens append at the list tail — in-flight
        marks never entered output_token_ids, so ordering is preserved even
        with a later window already launched)."""
        for rid, rec in preapplied.items():
            out_n, comp_n = rec
            req = self.requests.get(rid)
            if req is not None:
                req.inflight_tokens = max(req.inflight_tokens - out_n, 0)
                req.inflight_computed = max(
                    req.inflight_computed - comp_n, 0
                )
        return self.update_from_output(so, sampled)

    def begin_deferred_free(self) -> None:
        """While a speculatively-scheduled window is in flight, finished
        requests' blocks must not be reused (the device still writes them);
        _finish queues them until flush_deferred_free()."""
        self._defer_free = True

    def flush_deferred_free(self) -> None:
        self._defer_free = False
        for req in self._deferred_free_reqs:
            self.kv_manager.free(req)
        self._deferred_free_reqs.clear()

    # ------------------------------------------------------------- update

    def update_from_output(
        self,
        scheduler_output: SchedulerOutput,
        sampled_tokens: dict[str, list[int]],
    ) -> list[EngineCoreOutput]:
        """Advance request state with the model's sampled tokens.

        sampled_tokens maps req_id → accepted new token ids (empty for a
        partial-prefill step)."""
        outputs: list[EngineCoreOutput] = []
        for req_id, num_scheduled in scheduler_output.num_scheduled_tokens.items():
            req = self.requests.get(req_id)
            if req is None or req.status != RequestStatus.RUNNING:
                continue
            # draft rows only become real context if accepted (accounted for
            # through the emitted-token count below)
            num_draft = len(
                scheduler_output.num_scheduled_spec_tokens.get(req_id, ())
            )
            req.spec_token_ids = []
            req.spec_token_parents = []
            req.num_computed_tokens += num_scheduled - num_draft
            new_tokens = sampled_tokens.get(req_id, [])
            finished = False
            emitted: list[int] = []
            # A sampled token is only valid once the whole context has been
            # computed (partial chunked-prefill steps produce none).
            if req.num_computed_tokens >= req.num_tokens and new_tokens:
                sp = req.sampling_params
                if (
                    len(new_tokens) > 1
                    and (sp.ignore_eos or req.eos_token_id is None)
                    and not sp.stop_token_ids
                ):
                    # bulk fast path (multi-step windows): only the length
                    # caps can fire — O(1) instead of per-token check_stop
                    # (16k calls per 128x128 window)
                    mt = sp.max_tokens if sp.max_tokens is not None else 1 << 30
                    room = min(
                        mt - req.num_output_tokens,
                        self.max_model_len - req.num_tokens,
                    )
                    emitted = list(new_tokens[: max(room, 0)])
                    req.output_token_ids.extend(emitted)
                    finished = req.check_stop(self.max_model_len)
                else:
                    for tok in new_tokens:
                        req.append_output_token(tok)
                        emitted.append(tok)
                        finished = req.check_stop(self.max_model_len)
                        if finished:
                            break
                # With spec decode, accepted tokens beyond the first already
                # had their KV computed this step; account for them.
                req.num_computed_tokens += len(emitted) - 1
            self.kv_manager.cache_full_blocks(req, req.num_computed_tokens)
            if finished:
                self._finish(req)
            if emitted or finished:
                outputs.append(
                    EngineCoreOutput(
                        req_id=req_id,
                        new_token_ids=emitted,
                        finished=finished,
                        finish_reason=(
                            None
                            if not finished
                            else (
                                "length"
                                if req.status == RequestStatus.FINISHED_LENGTH_CAPPED
                                else "stop"
                            )
                        ),
                        stop_reason=req.stop_reason,
                    )
                )
        return outputs

    def _finish(self, req: Request) -> None:
        if req in self.running:
            self.running.remove(req)
        self._free_or_defer(req)
        self.finished_req_ids.add(req.req_id)
