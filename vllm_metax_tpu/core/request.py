"""Request lifecycle state (engine-side).

Analog of vLLM v1's Request, whose behavior the reference pins via its vendored
tests/v1/core/test_scheduler.py + tests/v1/engine/test_engine_core.py.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

from vllm_metax_tpu.sample.params import SamplingParams


class RequestStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    PREEMPTED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()

    @property
    def finished(self) -> bool:
        return self in (
            RequestStatus.FINISHED_STOPPED,
            RequestStatus.FINISHED_LENGTH_CAPPED,
            RequestStatus.FINISHED_ABORTED,
        )


FINISH_REASON = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH_CAPPED: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
}


@dataclass
class Request:
    req_id: str
    prompt_token_ids: list[int]
    sampling_params: SamplingParams
    eos_token_id: Optional[int] = None
    arrival_time: float = 0.0
    lora_name: Optional[str] = None  # LoRA adapter handle (vllm_metax_tpu/lora.py)
    # multimodal inputs (Qwen-VL family): {"pixel_values": np (P, K),
    # "image_grid_thw": [(t, h, w), ...]} — preprocessed patches, in
    # order of appearance in the prompt
    multi_modal_data: Optional[dict] = None

    status: RequestStatus = RequestStatus.WAITING
    output_token_ids: list[int] = field(default_factory=list)
    num_computed_tokens: int = 0
    num_preemptions: int = 0
    stop_reason: Optional[str] = None
    # logprobs accumulated per output token: list of {token_id: logprob}
    logprobs: Optional[list[dict[int, float]]] = None
    # spec decode bookkeeping. spec_token_parents (same length) encodes a
    # draft TREE: parent index into spec_token_ids, -1 = the committed root
    # token; empty = linear chain. Parents must be topologically ordered
    # (parents[i] < i) so prefix truncation keeps a valid tree.
    spec_token_ids: list[int] = field(default_factory=list)
    spec_token_parents: list[int] = field(default_factory=list)
    # Async scheduling (scheduler.preapply_window/preapply_prefill):
    # `inflight_tokens` counts OUTPUT tokens a launched-but-unresolved step
    # will emit (length budgets); `inflight_computed` counts KV/compute
    # positions it will advance (slot allocation, chunk continuation).
    # Decode windows bump both by the window length; prefill chunks bump
    # only the computed side (their outputs are prompt recomputation).
    # resolve_window decrements both before the normal output update.
    # Mirrors the overlap pinned by tests/v1/core/test_async_scheduler.py.
    inflight_tokens: int = 0
    inflight_computed: int = 0

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_token_ids)

    @property
    def num_tokens(self) -> int:
        """Prompt + generated tokens currently needing KV slots."""
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    @property
    def num_tokens_with_spec(self) -> int:
        return self.num_tokens + len(self.spec_token_ids)

    @property
    def all_token_ids(self) -> list[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def max_total_tokens(self) -> int:
        mt = self.sampling_params.max_tokens
        if mt is None:
            return 1 << 30
        return self.num_prompt_tokens + mt

    def append_output_token(self, token_id: int) -> None:
        self.output_token_ids.append(token_id)

    def check_stop(self, max_model_len: int) -> bool:
        """Update status if the request should finish. Returns True if so."""
        sp = self.sampling_params
        max_tokens = sp.max_tokens if sp.max_tokens is not None else 1 << 30
        if self.num_output_tokens >= max_tokens:
            self.status = RequestStatus.FINISHED_LENGTH_CAPPED
            return True
        if self.num_tokens >= max_model_len:
            self.status = RequestStatus.FINISHED_LENGTH_CAPPED
            return True
        if self.num_output_tokens < sp.min_tokens:
            return False
        if self.output_token_ids:
            last = self.output_token_ids[-1]
            if not sp.ignore_eos and self.eos_token_id is not None and (
                last == self.eos_token_id
            ):
                self.status = RequestStatus.FINISHED_STOPPED
                return True
            if last in sp.stop_token_ids:
                self.status = RequestStatus.FINISHED_STOPPED
                self.stop_reason = f"stop_token:{last}"
                return True
        return False
