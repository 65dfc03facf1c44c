"""Engine statistics (basis for the Prometheus exporter; the reference exposes
vllm:* metrics verified by tests/v1/test_metrics_reader.py:19-31, including
per-request latency HISTOGRAMS: TTFT, TPOT, queue time, e2e latency)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

# prometheus-style bucket ladders (upper bounds, seconds)
_TTFT_BUCKETS = (
    0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1, 0.25, 0.5, 0.75, 1.0,
    2.5, 5.0, 7.5, 10.0, 20.0, 40.0, 80.0,
)
_TPOT_BUCKETS = (
    0.001, 0.0025, 0.005, 0.0075, 0.01, 0.015, 0.02, 0.025, 0.03, 0.04,
    0.05, 0.075, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5, 0.75, 1.0, 2.5,
)
_E2E_BUCKETS = (
    0.3, 0.5, 0.8, 1.0, 1.5, 2.0, 2.5, 5.0, 10.0, 15.0, 20.0, 30.0, 40.0,
    50.0, 60.0, 120.0, 240.0, 480.0, 960.0,
)


class Histogram:
    """Minimal prometheus histogram: cumulative bucket counts + sum/count."""

    def __init__(self, buckets: tuple):
        self.buckets = tuple(buckets)
        self.counts = [0] * (len(self.buckets) + 1)  # +Inf tail
        self.sum = 0.0
        self.count = 0

    def observe(self, value: float) -> None:
        self.sum += value
        self.count += 1
        for i, ub in enumerate(self.buckets):
            if value <= ub:
                self.counts[i] += 1
                return
        self.counts[-1] += 1

    def render(self, name: str, labels: str) -> list[str]:
        lines = [f"# TYPE {name} histogram"]
        cum = 0
        for i, ub in enumerate(self.buckets):
            cum += self.counts[i]
            lines.append(f'{name}_bucket{{{labels},le="{ub}"}} {cum}')
        cum += self.counts[-1]
        lines.append(f'{name}_bucket{{{labels},le="+Inf"}} {cum}')
        lines.append(f"{name}_sum{{{labels}}} {self.sum}")
        lines.append(f"{name}_count{{{labels}}} {self.count}")
        return lines


@dataclass
class EngineStats:
    num_steps: int = 0
    num_scheduled_tokens: int = 0
    num_generated_tokens: int = 0
    num_requests_finished: int = 0
    kv_cache_usage: float = 0.0
    start_time: float = field(default_factory=time.time)
    ttft: Histogram = field(default_factory=lambda: Histogram(_TTFT_BUCKETS))
    tpot: Histogram = field(default_factory=lambda: Histogram(_TPOT_BUCKETS))
    queue_time: Histogram = field(
        default_factory=lambda: Histogram(_E2E_BUCKETS)
    )
    e2e_latency: Histogram = field(
        default_factory=lambda: Histogram(_E2E_BUCKETS)
    )
    finished_by_reason: dict = field(default_factory=dict)

    def record_step(
        self, num_tokens: int, num_reqs: int, num_generated: int, kv_usage: float
    ) -> None:
        self.num_steps += 1
        self.num_scheduled_tokens += num_tokens
        self.num_generated_tokens += num_generated
        self.kv_cache_usage = kv_usage

    def record_finished(self, trace, finish_reason: str | None) -> None:
        """Fold a finished request's RequestTrace into the latency
        histograms (the reference's per-request metrics surface,
        tests/v1/test_metrics_reader.py:19-31)."""
        self.num_requests_finished += 1
        reason = finish_reason or "stop"
        self.finished_by_reason[reason] = (
            self.finished_by_reason.get(reason, 0) + 1
        )
        end = trace.finished or time.monotonic()
        if trace.scheduled is not None:
            self.queue_time.observe(trace.scheduled - trace.arrival)
        if trace.first_token is not None:
            self.ttft.observe(trace.first_token - trace.arrival)
            n_out = trace.completion_tokens
            if n_out > 1:
                self.tpot.observe(
                    (end - trace.first_token) / (n_out - 1)
                )
        self.e2e_latency.observe(end - trace.arrival)

    def snapshot(self) -> dict:
        elapsed = max(time.time() - self.start_time, 1e-9)
        return {
            "num_steps": self.num_steps,
            "num_scheduled_tokens": self.num_scheduled_tokens,
            "num_generated_tokens": self.num_generated_tokens,
            "num_requests_finished": self.num_requests_finished,
            "generation_tokens_per_s": self.num_generated_tokens / elapsed,
            "kv_cache_usage": self.kv_cache_usage,
        }

    def render_prometheus(self, model_name: str, engine: str = "0") -> list:
        labels = f'model_name="{model_name}",engine="{engine}"'
        lines = []
        for name, hist in [
            ("vllm:time_to_first_token_seconds", self.ttft),
            ("vllm:time_per_output_token_seconds", self.tpot),
            ("vllm:request_queue_time_seconds", self.queue_time),
            ("vllm:e2e_request_latency_seconds", self.e2e_latency),
        ]:
            lines.extend(hist.render(name, labels))
        lines.append("# TYPE vllm:request_success_total counter")
        for reason, cnt in sorted(self.finished_by_reason.items()):
            lines.append(
                f'vllm:request_success_total{{{labels},'
                f'finished_reason="{reason}"}} {cnt}'
            )
        return lines
