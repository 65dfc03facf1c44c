"""Request-level tracing (OpenTelemetry spans at the engine layer).

Reference analog: per-request OTLP spans verified by tests/v1/tracing/
test_tracing.py — span per request with queue/prefill/decode timing
attributes. Built against the OTel API only: without an SDK configured the
tracer is a no-op; installing opentelemetry-sdk + an OTLP exporter and
calling init_tracing(endpoint) activates export.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

try:
    from opentelemetry import trace as _trace

    _tracer = _trace.get_tracer("vllm_metax_tpu")
except ImportError:  # pragma: no cover
    _trace = None
    _tracer = None


SPAN_ATTRIBUTES = {
    "queue_time": "gen_ai.latency.time_in_queue",
    "ttft": "gen_ai.latency.time_to_first_token",
    "e2e": "gen_ai.latency.e2e",
    "prompt_tokens": "gen_ai.usage.prompt_tokens",
    "completion_tokens": "gen_ai.usage.completion_tokens",
}


def init_tracing(otlp_endpoint: Optional[str]) -> bool:
    """Install an SDK tracer provider exporting to `otlp_endpoint`.
    Returns False (no-op tracing) when the SDK isn't available."""
    if not otlp_endpoint or _trace is None:
        return False
    try:
        from opentelemetry.sdk.resources import Resource
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import BatchSpanProcessor
        from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (
            OTLPSpanExporter,
        )
    except ImportError:
        return False
    provider = TracerProvider(
        resource=Resource.create({"service.name": "vllm-metax-tpu"})
    )
    provider.add_span_processor(
        BatchSpanProcessor(OTLPSpanExporter(endpoint=otlp_endpoint))
    )
    _trace.set_tracer_provider(provider)
    global _tracer
    _tracer = _trace.get_tracer("vllm_metax_tpu")
    return True


@dataclass
class RequestTrace:
    """Per-request timing record; emitted as one span at finish."""

    req_id: str
    arrival: float = field(default_factory=time.monotonic)
    scheduled: Optional[float] = None
    first_token: Optional[float] = None
    finished: Optional[float] = None
    prompt_tokens: int = 0
    completion_tokens: int = 0

    def mark_scheduled(self) -> None:
        if self.scheduled is None:
            self.scheduled = time.monotonic()

    def mark_first_token(self) -> None:
        if self.first_token is None:
            self.first_token = time.monotonic()

    def finish(self) -> None:
        self.finished = time.monotonic()
        if _tracer is None:
            return
        span = _tracer.start_span("llm_request", start_time=None)
        try:
            span.set_attribute("gen_ai.request.id", self.req_id)
            span.set_attribute(
                SPAN_ATTRIBUTES["prompt_tokens"], self.prompt_tokens
            )
            span.set_attribute(
                SPAN_ATTRIBUTES["completion_tokens"], self.completion_tokens
            )
            if self.scheduled is not None:
                span.set_attribute(
                    SPAN_ATTRIBUTES["queue_time"], self.scheduled - self.arrival
                )
            if self.first_token is not None:
                span.set_attribute(
                    SPAN_ATTRIBUTES["ttft"], self.first_token - self.arrival
                )
            span.set_attribute(
                SPAN_ATTRIBUTES["e2e"], self.finished - self.arrival
            )
        finally:
            span.end()
