"""Engine statistics (basis for the Prometheus exporter; the reference exposes
vllm:* metrics verified by tests/v1/test_metrics_reader.py:19-31)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class EngineStats:
    num_steps: int = 0
    num_scheduled_tokens: int = 0
    num_generated_tokens: int = 0
    num_requests_finished: int = 0
    kv_cache_usage: float = 0.0
    start_time: float = field(default_factory=time.time)

    def record_step(
        self, num_tokens: int, num_reqs: int, num_generated: int, kv_usage: float
    ) -> None:
        self.num_steps += 1
        self.num_scheduled_tokens += num_tokens
        self.num_generated_tokens += num_generated
        self.kv_cache_usage = kv_usage

    def snapshot(self) -> dict:
        elapsed = max(time.time() - self.start_time, 1e-9)
        return {
            "num_steps": self.num_steps,
            "num_scheduled_tokens": self.num_scheduled_tokens,
            "num_generated_tokens": self.num_generated_tokens,
            "generation_tokens_per_s": self.num_generated_tokens / elapsed,
            "kv_cache_usage": self.kv_cache_usage,
        }
