"""Small shared helpers (ref analog: vllm_metax/utils/__init__.py)."""

from __future__ import annotations

import bisect
import functools
import time
from collections.abc import Sequence


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


def pick_bucket(buckets: Sequence[int], n: int) -> int:
    """Smallest bucket >= n (buckets sorted ascending); last bucket if none."""
    i = bisect.bisect_left(buckets, n)
    return buckets[min(i, len(buckets) - 1)]


def default_token_buckets(max_tokens: int, min_bucket: int = 16) -> list[int]:
    """Padded num_token tiers — the TPU replacement for CUDA graph capture
    sizes: each bucket is one compiled XLA program."""
    buckets = []
    b = min_bucket
    while b < max_tokens:
        buckets.append(b)
        b *= 2
    buckets.append(max_tokens)
    return buckets


class Counter:
    def __init__(self, start: int = 0):
        self._v = start

    def __next__(self) -> int:
        v = self._v
        self._v += 1
        return v


@functools.cache
def is_tpu_platform() -> bool:
    import jax

    return jax.devices()[0].platform not in ("cpu", "gpu")


class StopWatch:
    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.elapsed = time.perf_counter() - self.start
