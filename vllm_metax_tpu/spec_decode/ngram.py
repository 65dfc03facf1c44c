"""N-gram (prompt-lookup) draft proposer.

Reference analog: vLLM v1's NgramProposer (behavior pinned by the reference's
tests/v1/spec_decode/test_ngram.py): find the most recent earlier occurrence
of the context's trailing n-gram (n from prompt_lookup_max down to
prompt_lookup_min) and propose the tokens that followed it.

Because the proposal is a point mass, "sample every position and accept the
longest prefix that reproduces the drafts" is exactly equivalent to the
reference's rejection sampling (rejection_greedy_sample_kernel) — acceptance
probability p(draft) and the first-mismatch token is distributed as the
properly renormalized recovery distribution.
"""

from __future__ import annotations

from typing import Optional


class NgramProposer:
    def __init__(self, min_n: int, max_n: int, num_speculative_tokens: int):
        self.min_n = max(1, min_n)
        self.max_n = max(self.min_n, max_n)
        self.k = num_speculative_tokens

    def propose(self, token_ids: list[int]) -> list[int]:
        """Return up to k draft tokens (possibly empty)."""
        n_total = len(token_ids)
        if n_total < self.min_n + 1:
            return []
        for n in range(min(self.max_n, n_total - 1), self.min_n - 1, -1):
            suffix = token_ids[-n:]
            # scan backwards for the most recent earlier occurrence
            for start in range(n_total - n - 1, -1, -1):
                if token_ids[start : start + n] == suffix:
                    follow = token_ids[start + n : start + n + self.k]
                    if follow:
                        return list(follow)
                    break
        return []
