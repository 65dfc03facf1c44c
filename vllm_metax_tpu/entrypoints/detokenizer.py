"""Incremental (streaming) detokenization.

Analog of vLLM's IncrementalDetokenizer (behavior pinned by the reference's
tests/v1/engine/test_output_processor.py): text is emitted as the longest
stable decoded prefix — bytes that could still change when the next token
merges into a multi-byte character are held back.
"""

from __future__ import annotations

from typing import Optional


class IncrementalDetokenizer:
    def __init__(self, tokenizer, skip_special_tokens: bool = True,
                 stop: Optional[list[str]] = None):
        self.tokenizer = tokenizer
        self.skip_special = skip_special_tokens
        self.token_ids: list[int] = []
        self.emitted = ""  # text already returned to the caller
        self.stop = stop or []
        self.stopped = False

    def _decode(self) -> str:
        if self.tokenizer is None:  # tokenizer-less checkpoints: id text
            return " ".join(str(t) for t in self.token_ids)
        return self.tokenizer.decode(
            self.token_ids, skip_special_tokens=self.skip_special
        )

    def push(self, new_token_ids: list[int]) -> str:
        """Feed tokens; returns newly-stable text (may be empty)."""
        if self.stopped:
            return ""
        self.token_ids.extend(new_token_ids)
        full = self._decode()
        # hold back a partial UTF-8 replacement char at the tail (incomplete
        # multi-byte sequence mid-stream)
        stable = full[:-1] if full.endswith("�") else full
        # stop-string handling: truncate at the earliest stop match
        for s in self.stop:
            idx = stable.find(s, max(0, len(self.emitted) - len(s)))
            if idx >= 0:
                stable = stable[:idx]
                self.stopped = True
                break
        if len(stable) <= len(self.emitted):
            return ""
        delta = stable[len(self.emitted):]
        self.emitted = stable
        return delta

    def finish(self) -> str:
        """Flush any held-back tail."""
        if self.stopped:
            return ""
        full = self._decode()
        for s in self.stop:
            idx = full.find(s)
            if idx >= 0:
                full = full[:idx]
        if len(full) <= len(self.emitted):
            return ""
        delta = full[len(self.emitted):]
        self.emitted = full
        return delta
