"""Per-request sampling parameters (vLLM SamplingParams-compatible surface,
as exercised by the reference's vendored tests, e.g. tests/e2e/*)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union


def tokenize_bad_words(bad_words: list[str], tokenizer) -> list[int]:
    """Resolve bad-word strings to banned token ids.

    Mirrors the reference engine's convention of trying each word both bare
    and with a leading space (vllm bad_words semantics). Words that only
    tokenize to multi-token sequences are rejected explicitly rather than
    silently ignored — prefix-conditional banning is not implemented.
    """
    banned: list[int] = []
    for word in bad_words:
        variants = [word, " " + word]
        hit = False
        multi: list[list[int]] = []
        for v in variants:
            ids = tokenizer.encode(v, add_special_tokens=False)
            if len(ids) == 1:
                banned.append(ids[0])
                hit = True
            elif ids:
                multi.append(ids)
        if not hit:
            raise ValueError(
                f"bad_words entry {word!r} tokenizes to multi-token sequences "
                f"{multi}; only single-token bad words are supported"
            )
    return banned


@dataclass
class SamplingParams:
    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 or -1 = disabled
    min_p: float = 0.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    stop: Union[None, str, list[str]] = None
    stop_token_ids: Optional[list[int]] = None
    ignore_eos: bool = False
    seed: Optional[int] = None
    logprobs: Optional[int] = None
    prompt_logprobs: Optional[int] = None
    skip_special_tokens: bool = True
    detokenize: bool = True
    # structured outputs
    guided_json: Optional[dict] = None
    guided_regex: Optional[str] = None
    guided_grammar: Optional[str] = None  # EBNF (Lark/GBNF subset)
    guided_choice: Optional[list[str]] = None
    bad_words: list[str] = field(default_factory=list)
    # token-id form of bad_words (single tokens); entrypoints fill this via
    # tokenize_bad_words() when only the string form is given
    bad_words_token_ids: list[int] = field(default_factory=list)
    logit_bias: Optional[dict[int, float]] = None

    def child(self, k: int) -> "SamplingParams":
        """Copy for the k-th parallel sample of an n>1 request: n=1 and an
        independent seed per child (seeded requests stay reproducible —
        child 0 keeps the original seed). Guided-decoding attachments are
        shared (constraints are instantiated per engine request)."""
        import dataclasses

        sp = dataclasses.replace(
            self, n=1, seed=None if self.seed is None else self.seed + k
        )
        for attr in ("_guided_token_choices", "_guided_fsm"):
            if hasattr(self, attr):
                setattr(sp, attr, getattr(self, attr))
        return sp

    def __post_init__(self):
        if self.top_k is None or self.top_k <= 0:
            self.top_k = 0
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        if self.stop is None:
            self.stop = []
        if self.stop_token_ids is None:
            self.stop_token_ids = []
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if self.n < 1:
            raise ValueError("n must be at least 1")
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError("max_tokens must be at least 1")
        if not 0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0
