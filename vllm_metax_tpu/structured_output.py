"""Structured (guided) decoding — token-level constraint FSMs.

Reference analog: vLLM's structured-output stack (xgrammar-backed; the
reference inherits it and its tests/v1/structured_output coverage). Built
natively here: a constraint exposes the set of allowed next tokens given the
tokens emitted so far; the runner masks the logits to that set host-side per
step. Currently implemented: choice constraints (`guided_choice`) — each
choice tokenized to a sequence, allowed tokens = next tokens of the choices
matching the emitted prefix, then EOS once a full choice is emitted.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _ids_to_bitset(ids, vocab: int) -> np.ndarray:
    """Token-id list → packed (ceil(V/32),) uint32 bitset (bit v%32 of word
    v//32 — the layout the runner's device mask expands)."""
    nw = (vocab + 31) // 32
    words = np.zeros(nw, np.uint32)
    if ids:
        arr = np.asarray(ids, np.int64)
        arr = arr[(arr >= 0) & (arr < vocab)]
        np.bitwise_or.at(
            words, arr >> 5, np.uint32(1) << (arr & 31).astype(np.uint32)
        )
    return words


class ChoiceConstraint:
    """Trie over the token sequences of the allowed choices."""

    def __init__(self, token_choices: list[list[int]], eos_token_id: Optional[int]):
        self.choices = [tuple(c) for c in token_choices if c]
        self.eos = eos_token_id

    def allowed_tokens(self, emitted: list[int]) -> list[int]:
        prefix = tuple(emitted)
        nxt = set()
        done = False
        for c in self.choices:
            if c == prefix:
                done = True
            elif c[: len(prefix)] == prefix and len(c) > len(prefix):
                nxt.add(c[len(prefix)])
        if done and self.eos is not None:
            nxt.add(self.eos)
        if not nxt and self.eos is not None:
            return [self.eos]  # dead end → stop
        return sorted(nxt)

    def allowed_bitset(self, emitted: list[int], vocab: int) -> np.ndarray:
        return _ids_to_bitset(self.allowed_tokens(emitted), vocab)


class FSMConstraint:
    """Regex/JSON-schema constraint backed by a shared TokenFSM.

    Tracks the FSM state for this request incrementally (the runner calls
    with the full emitted-token list each step; we re-advance only the
    suffix beyond the last seen prefix)."""

    def __init__(self, fsm, eos_token_id: Optional[int]):
        self.fsm = fsm
        self.eos = eos_token_id
        self._prefix: list[int] = []
        self._state = fsm.init_state

    def allowed_tokens(self, emitted: list[int]) -> list[int]:
        n = len(self._prefix)
        if len(emitted) >= n and emitted[:n] == self._prefix:
            state, todo = self._state, emitted[n:]
        else:  # rollback (preemption/resample): replay from scratch
            state, todo = self.fsm.init_state, emitted
        for tid in todo:
            if state:
                state = self.fsm.advance_token(state, tid)
        self._prefix = list(emitted)
        self._state = state
        if not state:
            return [self.eos] if self.eos is not None else []
        allowed = self.fsm.allowed_token_ids(state)
        if self.fsm.is_accepting(state) and self.eos is not None:
            allowed = allowed + [self.eos]
        if not allowed and self.eos is not None:
            allowed = [self.eos]  # dead end → stop
        return allowed

    def allowed_bitset(self, emitted: list[int], vocab: int) -> np.ndarray:
        """Packed allow mask for the current FSM state, memoized PER STATE on
        the shared TokenFSM (states repeat heavily across steps/requests, so
        the steady-state host cost is a dict hit + one 16KB copy)."""
        n = len(self._prefix)
        if len(emitted) >= n and emitted[:n] == self._prefix:
            state, todo = self._state, emitted[n:]
        else:
            state, todo = self.fsm.init_state, emitted
        for tid in todo:
            if state:
                state = self.fsm.advance_token(state, tid)
        self._prefix = list(emitted)
        self._state = state
        if not state:
            return _ids_to_bitset(
                [self.eos] if self.eos is not None else [], vocab
            )
        cache = getattr(self.fsm, "_bitset_cache", None)
        if cache is None:
            cache = self.fsm._bitset_cache = {}
        base = cache.get(state)
        if base is None:
            base = _ids_to_bitset(self.fsm.allowed_token_ids(state), vocab)
            cache[state] = base
        if self.fsm.is_accepting(state) and self.eos is not None:
            base = base.copy()
            base[self.eos >> 5] |= np.uint32(1) << np.uint32(self.eos & 31)
        elif not base.any() and self.eos is not None:
            base = _ids_to_bitset([self.eos], vocab)  # dead end → stop
        return base


def build_constraint(sampling_params, eos_token_id):
    tc = getattr(sampling_params, "_guided_token_choices", None)
    if tc:
        return ChoiceConstraint(tc, eos_token_id)
    fsm = getattr(sampling_params, "_guided_fsm", None)
    if fsm is not None:
        return FSMConstraint(fsm, eos_token_id)
    return None
