"""Regex/JSON-schema guided decoding FSM — self-contained, no deps.

Reference analog: the xgrammar/outlines backends behind vLLM's
structured-output stack (vllm/v1/structured_output/backend_xgrammar.py).
Rebuilt natively: a small regex engine (Thompson NFA, set-of-states
simulation) plus a token-level layer that, for any FSM state, computes the
set of vocabulary token ids whose *text* keeps the match alive. A prefix
trie over the vocab makes that sweep prune aggressively; per-state masks
are memoized, so steady-state decoding costs one dict lookup per step.

Supported regex subset (fullmatch semantics): literals, escapes
(\\d \\w \\s \\n \\t \\r \\xHH \\uHHHH and escaped metachars), ``.``,
char classes ``[...]``/``[^...]`` with ranges, groups ``(...)``/``(?:...)``,
alternation ``|``, quantifiers ``* + ? {m} {m,} {m,n}``.

JSON-schema → regex covers the common generation schemas: string, integer,
number, boolean, null, enum/const, arrays with item schemas, nested objects
with fixed property order (all listed properties emitted).
"""

from __future__ import annotations

import json
from typing import Optional

# --------------------------------------------------------------------------
# character classes
# --------------------------------------------------------------------------

_MAX_CP = 0x10FFFF


class CharClass:
    """Set of codepoints as sorted inclusive ranges, optionally negated."""

    __slots__ = ("ranges", "negated")

    def __init__(self, ranges, negated=False):
        self.ranges = tuple(ranges)
        self.negated = negated

    def matches(self, cp: int) -> bool:
        hit = any(lo <= cp <= hi for lo, hi in self.ranges)
        return hit != self.negated

    @staticmethod
    def lit(ch: str) -> "CharClass":
        return CharClass([(ord(ch), ord(ch))])


_DIGIT = CharClass([(48, 57)])
_WORD = CharClass([(48, 57), (65, 90), (95, 95), (97, 122)])
_SPACE = CharClass([(9, 13), (32, 32)])
_DOT = CharClass([(10, 10)], negated=True)  # any char but newline

_ESCAPES = {
    "d": _DIGIT,
    "D": CharClass(_DIGIT.ranges, negated=True),
    "w": _WORD,
    "W": CharClass(_WORD.ranges, negated=True),
    "s": _SPACE,
    "S": CharClass(_SPACE.ranges, negated=True),
    "n": CharClass.lit("\n"),
    "t": CharClass.lit("\t"),
    "r": CharClass.lit("\r"),
    "f": CharClass.lit("\f"),
    "v": CharClass.lit("\v"),
    "0": CharClass.lit("\0"),
}


# --------------------------------------------------------------------------
# regex parser → AST
# --------------------------------------------------------------------------


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def _peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def _next(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    def parse(self):
        node = self._alternation()
        if self.i != len(self.p):
            raise ValueError(f"unexpected {self.p[self.i]!r} at {self.i}")
        return node

    def _alternation(self):
        branches = [self._concat()]
        while self._peek() == "|":
            self._next()
            branches.append(self._concat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def _concat(self):
        items = []
        while self._peek() not in (None, "|", ")"):
            items.append(self._repeat())
        if not items:
            return ("cat", [])
        return items[0] if len(items) == 1 else ("cat", items)

    def _repeat(self):
        node = self._atom()
        ch = self._peek()
        if ch == "*":
            self._next()
            node = ("rep", node, 0, None)
        elif ch == "+":
            self._next()
            node = ("rep", node, 1, None)
        elif ch == "?":
            self._next()
            node = ("rep", node, 0, 1)
        elif ch == "{":
            j = self.p.find("}", self.i)
            if j < 0:
                raise ValueError("unterminated {}")
            body = self.p[self.i + 1 : j]
            self.i = j + 1
            if "," in body:
                lo_s, hi_s = body.split(",", 1)
                lo = int(lo_s) if lo_s else 0
                hi = int(hi_s) if hi_s.strip() else None
            else:
                lo = hi = int(body)
            node = ("rep", node, lo, hi)
        return node

    def _atom(self):
        ch = self._next()
        if ch == "(":
            if self.p[self.i : self.i + 2] == "?:":
                self.i += 2
            node = self._alternation()
            if self._peek() != ")":
                raise ValueError("unbalanced (")
            self._next()
            return node
        if ch == "[":
            return ("cc", self._char_class())
        if ch == ".":
            return ("cc", _DOT)
        if ch == "\\":
            return ("cc", self._escape())
        if ch in "*+?{":
            raise ValueError(f"dangling quantifier {ch!r}")
        return ("cc", CharClass.lit(ch))

    def _escape(self) -> CharClass:
        ch = self._next()
        if ch in _ESCAPES:
            return _ESCAPES[ch]
        if ch == "x":
            cp = int(self.p[self.i : self.i + 2], 16)
            self.i += 2
            return CharClass([(cp, cp)])
        if ch == "u":
            cp = int(self.p[self.i : self.i + 4], 16)
            self.i += 4
            return CharClass([(cp, cp)])
        return CharClass.lit(ch)  # escaped metachar / punctuation

    def _char_class(self) -> CharClass:
        negated = False
        if self._peek() == "^":
            self._next()
            negated = True
        ranges = []
        first = True
        while True:
            ch = self._peek()
            if ch is None:
                raise ValueError("unterminated [")
            if ch == "]" and not first:
                self._next()
                break
            first = False
            self._next()
            if ch == "\\":
                cc = self._escape()
                if len(cc.ranges) == 1 and not cc.negated and (
                    cc.ranges[0][0] == cc.ranges[0][1]
                ):
                    lo = cc.ranges[0][0]
                else:  # \d etc. inside class: merge its ranges, no range-span
                    ranges.extend(cc.ranges)
                    continue
            else:
                lo = ord(ch)
            if self._peek() == "-" and self.p[self.i + 1 : self.i + 2] not in (
                "]",
                "",
            ):
                self._next()
                hi_ch = self._next()
                if hi_ch == "\\":
                    hi_cc = self._escape()
                    hi = hi_cc.ranges[0][0]
                else:
                    hi = ord(hi_ch)
                ranges.append((lo, hi))
            else:
                ranges.append((lo, lo))
        return CharClass(ranges, negated)


# --------------------------------------------------------------------------
# Thompson NFA
# --------------------------------------------------------------------------


class NFA:
    """States are ints; `trans[s]` is [(CharClass, target)], `eps[s]` targets."""

    def __init__(self, pattern: str):
        self.trans: list[list] = []
        self.eps: list[list] = []
        ast = _Parser(pattern).parse()
        self.start = self._new()
        self.accept = self._new()
        self._build(ast, self.start, self.accept)

    def _new(self) -> int:
        self.trans.append([])
        self.eps.append([])
        return len(self.trans) - 1

    def _build(self, node, s: int, t: int) -> None:
        kind = node[0]
        if kind == "cc":
            self.trans[s].append((node[1], t))
        elif kind == "cat":
            items = node[1]
            if not items:
                self.eps[s].append(t)
                return
            cur = s
            for item in items[:-1]:
                nxt = self._new()
                self._build(item, cur, nxt)
                cur = nxt
            self._build(items[-1], cur, t)
        elif kind == "alt":
            for b in node[1]:
                self._build(b, s, t)
        elif kind == "rep":
            _, inner, lo, hi = node
            cur = s
            for _ in range(lo):  # mandatory copies
                nxt = self._new()
                self._build(inner, cur, nxt)
                cur = nxt
            if hi is None:  # unbounded tail: cur -(inner)-> cur, cur -> t
                loop_in = self._new()
                self.eps[cur].append(loop_in)
                self._build(inner, loop_in, cur)
                self.eps[cur].append(t)
            else:
                for _ in range(hi - lo):  # optional copies
                    self.eps[cur].append(t)
                    nxt = self._new()
                    self._build(inner, cur, nxt)
                    cur = nxt
                self.eps[cur].append(t)
        else:  # pragma: no cover
            raise ValueError(f"bad node {kind}")

    def closure(self, states) -> frozenset:
        seen = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for t in self.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    def step(self, states: frozenset, ch: str) -> frozenset:
        cp = ord(ch)
        out = {
            t
            for s in states
            for (cc, t) in self.trans[s]
            if cc.matches(cp)
        }
        return self.closure(out) if out else frozenset()


# --------------------------------------------------------------------------
# token-level FSM
# --------------------------------------------------------------------------


class TokenFSM:
    """Maps FSM states → allowed *token ids* for a vocabulary.

    token_strs: {token_id: text}. Tokens with empty text are never allowed
    (they would stall the FSM). Mask computation walks a prefix trie over
    the vocab, pruning whole subtrees the moment the NFA state-set empties.
    """

    def __init__(self, pattern: str, token_strs: dict[int, str]):
        self.nfa = NFA(pattern)
        self.init_state = self.nfa.closure({self.nfa.start})
        self._trie = self._build_trie(token_strs)
        self._mask_cache: dict[frozenset, list[int]] = {}
        self._step_cache: dict[tuple, frozenset] = {}
        self._token_strs = token_strs

    @staticmethod
    def _build_trie(token_strs):
        root: dict = {"ids": []}
        for tid, s in token_strs.items():
            if not s:
                continue
            node = root
            for ch in s:
                node = node.setdefault(ch, {"ids": []})
            node["ids"].append(tid)
        return root

    def is_accepting(self, state: frozenset) -> bool:
        return self.nfa.accept in state

    def advance_str(self, state: frozenset, text: str) -> frozenset:
        for ch in text:
            key = (state, ch)
            nxt = self._step_cache.get(key)
            if nxt is None:
                nxt = self.nfa.step(state, ch)
                self._step_cache[key] = nxt
            state = nxt
            if not state:
                return state
        return state

    def advance_token(self, state: frozenset, token_id: int) -> frozenset:
        return self.advance_str(state, self._token_strs.get(token_id, ""))

    def allowed_token_ids(self, state: frozenset) -> list[int]:
        cached = self._mask_cache.get(state)
        if cached is not None:
            return cached
        allowed: list[int] = []
        stack = [(self._trie, state)]
        while stack:
            node, st = stack.pop()
            for ch, child in node.items():
                if ch == "ids":
                    continue
                nst = self.advance_str(st, ch)
                if not nst:
                    continue
                allowed.extend(child["ids"])
                stack.append((child, nst))
        allowed.sort()
        self._mask_cache[state] = allowed
        return allowed


# --------------------------------------------------------------------------
# vocabulary extraction from a HF tokenizer
# --------------------------------------------------------------------------


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2 byte↔unicode table (the printable remapping used by byte-level
    BPE vocabularies)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def token_strings(tokenizer) -> dict[int, str]:
    """Decode every vocab entry to its surface text.

    Handles byte-level BPE (Ġ-style, via the GPT-2 byte table) and
    sentencepiece (▁ → space). Special tokens and tokens that are not valid
    UTF-8 on their own are skipped (never allowed by a constraint)."""
    n = len(tokenizer)
    toks = tokenizer.convert_ids_to_tokens(list(range(n)))
    special = set(getattr(tokenizer, "all_special_ids", []) or [])
    byte_level = any(t and "Ġ" in t for t in toks[: min(n, 4096)])
    inv = {c: b for b, c in _bytes_to_unicode().items()} if byte_level else None
    out: dict[int, str] = {}
    for tid, tok in enumerate(toks):
        if tok is None or tid in special:
            continue
        if byte_level:
            try:
                out[tid] = bytes(inv[c] for c in tok).decode("utf-8")
            except (KeyError, UnicodeDecodeError):
                continue  # partial multi-byte sequence; unusable standalone
        elif tok.startswith("▁"):
            out[tid] = " " + tok[1:]
        else:
            out[tid] = tok
    return out


# --------------------------------------------------------------------------
# JSON schema → regex
# --------------------------------------------------------------------------

_WS = r"[ \n\t]*"
_STRING_RE = r'"([^"\\]|\\.)*"'
_INT_RE = r"-?(0|[1-9][0-9]*)"
_NUM_RE = r"-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?"

_META = set("\\^$.|?*+()[]{}")


def _esc(text: str) -> str:
    return "".join("\\" + c if c in _META else c for c in text)


def _literal_regex(value) -> str:
    return _esc(json.dumps(value))


def json_schema_to_regex(schema: dict) -> str:
    """Convert a (non-recursive) JSON schema to a regex over its canonical
    serialization. Objects emit all listed properties in declaration order."""
    if not isinstance(schema, dict):
        raise ValueError("schema must be a dict")
    if "enum" in schema:
        return "(" + "|".join(_literal_regex(v) for v in schema["enum"]) + ")"
    if "const" in schema:
        return _literal_regex(schema["const"])
    if "anyOf" in schema:
        return (
            "("
            + "|".join(json_schema_to_regex(s) for s in schema["anyOf"])
            + ")"
        )
    t = schema.get("type")
    if isinstance(t, list):
        return (
            "("
            + "|".join(
                json_schema_to_regex({**schema, "type": tt}) for tt in t
            )
            + ")"
        )
    if t == "string":
        return _STRING_RE
    if t == "integer":
        return _INT_RE
    if t == "number":
        return _NUM_RE
    if t == "boolean":
        return "(true|false)"
    if t == "null":
        return "null"
    if t == "array":
        item = json_schema_to_regex(schema.get("items", {"type": "string"}))
        lo = schema.get("minItems")
        hi = schema.get("maxItems")
        if lo is not None or hi is not None:
            lo = int(lo or 0)
            rep = f"({_WS},{_WS}{item})"
            hi_s = "" if hi is None else str(max(int(hi) - 1, 0))
            if lo == 0:
                core = f"({item}{rep}{{0,{hi_s}}})?" if hi else f"({item}{rep}*)?"
            else:
                core = f"{item}{rep}{{{lo - 1},{hi_s}}}" if hi else (
                    f"{item}{rep}{{{lo - 1},}}"
                )
            return rf"\[{_WS}{core}{_WS}\]"
        core = f"{item}({_WS},{_WS}{item})*"
        return rf"\[{_WS}({core})?{_WS}\]"
    if t == "object" or "properties" in schema:
        props = schema.get("properties", {})
        if not props:
            return rf"\{{{_WS}\}}"
        keys = list(props)
        frags = {
            key: rf'"{_esc(key)}"{_WS}:{_WS}{json_schema_to_regex(sub)}'
            for key, sub in props.items()
        }
        # "required" honored exactly: optional properties may be omitted
        # (emission stays in declaration order — the documented canonical-
        # serialization simplification). Without "required", every listed
        # property is emitted (backward-compatible strict mode).
        if "required" in schema:
            req = set(schema["required"])
        else:
            req = set(keys)
        opt = [k for k in keys if k not in req]
        if len(opt) > 8:
            # subset enumeration would explode; degrade to all-required
            req, opt = set(keys), []
        alts = []
        import itertools as _it

        for r in range(len(opt) + 1):
            for combo in _it.combinations(opt, r):
                chosen = [k for k in keys if k in req or k in combo]
                if not chosen:
                    continue
                alts.append(
                    rf"{_WS},{_WS}".join(frags[k] for k in chosen)
                )
        if not alts:  # all optional, none chosen → empty object only
            return rf"\{{{_WS}\}}"
        body = "(" + "|".join(alts) + ")"
        empty = rf"|\{{{_WS}\}}" if not req else ""
        return rf"(\{{{_WS}{body}{_WS}\}}{empty})"
    raise ValueError(f"unsupported schema: {schema!r}")


# --------------------------------------------------------------------------
# shared FSM cache (FSMs are immutable; reuse across requests)
# --------------------------------------------------------------------------

_FSM_CACHE: dict[tuple[int, str], TokenFSM] = {}
_VOCAB_CACHE: dict[int, dict[int, str]] = {}


def get_token_fsm(pattern: str, tokenizer) -> TokenFSM:
    key = (id(tokenizer), pattern)
    fsm = _FSM_CACHE.get(key)
    if fsm is None:
        vocab = _VOCAB_CACHE.get(id(tokenizer))
        if vocab is None:
            vocab = token_strings(tokenizer)
            _VOCAB_CACHE[id(tokenizer)] = vocab
        fsm = TokenFSM(pattern, vocab)
        _FSM_CACHE[key] = fsm
    return fsm
