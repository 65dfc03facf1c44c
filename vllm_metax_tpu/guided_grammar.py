"""guided_grammar: EBNF grammars compiled to token-mask FSMs.

The reference inherits vLLM's xgrammar-backed `guided_grammar` surface
(tests/v1/entrypoints/llm/test_struct_output_generate.py). Two tiers here:

- NON-RECURSIVE grammars inline into one regex and reuse the token-FSM
  compiler (guided_fsm.get_token_fsm) — per-step masks are the same packed
  device bitsets as guided_regex/guided_json.
- RECURSIVE grammars (true context-free nesting — nested JSON, arithmetic
  expressions) compile to a PUSHDOWN token FSM (PushdownTokenFSM): each
  rule body becomes its own character NFA whose rule references are call
  edges; the machine state is a set of (rule, nfa_state, stack)
  configurations, stack-tracked product construction over the vocab trie,
  memoized per state exactly like the regex path. Depth is bounded only by
  `max_depth` (default 200; memory is the real limit) — this also bounds
  LEFT-recursive rules instead of diverging on them.

Accepted syntax (the common subset of Lark / GBNF grammars):
  rule  : `name : alternatives` or `name ::= alternatives`
  refs  : bare identifiers
  atoms : "literal" (regex-escaped), [a-z0-9] char classes, ( groups )
  ops   : `|` alternation, `* + ?` repeats, whitespace concatenation
  root  : rule named `root` or `start` (else the first rule)
  junk  : `//`, `#` comments and blank lines are skipped
"""

from __future__ import annotations

import re

# private-use codepoints mark rule-call edges inside per-rule NFAs
_CALL_BASE = 0xE000

_RULE_RE = re.compile(r"^\s*([A-Za-z_][\w-]*)\s*(::=|:)\s*(.+)$")
_TOKEN_RE = re.compile(
    r"\s*(\"(?:\\.|[^\"\\])*\"|'(?:\\.|[^'\\])*'"  # quoted literal
    r"|\[(?:\\.|[^\]\\])*\]"  # char class
    r"|[A-Za-z_][\w-]*"  # rule reference
    r"|[()|*+?])"  # operators
)


def _parse_rules(grammar: str) -> dict[str, str]:
    rules: dict[str, str] = {}
    pending_name = None
    for raw in grammar.splitlines():
        line = raw.split("//")[0].split("#")[0].rstrip()
        if not line.strip():
            continue
        m = _RULE_RE.match(line)
        if m and not line.lstrip().startswith("|"):
            pending_name = m.group(1)
            rules[pending_name] = m.group(3).strip()
        elif pending_name and line.lstrip().startswith("|"):
            rules[pending_name] += " " + line.strip()
        else:
            raise ValueError(f"unparseable grammar line: {raw!r}")
    if not rules:
        raise ValueError("empty grammar")
    return rules


def _to_regex(body: str, rules: dict[str, str], stack: tuple) -> str:
    out = []
    pos = 0
    while pos < len(body):
        m = _TOKEN_RE.match(body, pos)
        if not m:
            if body[pos:].strip():
                raise ValueError(
                    f"unparseable grammar fragment: {body[pos:]!r}"
                )
            break
        tok = m.group(1)
        pos = m.end()
        if tok[0] in "\"'":
            lit = tok[1:-1]
            lit = re.sub(r"\\(.)", r"\1", lit)  # unescape quoted chars
            out.append("(?:" + re.escape(lit) + ")")
        elif tok[0] == "[":
            out.append(tok)
        elif tok in ("(", ")", "|", "*", "+", "?"):
            out.append("(?:" if tok == "(" else tok)
        else:  # rule reference
            if tok in stack:
                raise ValueError(
                    f"grammar rule {tok!r} is recursive — only non-recursive"
                    " grammars are supported (unroll bounded nesting in the"
                    " grammar itself)"
                )
            if tok not in rules:
                raise ValueError(f"grammar references unknown rule {tok!r}")
            out.append(
                "(?:" + _to_regex(rules[tok], rules, stack + (tok,)) + ")"
            )
    return "".join(out)


def grammar_to_regex(grammar: str) -> str:
    """Compile an EBNF grammar (Lark/GBNF subset) to one regex pattern."""
    rules = _parse_rules(grammar)
    root = next(
        (n for n in ("root", "start") if n in rules), next(iter(rules))
    )
    return _to_regex(rules[root], rules, (root,))


# --------------------------------------------------------------------------
# pushdown token FSM (recursive grammars)
# --------------------------------------------------------------------------

def _to_call_regex(body: str, rules: dict[str, str], idx: dict[str, int]) -> str:
    """Rule body → regex where each rule reference is ONE private-use char
    (a call marker the pushdown machine expands)."""
    out = []
    pos = 0
    while pos < len(body):
        m = _TOKEN_RE.match(body, pos)
        if not m:
            if body[pos:].strip():
                raise ValueError(
                    f"unparseable grammar fragment: {body[pos:]!r}"
                )
            break
        tok = m.group(1)
        pos = m.end()
        if tok[0] in "\"'":
            lit = re.sub(r"\\(.)", r"\1", tok[1:-1])
            out.append("(?:" + re.escape(lit) + ")")
        elif tok[0] == "[":
            out.append(tok)
        elif tok in ("(", ")", "|", "*", "+", "?"):
            out.append("(?:" if tok == "(" else tok)
        else:
            if tok not in idx:
                raise ValueError(f"grammar references unknown rule {tok!r}")
            out.append("(?:" + chr(_CALL_BASE + idx[tok]) + ")")
    return "".join(out)


class PushdownTokenFSM:
    """Stack-tracked token-mask FSM for recursive grammars.

    Configuration = (rule, nfa_state, stack of (rule, return_state));
    machine state = frozenset of configurations after closure (epsilon
    edges + call expansion + accept pops). Duck-types TokenFSM's surface
    (init_state / advance_token / allowed_token_ids / is_accepting), so
    FSMConstraint and the packed-bitset machinery work unchanged.
    Ref surface: xgrammar CFG support inherited by the reference
    (tests/v1/entrypoints/llm/test_struct_output_generate.py)."""

    def __init__(self, grammar: str, token_strs: dict[int, str],
                 max_depth: int = 200):
        from vllm_metax_tpu.guided_fsm import NFA, TokenFSM

        rules = _parse_rules(grammar)
        self.names = list(rules)
        idx = {n: i for i, n in enumerate(self.names)}
        root = next(
            (n for n in ("root", "start") if n in rules), self.names[0]
        )
        self.root = idx[root]
        self.nfas = [
            NFA(_to_call_regex(rules[n], rules, idx)) for n in self.names
        ]
        self.max_depth = max_depth
        self._trie = TokenFSM._build_trie(token_strs)
        self._token_strs = token_strs
        self._mask_cache: dict[frozenset, list[int]] = {}
        self._step_cache: dict[tuple, frozenset] = {}
        self.init_state = self._closure(
            [(self.root, self.nfas[self.root].start, ())]
        )

    def _call_target(self, cc):
        r = getattr(cc, "ranges", None)
        if not r or len(r) != 1 or cc.negated:
            return None
        lo, hi = r[0]
        if lo == hi and _CALL_BASE <= lo < _CALL_BASE + len(self.nfas):
            return lo - _CALL_BASE
        return None

    def _closure(self, configs) -> frozenset:
        seen = set()
        work = list(configs)
        budget = 100_000
        while work:
            c = work.pop()
            if c in seen:
                continue
            seen.add(c)
            budget -= 1
            if budget < 0:
                raise ValueError(
                    "grammar closure exploded — LEFT-recursive rules "
                    "(a call cycle consuming no input) are not supported"
                )
            rid, st, stack = c
            nfa = self.nfas[rid]
            for t in nfa.eps[st]:
                work.append((rid, t, stack))
            for cc, t in nfa.trans[st]:
                callee = self._call_target(cc)
                if callee is not None and len(stack) < self.max_depth:
                    work.append(
                        (callee, self.nfas[callee].start,
                         stack + ((rid, t),))
                    )
            if st == nfa.accept and stack:
                prid, pst = stack[-1]
                work.append((prid, pst, stack[:-1]))
        # canonical form: keep configs that can consume a real character,
        # plus the root-accept config — pruning call/eps intermediates
        # keeps states small and the per-state caches effective
        out = []
        for rid, st, stack in seen:
            nfa = self.nfas[rid]
            if any(
                self._call_target(cc) is None for cc, _ in nfa.trans[st]
            ):
                out.append((rid, st, stack))
            elif rid == self.root and st == nfa.accept and not stack:
                out.append((rid, st, stack))
        return frozenset(out)

    def is_accepting(self, state: frozenset) -> bool:
        return (self.root, self.nfas[self.root].accept, ()) in state

    def _step(self, state: frozenset, ch: str) -> frozenset:
        cp = ord(ch)
        nxt = []
        for rid, st, stack in state:
            for cc, t in self.nfas[rid].trans[st]:
                if self._call_target(cc) is None and cc.matches(cp):
                    nxt.append((rid, t, stack))
        return self._closure(nxt) if nxt else frozenset()

    # ---- TokenFSM-compatible surface (same memoization pattern) ----

    def advance_str(self, state: frozenset, text: str) -> frozenset:
        for ch in text:
            key = (state, ch)
            nxt = self._step_cache.get(key)
            if nxt is None:
                nxt = self._step(state, ch)
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


def is_recursive(grammar: str) -> bool:
    """True when any rule (reachable from the root) references itself
    through a call cycle."""
    try:
        grammar_to_regex(grammar)
        return False
    except ValueError as e:
        if "recursive" in str(e):
            return True
        raise


_GRAMMAR_FSM_CACHE: dict[tuple[int, str], object] = {}


def grammar_token_fsm(grammar: str, tokenizer):
    """Grammar → token-mask FSM: regex-inlined when non-recursive (cheapest
    per-step machinery), pushdown when the grammar truly nests."""
    key = (id(tokenizer), grammar)
    fsm = _GRAMMAR_FSM_CACHE.get(key)
    if fsm is not None:
        return fsm
    if is_recursive(grammar):
        from vllm_metax_tpu.guided_fsm import token_strings

        fsm = PushdownTokenFSM(grammar, token_strings(tokenizer))
    else:
        from vllm_metax_tpu.guided_fsm import get_token_fsm

        fsm = get_token_fsm(grammar_to_regex(grammar), tokenizer)
    _GRAMMAR_FSM_CACHE[key] = fsm
    return fsm
