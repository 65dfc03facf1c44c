"""guided_grammar: EBNF grammars compiled onto the regex-FSM machinery.

The reference inherits vLLM's xgrammar-backed `guided_grammar` surface;
here NON-RECURSIVE grammars are inlined into one regex and reuse the
token-FSM compiler (guided_fsm.get_token_fsm) — the per-step masks are the
same packed device bitsets as guided_regex/guided_json. Recursive rules
(true context-free nesting) are rejected with a clear error; bounded
nesting can be expressed by unrolling rules in the grammar itself.

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
