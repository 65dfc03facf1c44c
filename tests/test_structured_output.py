"""Structured outputs (guided choice) — reference analog: the engine's
xgrammar-backed structured-output stack and tests."""

import numpy as np
import pytest

from vllm_metax_tpu.structured_output import ChoiceConstraint


def test_choice_constraint_fsm():
    c = ChoiceConstraint([[5, 6, 7], [5, 9], [11]], eos_token_id=2)
    assert c.allowed_tokens([]) == [5, 11]
    assert c.allowed_tokens([5]) == [6, 9]
    assert c.allowed_tokens([5, 6]) == [7]
    assert c.allowed_tokens([5, 9]) == [2]  # complete → EOS
    assert c.allowed_tokens([5, 6, 7]) == [2]
    assert c.allowed_tokens([99]) == [2]  # dead end → force stop


def test_guided_choice_engine(small_model_config):
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    engine = EngineCore(config)
    choices = [[10, 11, 12], [20, 21], [30]]
    sp = SamplingParams(max_tokens=8, temperature=0.0)
    sp._guided_token_choices = choices
    engine.add_request("r0", [1, 2, 3], sp, eos_token_id=2)
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    # emitted tokens (minus the final EOS) must be exactly one of the choices
    body = toks[:-1] if toks and toks[-1] == 2 else toks
    assert body in choices, toks


def test_guided_choice_with_sampling(small_model_config):
    """Random sampling stays within the constraint set."""
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.sample.params import SamplingParams

    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    engine = EngineCore(config)
    choices = [[10, 11], [20, 21], [30, 31]]
    for i in range(3):
        sp = SamplingParams(max_tokens=8, temperature=1.0, seed=i)
        sp._guided_token_choices = choices
        engine.add_request(f"r{i}", [1, 2, 3 + i], sp, eos_token_id=2)
    acc = {f"r{i}": [] for i in range(3)}
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
    for toks in acc.values():
        body = toks[:-1] if toks and toks[-1] == 2 else toks
        assert body in choices, toks


# ---------------------------------------------------------------- regex FSM

def _fsm(pattern, vocab):
    from vllm_metax_tpu.guided_fsm import TokenFSM

    return TokenFSM(pattern, vocab)


def _char_vocab(chars):
    """Token id i ↦ the i-th char (a synthetic char-level vocabulary)."""
    return {i: c for i, c in enumerate(chars)}


def _fullmatch(fsm, text):
    st = fsm.advance_str(fsm.init_state, text)
    return bool(st) and fsm.is_accepting(st)


def test_regex_engine_fullmatch():
    v = _char_vocab("abc0123456789.-xyz")
    for pat, yes, no in [
        (r"abc", ["abc"], ["ab", "abcc", ""]),
        (r"a+b?", ["a", "aa", "ab", "aaab"], ["b", "abb", ""]),
        (r"(ab|cd)*", ["", "ab", "abcd", "cdabab"], ["a", "abc"]),
        (r"[0-9]{2,4}", ["12", "123", "1234"], ["1", "12345", "1a"]),
        (r"-?(0|[1-9][0-9]*)", ["0", "7", "42", "-13"], ["00", "01", "-"]),
        (r"[^ab]c", ["xc", "0c"], ["ac", "bc", "c"]),
        (r"a\.b", ["a.b"], ["axb"]),
        (r"\d{3}", ["123"], ["12", "1234"]),
    ]:
        fsm = _fsm(pat, v)
        for s in yes:
            assert _fullmatch(fsm, s), (pat, s)
        for s in no:
            assert not _fullmatch(fsm, s), (pat, s)


def test_token_fsm_allowed_and_multichar_tokens():
    # vocab mixes single chars and multi-char tokens
    vocab = {0: "a", 1: "b", 2: "ab", 3: "ba", 4: "abb", 5: "c"}
    fsm = _fsm(r"ab+", vocab)
    s0 = fsm.init_state
    # from start: "a" ok, "ab" ok, "abb" ok; "b"/"ba"/"c" dead
    assert fsm.allowed_token_ids(s0) == [0, 2, 4]
    s1 = fsm.advance_token(s0, 2)  # consumed "ab" → accepting, b* continues
    assert fsm.is_accepting(s1)
    assert fsm.allowed_token_ids(s1) == [1]


def test_fsm_constraint_engine_generates_matching_string(small_model_config):
    """End-to-end: dummy model + char-level vocab, output must match regex."""
    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.guided_fsm import TokenFSM
    from vllm_metax_tpu.sample.params import SamplingParams

    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    vocab_chars = "0123456789abcdefghij-."
    tok_strs = {10 + i: c for i, c in enumerate(vocab_chars)}
    pattern = r"-?[1-9][0-9]{2,5}\.[0-9]{2}"
    fsm = TokenFSM(pattern, tok_strs)

    engine = EngineCore(config)
    for i, temp in enumerate([0.0, 1.0]):
        sp = SamplingParams(max_tokens=16, temperature=temp, seed=i)
        sp._guided_fsm = fsm
        engine.add_request(f"r{i}", [1, 2, 3 + i], sp, eos_token_id=2)
    acc = {"r0": [], "r1": []}
    while engine.has_unfinished_requests():
        for out in engine.step():
            acc[out.req_id].extend(out.new_token_ids)
    import re

    for toks in acc.values():
        body = toks[:-1] if toks and toks[-1] == 2 else toks
        text = "".join(tok_strs[t] for t in body)
        assert re.fullmatch(pattern, text), (toks, text)


# ------------------------------------------------------- JSON schema → regex

def test_json_schema_to_regex_roundtrip():
    import re

    from vllm_metax_tpu.guided_fsm import json_schema_to_regex

    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "score": {"type": "number"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "active": {"type": "boolean"},
            "kind": {"enum": ["cat", "dog"]},
        },
    }
    pat = json_schema_to_regex(schema)
    good = (
        '{"name": "Ada", "age": 36, "score": -2.5e3, '
        '"tags": ["x", "y"], "active": true, "kind": "dog"}'
    )
    assert re.fullmatch(pat, good)
    # wrong key order / missing key / bad type all rejected
    assert not re.fullmatch(pat, '{"age": 36}')
    assert not re.fullmatch(pat, good.replace("36", '"36"'))


def test_json_guided_engine_output_parses(small_model_config):
    """Guided-json e2e: generated text must be valid JSON for the schema."""
    import json as _json

    from vllm_metax_tpu.config import (
        CacheConfig, EngineConfig, LoadConfig, SchedulerConfig,
    )
    from vllm_metax_tpu.core.engine import EngineCore
    from vllm_metax_tpu.guided_fsm import TokenFSM, json_schema_to_regex
    from vllm_metax_tpu.sample.params import SamplingParams

    config = EngineConfig(
        model_config=small_model_config,
        cache_config=CacheConfig(block_size=16, num_blocks=64),
        scheduler_config=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64),
        load_config=LoadConfig(load_format="dummy", seed=0),
    )
    chars = '{}[]":,0123456789truefalsnu airbcd-. '
    tok_strs = {10 + i: c for i, c in enumerate(dict.fromkeys(chars))}
    schema = {
        "type": "object",
        "properties": {"a": {"type": "integer"}, "b": {"type": "boolean"}},
    }
    fsm = TokenFSM(json_schema_to_regex(schema), tok_strs)

    engine = EngineCore(config)
    sp = SamplingParams(max_tokens=32, temperature=1.0, seed=0)
    sp._guided_fsm = fsm
    engine.add_request("r0", [1, 2, 3], sp, eos_token_id=2)
    toks = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            toks.extend(out.new_token_ids)
    body = toks[:-1] if toks and toks[-1] == 2 else toks
    text = "".join(tok_strs[t] for t in body)
    obj = _json.loads(text)
    assert isinstance(obj["a"], int) and isinstance(obj["b"], bool), text


def test_token_strings_sentencepiece_style():
    class FakeTok:
        all_special_ids = [0]

        def __len__(self):
            return 5

        def convert_ids_to_tokens(self, ids):
            return ["<s>", "▁hello", "world", "▁", "!"][: len(ids)]

    from vllm_metax_tpu.guided_fsm import token_strings

    ts = token_strings(FakeTok())
    assert ts == {1: " hello", 2: "world", 3: " ", 4: "!"}


def test_token_strings_byte_level():
    from vllm_metax_tpu.guided_fsm import _bytes_to_unicode, token_strings

    b2u = _bytes_to_unicode()

    def enc(s):
        return "".join(b2u[b] for b in s.encode("utf-8"))

    toks = ["<|end|>", enc(" the"), enc("Hello"), enc(","), "\udcff"]

    class FakeTok:
        all_special_ids = [0]

        def __len__(self):
            return len(toks)

        def convert_ids_to_tokens(self, ids):
            return toks[: len(ids)]

    ts = token_strings(FakeTok())
    assert ts[1] == " the" and ts[2] == "Hello" and ts[3] == ","
    assert 4 not in ts  # unmappable char → skipped


def test_json_schema_required_optional():
    """`required` honored exactly: optional properties may be omitted, all
    valid orderings stay declaration-ordered, required ones always present."""
    import re

    from vllm_metax_tpu.guided_fsm import json_schema_to_regex

    rx = re.compile(
        json_schema_to_regex(
            {
                "type": "object",
                "properties": {
                    "name": {"type": "string"},
                    "age": {"type": "integer"},
                    "tag": {"type": "boolean"},
                },
                "required": ["name"],
            }
        )
    )
    for good in (
        '{"name": "x"}',
        '{"name": "x", "age": 3}',
        '{"name": "x", "tag": true}',
        '{"name": "x", "age": 3, "tag": false}',
    ):
        assert rx.fullmatch(good), good
    for bad in ('{"age": 3}', "{}", '{"tag": true, "name": "x"}'):
        assert not rx.fullmatch(bad), bad


def test_json_schema_array_bounds():
    import re

    from vllm_metax_tpu.guided_fsm import json_schema_to_regex

    rx = re.compile(
        json_schema_to_regex(
            {"type": "array", "items": {"type": "integer"}, "minItems": 1,
             "maxItems": 2}
        )
    )
    assert rx.fullmatch("[1]") and rx.fullmatch("[1, 2]")
    assert not rx.fullmatch("[]") and not rx.fullmatch("[1, 2, 3]")


# ---------------------------------------------------------------------------
# guided_grammar (EBNF → regex → token FSM)


def test_grammar_to_regex():
    import re as _re

    from vllm_metax_tpu.guided_grammar import grammar_to_regex

    g = """
    // a tiny key-value grammar
    root ::= greeting " " name ("!" | ".")
    greeting ::= "hello" | "hi"
    name ::= [A-Z][a-z]+
    """
    rx = _re.compile(grammar_to_regex(g))
    assert rx.fullmatch("hello World!")
    assert rx.fullmatch("hi Bob.")
    assert not rx.fullmatch("hello world!")  # lowercase name
    assert not rx.fullmatch("hey Bob.")

    # lark-style single-colon rules + repeats
    g2 = """
    start: digit+ ("," digit+)*
    digit: [0-9]
    """
    rx2 = _re.compile(grammar_to_regex(g2))
    assert rx2.fullmatch("12,345,6")
    assert not rx2.fullmatch("12,,3")


def test_grammar_recursion_rejected():
    import pytest as _pytest

    from vllm_metax_tpu.guided_grammar import grammar_to_regex

    g = """
    root ::= "(" root ")" | "x"
    """
    with _pytest.raises(ValueError, match="recursive"):
        grammar_to_regex(g)


def test_guided_grammar_e2e(tmp_path):
    """Generation constrained by an EBNF grammar through LLM.generate."""
    import re as _re

    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from tests.test_api_server import _make_tiny_tokenizer
    from vllm_metax_tpu import LLM, SamplingParams

    torch.manual_seed(0)
    m = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=32000,
        max_position_embeddings=256, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny")
    m.save_pretrained(path, safe_serialization=True)
    _make_tiny_tokenizer(path)

    llm = LLM(model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
              max_num_batched_tokens=64, max_model_len=128)
    g = 'root ::= ("yes" | "no") ", " [0-9] [0-9]?'
    out = llm.generate(
        ["Answer:"],
        SamplingParams(max_tokens=16, temperature=0.0, guided_grammar=g),
    )[0].outputs[0].text
    assert _re.fullmatch(r"(yes|no), [0-9][0-9]?", out), out


# ---------------------------------------- recursive grammars (pushdown FSM)

def _pda(grammar, strings):
    """Build a PushdownTokenFSM over a toy vocab of the given strings
    (one token per string) and return (fsm, {string: id})."""
    from vllm_metax_tpu.guided_grammar import PushdownTokenFSM

    toks = {i: s for i, s in enumerate(strings)}
    return PushdownTokenFSM(grammar, toks), {s: i for i, s in toks.items()}


_JSON_G = r'''
// nested-JSON (no whitespace) — truly recursive
value ::= object | array | string | number
object ::= "{" (pair ("," pair)*)? "}"
pair ::= string ":" value
array ::= "[" (value ("," value)*)? "]"
string ::= "\"" [a-z]* "\""
number ::= [0-9]+
root ::= value
'''


def test_pushdown_accepts_nested_json():
    fsm, ids = _pda(
        _JSON_G,
        ['{', '}', '[', ']', '"', 'a', 'b', ':', ',', '1', '2', '"a"',
         '{"', '"}'],
    )
    st = fsm.init_state
    for ch in '{"a":[{"b":12},[1,2]],"b":{"a":"ab"}}':
        st = fsm.advance_str(st, ch)
        assert st, ch
    assert fsm.is_accepting(st)
    # unbalanced close must die
    st2 = fsm.advance_str(fsm.init_state, '{"a":1}}')
    assert not st2


def test_pushdown_masks_follow_the_stack():
    fsm, ids = _pda(_JSON_G, ['{', '}', '[', ']', '"', 'a', ':', ',', '1'])
    st = fsm.advance_str(fsm.init_state, '{"a":[')
    allowed = set(fsm.allowed_token_ids(st))
    # inside an array a value may start; '}' may not close the OBJECT yet
    assert ids['['] in allowed and ids['"'] in allowed and ids['1'] in allowed
    assert ids['}'] not in allowed
    # after closing the array, ',' or '}' continue the object
    st = fsm.advance_str(st, '1]')
    allowed = set(fsm.allowed_token_ids(st))
    assert ids[','] in allowed and ids['}'] in allowed
    assert ids[']'] not in allowed


def test_pushdown_arithmetic_expressions():
    g = r'''
    expr ::= term (("+" | "-") term)*
    term ::= factor (("*" | "/") factor)*
    factor ::= [0-9]+ | "(" expr ")"
    root ::= expr
    '''
    fsm, ids = _pda(g, list("0123456789+-*/()"))
    for ok in ("1+2*3", "(1+2)*(3-4)/5", "((((7))))"):
        st = fsm.init_state
        for ch in ok:
            st = fsm.advance_str(st, ch)
            assert st, (ok, ch)
        assert fsm.is_accepting(st), ok
    for bad in ("1+", "(1+2", "1))", "*3"):
        st = fsm.init_state
        dead_or_unaccepted = False
        for ch in bad:
            st = fsm.advance_str(st, ch)
            if not st:
                dead_or_unaccepted = True
                break
        if st:
            dead_or_unaccepted = not fsm.is_accepting(st)
        assert dead_or_unaccepted, bad


def test_pushdown_left_recursion_bounded():
    """Left-recursive rules don't explode: the call expansion caps at
    max_depth, so the machine accepts nestings up to that depth."""
    from vllm_metax_tpu.guided_grammar import PushdownTokenFSM

    g = 'root ::= root "x" | "y"'
    fsm = PushdownTokenFSM(g, {0: "x", 1: "y"}, max_depth=16)
    st = fsm.advance_str(fsm.init_state, "yxxxxx")
    assert st and fsm.is_accepting(st)
    st = fsm.advance_str(fsm.init_state, "xy")  # x cannot come first
    assert not st


def test_recursive_grammar_e2e(tmp_path):
    """Nested-JSON generation constrained end-to-end through LLM.generate —
    the reference surface this mirrors:
    tests/v1/entrypoints/llm/test_struct_output_generate.py (xgrammar CFG)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from tests.test_api_server import _make_tiny_tokenizer
    from vllm_metax_tpu import LLM, SamplingParams

    torch.manual_seed(0)
    m = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=32000,
        max_position_embeddings=256, tie_word_embeddings=False,
    )).eval()
    path = str(tmp_path / "tiny")
    m.save_pretrained(path, safe_serialization=True)
    _make_tiny_tokenizer(path)

    llm = LLM(model=path, dtype="float32", num_kv_blocks=64, max_num_seqs=4,
              max_num_batched_tokens=64, max_model_len=128)
    out = llm.generate(
        ["Data:"],
        SamplingParams(max_tokens=24, temperature=0.0,
                       guided_grammar=_JSON_G),
    )[0].outputs[0].text
    # the constrained output must be a syntactically valid (possibly
    # truncated) nesting; validate the balanced-structure invariant
    depth = 0
    for ch in out:
        assert ch in '{}[]":,abcdefghijklmnopqrstuvwxyz0123456789', out
        if ch in "{[":
            depth += 1
        elif ch in "}]":
            depth -= 1
            assert depth >= 0, out
