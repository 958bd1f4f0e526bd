"""Unit tests: regex->DFA compiler, JSON-schema->regex, token FSM."""

import numpy as np
import pytest

from vllm_omni_tpu.structured import (
    RegexDFA,
    build_regex_from_schema,
    choice_to_regex,
)
from vllm_omni_tpu.structured.fsm import TokenFSM


@pytest.mark.parametrize("pattern,yes,no", [
    (r"-?[0-9]+(?:\.[0-9]+)?",
     ["123", "-4.5", "0.12", "-0"], ["", "1.", "abc", "--1", "1.2.3"]),
    (r"(?:a|bc)*d", ["d", "ad", "bcd", "abcad"], ["", "bd", "abc"]),
    (r"a{2,4}", ["aa", "aaa", "aaaa"], ["a", "aaaaa", ""]),
    (r"[^x]+", ["abc", "y"], ["", "axb"]),
    (r"\w+@\w+\.com", ["a@b.com"], ["a@b.org", "@b.com"]),
    (r"a\{b\}", ["a{b}"], ["ab"]),
    ("héllo", ["héllo"], ["hello"]),  # multi-byte UTF-8 literal
])
def test_regex_matches(pattern, yes, no):
    d = RegexDFA(pattern)
    for s in yes:
        assert d.matches(s), (pattern, s)
    for s in no:
        assert not d.matches(s), (pattern, s)


def test_schema_object_and_types():
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"},
                       "age": {"type": "integer"},
                       "ok": {"type": "boolean"}},
        "required": ["name", "age", "ok"],
    }
    d = RegexDFA(build_regex_from_schema(schema))
    assert d.matches('{"name": "bob", "age": -3, "ok": true}')
    assert d.matches('{"name":"b\\"ob","age":0,"ok":false}')
    assert not d.matches('{"age": 3, "name": "bob", "ok": true}')
    assert not d.matches('{"name": "bob", "ok": true}')
    assert not d.matches('{"name": "bob", "age": 01, "ok": true}')


def test_schema_arrays_enums_refs():
    d = RegexDFA(build_regex_from_schema(
        {"type": "array", "items": {"enum": ["a", 1, True]},
         "minItems": 1, "maxItems": 3}))
    assert d.matches('["a", 1, true]') and d.matches('[1]')
    assert not d.matches('[]') and not d.matches('[1, 1, 1, 1]')

    d2 = RegexDFA(build_regex_from_schema(
        {"type": "array", "items": {"type": "integer"}}))
    assert d2.matches('[]') and d2.matches('[1, 2, 3]')
    assert not d2.matches('[1,]')

    d3 = RegexDFA(build_regex_from_schema(
        {"$defs": {"T": {"type": "boolean"}},
         "anyOf": [{"$ref": "#/$defs/T"}, {"type": "null"}]}))
    assert d3.matches("true") and d3.matches("null")
    assert not d3.matches("1")


def test_schema_number_and_string_pattern():
    d = RegexDFA(build_regex_from_schema({"type": "number"}))
    assert d.matches("-1.5e-3") and d.matches("0") and not d.matches("1.")
    d2 = RegexDFA(build_regex_from_schema(
        {"type": "string", "pattern": "[A-Z]{2}[0-9]{4}"}))
    assert d2.matches('"AB1234"') and not d2.matches('"ab1234"')


def test_choice_regex():
    d = RegexDFA(choice_to_regex(["a.b", "c|d"]))
    assert d.matches("a.b") and d.matches("c|d")
    assert not d.matches("axb") and not d.matches("c") \
        and not d.matches("d")


def test_token_fsm_masks_and_transitions():
    vocab = [b"1", b"2", b".", b"12", b"-", b"a", None, b""]
    eos = 6
    fsm = TokenFSM(RegexDFA(r"-?[0-9]+(?:\.[0-9]+)?"), vocab, eos)

    def allowed(st):
        m = fsm.allowed_mask(st)
        return {t for t in range(len(vocab))
                if (m[t >> 5] >> np.uint32(t & 31)) & np.uint32(1)}

    a0 = allowed(0)
    assert a0 == {0, 1, 3, 4}  # digits, "12", "-"; no ".", "a", eos
    s1 = fsm.next_state(0, 0)  # "1"
    a1 = allowed(s1)
    assert eos in a1 and 2 in a1 and 0 in a1 and 4 not in a1
    s2 = fsm.next_state(s1, 2)  # "."
    a2 = allowed(s2)
    assert eos not in a2 and 0 in a2 and 2 not in a2
    s3 = fsm.next_state(s2, 3)  # "12" -> accepting
    assert fsm.is_final(s3) and eos in allowed(s3)
    # disallowed transition returns -1
    assert fsm.next_state(0, 2) == -1
    # special tokens (None / b"") are never allowed
    assert 6 not in a0 and 7 not in a0


def test_multibyte_tokens_cross_dfa_bytes():
    # a token spanning several pattern atoms must transition correctly
    vocab = [b"ab", b"a", b"b", b"c", None]
    fsm = TokenFSM(RegexDFA("abc"), vocab, 4)
    s = fsm.next_state(0, 0)  # "ab"
    assert s >= 0
    m = fsm.allowed_mask(s)
    assert (m[0] >> np.uint32(3)) & np.uint32(1)  # "c" allowed
    s2 = fsm.next_state(s, 3)
    assert fsm.is_final(s2)
