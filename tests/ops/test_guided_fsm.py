"""Guided-decoding FSM layer: regex->DFA, token masks, schema->regex.

Mirrors the reference's reliance on outlines' FSM correctness — here the
compiler is in-tree, so it gets direct tests (upstream test analog:
tests/entrypoints/test_guided_processors.py)."""

import json

import numpy as np
import pytest

from vllm_paged_compression_tpu.guided import (build_regex_from_schema,
                                               compile_regex,
                                               get_guided_fsm,
                                               json_value_regex)
from vllm_paged_compression_tpu.guided.fsm import TokenFSM
from vllm_paged_compression_tpu.sampling_params import GuidedDecodingParams


def fullmatch(pattern: str, s: str) -> bool:
    return compile_regex(pattern).fullmatch(s.encode("utf-8"))


class TestRegexDFA:
    @pytest.mark.parametrize("pattern,yes,no", [
        ("abc", ["abc"], ["ab", "abcd", ""]),
        ("a*", ["", "a", "aaaa"], ["b", "ab"]),
        ("a+b?", ["a", "ab", "aab"], ["", "b", "abb"]),
        ("(ab|cd)+", ["ab", "cdab"], ["", "a", "abc"]),
        ("[a-c]{2,3}", ["ab", "abc", "ccc"], ["a", "abcd", "ad"]),
        ("a{3}", ["aaa"], ["aa", "aaaa"]),
        ("a{2,}", ["aa", "aaaaa"], ["a"]),
        (r"\d+\.\d{2}", ["3.14", "10.00"], ["3.1", ".14", "3,14"]),
        (r"[^x]+", ["abc", " "], ["", "axb"]),
        (r"(?:foo|bar)?baz", ["baz", "foobaz", "barbaz"], ["foobar"]),
        (r"\w+@\w+\.(com|org)", ["a_1@b.com", "x@y.org"], ["a@b.net"]),
        (r"-?(0|[1-9][0-9]*)", ["0", "-7", "42"], ["-", "007", ""]),
    ])
    def test_match(self, pattern, yes, no):
        for s in yes:
            assert fullmatch(pattern, s), (pattern, s)
        for s in no:
            assert not fullmatch(pattern, s), (pattern, s)

    def test_utf8_literal(self):
        assert fullmatch("héllo", "héllo")
        assert not fullmatch("héllo", "hello")

    def test_dot_excludes_newline(self):
        assert fullmatch("a.c", "abc")
        assert not fullmatch("a.c", "a\nc")

    def test_escape_class(self):
        assert fullmatch(r"[\d,]+", "1,2,3")
        assert not fullmatch(r"[\d,]+", "1;2")

    def test_anchors_ignored(self):
        assert fullmatch(r"^abc$", "abc")


def _mk_vocab():
    """Single-char + multi-char toy vocab; id 0 = EOS (empty bytes)."""
    toks = [b""] + [bytes([c]) for c in range(0x20, 0x7F)]
    toks += [b"ab", b"abc", b"12", b"true", b"false", b'":', b'",']
    return toks


class TestTokenFSM:
    def test_mask_matches_bruteforce(self):
        vocab = _mk_vocab()
        dfa = compile_regex(r"(ab)+c?\d*")
        fsm = TokenFSM(dfa, vocab, eos_token_id=0)
        state = dfa.start
        for emitted in [b"", b"ab", b"abab", b"ababc", b"ababc12"]:
            state = dfa.walk(dfa.start, emitted)
            mask = fsm.allowed_mask(state)
            for tid, tok in enumerate(vocab):
                bit = bool((mask[tid // 32] >> np.uint32(tid % 32))
                           & np.uint32(1))
                if tid == 0:   # EOS
                    expect = bool(dfa.accept[state])
                else:
                    end = dfa.walk(state, tok)
                    expect = bool(tok) and end != dfa.dead
                assert bit == expect, (emitted, tid, tok)

    def test_advance_and_accept(self):
        vocab = _mk_vocab()
        dfa = compile_regex(r"true|false")
        fsm = TokenFSM(dfa, vocab, eos_token_id=0)
        s = fsm.start
        tid = vocab.index(b"true")
        s = fsm.advance(s, tid)
        assert fsm.is_accept(s)
        assert fsm.only_eos(s)

    def test_dead_end_allows_eos(self):
        vocab = [b"", b"a"]
        dfa = compile_regex("b+")       # vocab can never match
        fsm = TokenFSM(dfa, vocab, eos_token_id=0)
        mask = fsm.allowed_mask(dfa.start)
        assert mask[0] & np.uint32(1)   # EOS force-allowed

    def test_get_guided_fsm_cached(self):
        vocab = _mk_vocab()
        gd = GuidedDecodingParams(regex=r"\d+")
        a = get_guided_fsm(gd, vocab, 0, len(vocab))
        b = get_guided_fsm(GuidedDecodingParams(regex=r"\d+"), vocab, 0,
                           len(vocab))
        assert a is b

    def test_choice(self):
        vocab = _mk_vocab()
        gd = GuidedDecodingParams(choice=["yes", "no"])
        fsm = get_guided_fsm(gd, vocab, 0, len(vocab))
        s = fsm.start
        for ch in b"yes":
            s = fsm.advance(s, vocab.index(bytes([ch])))
        assert fsm.is_accept(s)


class TestJsonSchema:
    def _dfa_accepts(self, schema, value) -> bool:
        rx = build_regex_from_schema(schema)
        dfa = compile_regex(rx)
        return dfa.fullmatch(
            json.dumps(value, separators=(", ", ": ")).encode())

    def test_flat_object(self):
        schema = {"type": "object",
                  "properties": {"name": {"type": "string"},
                                 "age": {"type": "integer"},
                                 "ok": {"type": "boolean"}}}
        assert self._dfa_accepts(schema, {"name": "bo", "age": 3,
                                          "ok": True})
        assert not self._dfa_accepts(schema, {"name": "bo", "age": "x",
                                              "ok": True})

    def test_nested_and_array(self):
        schema = {"type": "object", "properties": {
            "tags": {"type": "array", "items": {"type": "string"},
                     "maxItems": 3},
            "inner": {"type": "object",
                      "properties": {"x": {"type": "number"}}}}}
        assert self._dfa_accepts(schema, {"tags": ["a", "b"],
                                          "inner": {"x": 1.5}})
        assert not self._dfa_accepts(schema, {"tags": ["a", "b", "c", "d"],
                                              "inner": {"x": 1.5}})

    def test_enum_const_ref(self):
        schema = {"type": "object", "properties": {
            "kind": {"enum": ["cat", "dog"]},
            "v": {"const": 2},
            "next": {"$ref": "#/$defs/leaf"}},
            "$defs": {"leaf": {"type": "null"}}}
        assert self._dfa_accepts(schema, {"kind": "dog", "v": 2,
                                          "next": None})
        assert not self._dfa_accepts(schema, {"kind": "fox", "v": 2,
                                              "next": None})

    def test_anyof_and_string_bounds(self):
        schema = {"anyOf": [{"type": "integer"},
                            {"type": "string", "maxLength": 2}]}
        assert self._dfa_accepts(schema, 12)
        assert self._dfa_accepts(schema, "ab")
        assert not self._dfa_accepts(schema, "abc")

    def test_json_object_mode(self):
        dfa = compile_regex(json_value_regex(3))
        for v in [{"a": 1}, [1, 2, {"b": "c"}], "s", 3.5, True, None,
                  {"x": {"y": [1]}}]:
            assert dfa.fullmatch(
                json.dumps(v, separators=(", ", ": ")).encode()), v
        assert not dfa.fullmatch(b'{"a": }')
