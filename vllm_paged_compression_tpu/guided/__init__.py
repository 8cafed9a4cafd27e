"""Guided (structured-output) decoding.

TPU-native re-design of the reference's guided-decoding stack
(vllm/model_executor/guided_decoding/ + outlines): the constraint compiles
to a byte-level DFA on the host, per-step allowed-token sets travel to the
device as packed uint32 bitmasks (~4 KB per sequence for a 128k vocab), and
the decode program applies them in-graph before sampling
(ops/sampling.py apply_token_bitmask).  Guided sequences run single-step
decode windows — the FSM must observe each token before the next mask.
"""

from __future__ import annotations

import hashlib
import json

from .fsm import GuidedState, TokenFSM
from .json_schema import build_regex_from_schema, json_value_regex
from .regex import ByteDFA, RegexError, compile_regex
from .vocab import token_bytes_from_tokenizer

__all__ = [
    "ByteDFA", "GuidedState", "RegexError", "TokenFSM",
    "build_regex_from_schema", "compile_regex", "get_guided_fsm",
    "guided_regex_of", "json_value_regex", "token_bytes_from_tokenizer",
]


def guided_regex_of(gd) -> str:
    """Resolve a GuidedDecodingParams to its regex."""
    if gd.regex is not None:
        return gd.regex
    if gd.json is not None:
        return build_regex_from_schema(gd.json)
    if gd.choice is not None:
        from .json_schema import _escape_literal
        return "(?:" + "|".join(_escape_literal(c) for c in gd.choice) + ")"
    if gd.json_object:
        return json_value_regex(3)
    if gd.grammar is not None:
        raise ValueError("guided_grammar (CFG) is not supported; use "
                         "guided_json / guided_regex / guided_choice")
    raise ValueError("empty GuidedDecodingParams")


_FSM_CACHE: dict[tuple, TokenFSM] = {}


def get_guided_fsm(gd, vocab: list[bytes], eos_token_id,
                   vocab_size: int) -> TokenFSM:
    """Compile (cached) the token FSM for a GuidedDecodingParams against a
    vocabulary.  The cache key hashes the resolved regex and the vocab
    identity, so repeated requests with the same schema reuse the compiled
    automaton (the reference caches outlines FSMs the same way)."""
    pattern = guided_regex_of(gd)
    sample = b"\x00".join(vocab[::max(1, len(vocab) // 64)])
    vkey = (len(vocab), hashlib.sha256(sample).hexdigest())
    key = (hashlib.sha256(pattern.encode()).hexdigest(), vkey,
           eos_token_id, vocab_size)
    fsm = _FSM_CACHE.get(key)
    if fsm is None:
        dfa = compile_regex(pattern)
        fsm = TokenFSM(dfa, vocab, eos_token_id, vocab_size=vocab_size)
        _FSM_CACHE[key] = fsm
    return fsm
