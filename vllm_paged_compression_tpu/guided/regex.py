"""Regex -> byte-level DFA compiler for guided decoding.

The reference gets structured-output FSMs from the ``outlines`` library
(vllm/model_executor/guided_decoding/outlines_logits_processors.py); this
environment has no such dependency, so the compiler is self-contained:

    pattern  --parse-->  AST  --Thompson-->  NFA  --subset-->  ByteDFA

Design choices that matter for the TPU serving path:

- The DFA alphabet is **bytes** (tokens are matched by their UTF-8 byte
  strings), but transitions are stored per byte-*class*: all byte sets in
  the NFA induce an equivalence partition of 0..255, so the transition
  table is [num_states, num_classes] instead of [num_states, 256].  Token
  walking (fsm.py) then vectorizes over the vocabulary with numpy.
- Matching is fully anchored (the whole generated string must match), which
  is what constrained generation means.
- States from which no accepting state is reachable collapse into a single
  DEAD state, so "token allowed" == "token does not reach DEAD".

Supported syntax: literals (UTF-8 aware), escapes (\\d \\w \\s \\D \\W \\S,
\\n \\t \\r \\f \\v \\0, \\xNN, \\uNNNN, punctuation escapes), ``.``,
character classes ``[...]``/``[^...]`` with ranges, groups ``(...)`` /
``(?:...)``, alternation ``|``, quantifiers ``* + ? {m} {m,} {m,n}``.
Anchors ``^ $`` are accepted and ignored (matching is anchored anyway).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_ALL_BYTES = frozenset(range(256))
_DIGITS = frozenset(range(0x30, 0x3A))
_WORD = frozenset(
    list(range(0x30, 0x3A)) + list(range(0x41, 0x5B))
    + list(range(0x61, 0x7B)) + [0x5F])
_SPACE = frozenset([0x20, 0x09, 0x0A, 0x0D, 0x0C, 0x0B])
# "." = any char but newline.  At byte level, admit all non-newline bytes
# (0x80+ covers UTF-8 continuation/lead bytes; generated tokens are valid
# UTF-8 so this is exact on realizable strings).
_DOT = frozenset(b for b in range(256) if b != 0x0A)


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------

@dataclass
class _Lit:          # one byte-set edge
    bytes_: frozenset


@dataclass
class _Seq:
    parts: list


@dataclass
class _Alt:
    options: list


@dataclass
class _Rep:
    node: object
    lo: int
    hi: int   # -1 = unbounded


class RegexError(ValueError):
    pass


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def peek(self):
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self):
        ch = self.peek()
        if ch is None:
            raise RegexError(f"unexpected end of pattern: {self.p!r}")
        self.i += 1
        return ch

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise RegexError(
                f"unbalanced pattern at offset {self.i}: {self.p!r}")
        return node

    def _alt(self):
        options = [self._seq()]
        while self.peek() == "|":
            self.next()
            options.append(self._seq())
        return options[0] if len(options) == 1 else _Alt(options)

    def _seq(self):
        parts = []
        while self.peek() not in (None, "|", ")"):
            parts.append(self._repeat())
        return _Seq(parts)

    def _repeat(self):
        node = self._atom()
        while True:
            ch = self.peek()
            if ch == "*":
                self.next()
                node = _Rep(node, 0, -1)
            elif ch == "+":
                self.next()
                node = _Rep(node, 1, -1)
            elif ch == "?":
                self.next()
                node = _Rep(node, 0, 1)
            elif ch == "{":
                save = self.i
                rep = self._try_brace()
                if rep is None:
                    self.i = save
                    break
                node = _Rep(node, rep[0], rep[1])
            else:
                break
        return node

    def _try_brace(self):
        self.next()  # {
        spec = ""
        while self.peek() not in (None, "}"):
            spec += self.next()
        if self.peek() != "}":
            return None
        self.next()
        import re as _re
        m = _re.fullmatch(r"(\d+)(,(\d*)?)?", spec)
        if not m:
            return None
        lo = int(m.group(1))
        if m.group(2) is None:
            return (lo, lo)
        hi = int(m.group(3)) if m.group(3) else -1
        if hi != -1 and hi < lo:
            raise RegexError(f"bad repeat {{{spec}}}")
        return (lo, hi)

    def _atom(self):
        ch = self.next()
        if ch == "(":
            if self.peek() == "?":
                self.next()
                flag = self.next()
                if flag != ":":
                    raise RegexError(f"unsupported group (?{flag}...)")
            node = self._alt()
            if self.next() != ")":
                raise RegexError("missing )")
            return node
        if ch == "[":
            return self._char_class()
        if ch == ".":
            return _Lit(_DOT)
        if ch in ("^", "$"):
            return _Seq([])   # anchors: no-op (matching is anchored)
        if ch == "\\":
            return self._escape(in_class=False)
        if ch in ")|*+?":
            raise RegexError(f"unexpected {ch!r} at {self.i - 1}")
        return self._literal_char(ch)

    def _literal_char(self, ch: str):
        bs = ch.encode("utf-8")
        if len(bs) == 1:
            return _Lit(frozenset([bs[0]]))
        return _Seq([_Lit(frozenset([b])) for b in bs])

    def _escape(self, in_class: bool):
        ch = self.next()
        simple = {"n": 0x0A, "t": 0x09, "r": 0x0D, "f": 0x0C, "v": 0x0B,
                  "0": 0x00, "a": 0x07, "b": 0x08 if in_class else None}
        classes = {"d": _DIGITS, "D": _ALL_BYTES - _DIGITS,
                   "w": _WORD, "W": _ALL_BYTES - _WORD,
                   "s": _SPACE, "S": _ALL_BYTES - _SPACE}
        if ch in classes:
            return _Lit(classes[ch])
        if ch in simple and simple[ch] is not None:
            return _Lit(frozenset([simple[ch]]))
        if ch == "x":
            hx = self.next() + self.next()
            return _Lit(frozenset([int(hx, 16)]))
        if ch == "u":
            hx = "".join(self.next() for _ in range(4))
            return self._literal_char(chr(int(hx, 16)))
        # punctuation escape (\. \\ \[ \] \{ \} \" ...)
        return self._literal_char(ch)

    def _char_class(self):
        negate = False
        if self.peek() == "^":
            self.next()
            negate = True
        items: set[int] = set()
        first = True
        while True:
            ch = self.peek()
            if ch is None:
                raise RegexError("missing ]")
            if ch == "]" and not first:
                self.next()
                break
            first = False
            lo = self._class_atom()
            if isinstance(lo, frozenset):     # \d etc. inside class
                items |= lo
                continue
            if self.peek() == "-" and self.p[self.i + 1:self.i + 2] not in \
                    ("]", ""):
                self.next()
                hi = self._class_atom()
                if isinstance(hi, frozenset):
                    raise RegexError("bad class range")
                if hi < lo:
                    raise RegexError("reversed class range")
                items |= set(range(lo, hi + 1))
            else:
                items.add(lo)
        if negate:
            items = set(_ALL_BYTES) - items
        return _Lit(frozenset(items))

    def _class_atom(self):
        ch = self.next()
        if ch == "\\":
            node = self._escape(in_class=True)
            if isinstance(node, _Lit):
                bs = node.bytes_
                if len(bs) == 1:
                    return next(iter(bs))
                return bs
            # multi-byte literal inside class: treat each byte as member
            return frozenset(b for part in node.parts for b in part.bytes_)
        bs = ch.encode("utf-8")
        if len(bs) == 1:
            return bs[0]
        return frozenset(bs)    # non-ASCII in class: byte members (approx)


# --------------------------------------------------------------------------
# NFA (Thompson construction)
# --------------------------------------------------------------------------

@dataclass
class _NState:
    edges: list = field(default_factory=list)   # (byteset, target)
    eps: list = field(default_factory=list)


class _NFA:
    def __init__(self):
        self.states: list[_NState] = []

    def new(self) -> int:
        self.states.append(_NState())
        return len(self.states) - 1

    def build(self, node) -> tuple[int, int]:
        """Returns (start, end) fragment."""
        if isinstance(node, _Lit):
            s, e = self.new(), self.new()
            self.states[s].edges.append((node.bytes_, e))
            return s, e
        if isinstance(node, _Seq):
            s = e = self.new()
            for part in node.parts:
                ps, pe = self.build(part)
                self.states[e].eps.append(ps)
                e = pe
            return s, e
        if isinstance(node, _Alt):
            s, e = self.new(), self.new()
            for opt in node.options:
                os_, oe = self.build(opt)
                self.states[s].eps.append(os_)
                self.states[oe].eps.append(e)
            return s, e
        if isinstance(node, _Rep):
            s = e = self.new()
            for _ in range(node.lo):
                ps, pe = self.build(node.node)
                self.states[e].eps.append(ps)
                e = pe
            if node.hi == -1:
                ps, pe = self.build(node.node)
                self.states[e].eps.append(ps)
                self.states[pe].eps.append(e)   # loop
                return s, e
            tail_outs = [e]
            for _ in range(node.hi - node.lo):
                ps, pe = self.build(node.node)
                self.states[e].eps.append(ps)
                e = pe
                tail_outs.append(e)
            final = self.new()
            for t in tail_outs:
                self.states[t].eps.append(final)
            return s, final
        raise AssertionError(node)


# --------------------------------------------------------------------------
# DFA (subset construction over byte classes)
# --------------------------------------------------------------------------

class ByteDFA:
    """Anchored byte DFA.

    - ``trans``: [num_states + 1, num_classes] int32; row ``dead`` maps to
      itself.  Entry = next state (possibly ``dead``).
    - ``class_of``: [256] uint8/uint16 byte -> class id.
    - ``accept``: [num_states + 1] bool.
    - ``start``, ``dead``: state ids.
    """

    def __init__(self, trans: np.ndarray, class_of: np.ndarray,
                 accept: np.ndarray, start: int, dead: int):
        self.trans = trans
        self.class_of = class_of
        self.accept = accept
        self.start = start
        self.dead = dead

    @property
    def num_states(self) -> int:
        return self.trans.shape[0]

    def walk(self, state: int, data: bytes) -> int:
        for b in data:
            state = int(self.trans[state, self.class_of[b]])
        return state

    def fullmatch(self, data: bytes) -> bool:
        return bool(self.accept[self.walk(self.start, data)])


def compile_regex(pattern: str, max_states: int = 200_000) -> ByteDFA:
    ast = _Parser(pattern).parse()
    nfa = _NFA()
    start, end = nfa.build(ast)

    # ---- byte classes: partition 0..255 by membership signature ----------
    bytesets = []
    seen = {}
    for st in nfa.states:
        for bs, _ in st.edges:
            if bs not in seen:
                seen[bs] = len(bytesets)
                bytesets.append(bs)
    member = np.zeros((max(len(bytesets), 1), 256), dtype=bool)
    for i, bs in enumerate(bytesets):
        member[i, list(bs)] = True
    # signature per byte = column of `member`
    _, class_of = np.unique(member.T, axis=0, return_inverse=True)
    class_of = class_of.astype(np.int32)
    n_classes = int(class_of.max()) + 1
    rep_byte = np.zeros(n_classes, np.int32)
    for b in range(255, -1, -1):
        rep_byte[class_of[b]] = b

    # ---- eps closures -----------------------------------------------------
    n = len(nfa.states)
    closure_cache: dict[int, frozenset] = {}

    def eps_closure(seed) -> frozenset:
        stack = list(seed)
        out = set(seed)
        while stack:
            s = stack.pop()
            for t in nfa.states[s].eps:
                if t not in out:
                    out.add(t)
                    stack.append(t)
        return frozenset(out)

    # ---- subset construction ----------------------------------------------
    start_set = eps_closure([start])
    dstates = {start_set: 0}
    order = [start_set]
    trans_rows: list[list[int]] = []
    i = 0
    while i < len(order):
        cur = order[i]
        i += 1
        row = []
        for c in range(n_classes):
            b = int(rep_byte[c])
            targets = set()
            for s in cur:
                for bs, t in nfa.states[s].edges:
                    if b in bs:
                        targets.add(t)
            if not targets:
                row.append(-1)
                continue
            nxt = eps_closure(targets)
            if nxt not in dstates:
                if len(dstates) >= max_states:
                    raise RegexError(
                        f"regex too complex (> {max_states} DFA states)")
                dstates[nxt] = len(order)
                order.append(nxt)
            row.append(dstates[nxt])
        trans_rows.append(row)

    num = len(order)
    dead = num
    trans = np.full((num + 1, n_classes), dead, dtype=np.int32)
    for si, row in enumerate(trans_rows):
        for c, t in enumerate(row):
            trans[si, c] = dead if t == -1 else t
    accept = np.zeros(num + 1, dtype=bool)
    for sset, si in dstates.items():
        accept[si] = end in sset

    # ---- collapse states that cannot reach accept into DEAD ---------------
    live = accept.copy()
    changed = True
    while changed:
        changed = False
        reaches = live[trans].any(axis=1)   # state has an edge into live
        new_live = live | reaches
        new_live[dead] = False
        if (new_live != live).any():
            live = new_live
            changed = True
    remap = np.where(live, np.arange(num + 1), dead)
    trans = remap[trans]
    if not live[0] and not accept[0]:
        raise RegexError(f"regex matches nothing: {pattern!r}")

    return ByteDFA(trans=trans, class_of=class_of, accept=accept,
                   start=0, dead=dead)
