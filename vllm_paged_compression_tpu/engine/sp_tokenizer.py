"""Pure-Python sentencepiece tokenizer for `tokenizer.model` checkpoints.

The image ships no `sentencepiece` module, but most Llama/Mistral
checkpoints ship only the sentencepiece `tokenizer.model` protobuf (no
tokenizer.json).  The serialized file is a `ModelProto`
(sentencepiece_model.proto); we parse the three fields we need straight
from the protobuf wire format — pieces (piece/score/type), the trainer
spec's model_type + byte_fallback, and the normalizer's add_dummy_prefix —
and implement encode (BPE merge loop / unigram Viterbi) and decode in
Python.  Reference surface: vllm/transformers_utils/tokenizer.py
(get_tokenizer -> sentencepiece-backed slow tokenizers).

Normalization: the NormalizerSpec's name + flags are honored — nfkc-family
normalizers apply unicodedata NFKC (plus casefold for *_cf) and the
documented NMT rules (control chars stripped, unicode spaces folded to
ASCII space, ZWJ/ZWNJ/BOM removed), and remove_extra_whitespaces
collapses runs.  The one remaining approximation: custom PRECOMPILED
charsmaps (normalizers trained with user-supplied rules rather than the
stock nfkc tables) are not decoded; stock checkpoints (llama/mistral
use "identity" or "nmt_nfkc") match.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Iterator, Optional

WS = "▁"  # sentencepiece whitespace marker

# SentencePiece.Type enum values (sentencepiece_model.proto)
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6


# ---------------------------------------------------------------------------
# protobuf wire-format mini-reader


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message body."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fnum, wtype = key >> 3, key & 7
        if wtype == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wtype == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wtype == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:  # groups (3/4) never appear in sentencepiece protos
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


@dataclass
class _Piece:
    piece: str
    score: float
    type: int


@dataclass
class SpModel:
    pieces: list[_Piece] = field(default_factory=list)
    model_type: int = 1        # UNIGRAM=1 BPE=2 WORD=3 CHAR=4
    byte_fallback: bool = False
    add_dummy_prefix: bool = True
    unk_id: int = 0
    normalizer: str = "nmt_nfkc"     # NormalizerSpec.name
    remove_extra_ws: bool = True     # NormalizerSpec.remove_extra_whitespaces


def parse_model_proto(data: bytes) -> SpModel:
    m = SpModel()
    for fnum, _wt, val in _fields(data):
        if fnum == 1:  # repeated SentencePiece pieces
            piece, score, ptype = "", 0.0, NORMAL
            for pf, pw, pv in _fields(val):
                if pf == 1:
                    piece = pv.decode("utf-8")
                elif pf == 2:
                    score = struct.unpack("<f", pv)[0]
                elif pf == 3:
                    ptype = pv
            m.pieces.append(_Piece(piece, score, ptype))
        elif fnum == 2:  # TrainerSpec
            for tf, tw, tv in _fields(val):
                if tf == 3:       # model_type
                    m.model_type = tv
                elif tf == 35:    # byte_fallback
                    m.byte_fallback = bool(tv)
                elif tf == 40:    # unk_id
                    m.unk_id = tv
        elif fnum == 3:  # NormalizerSpec
            for nf, nw, nv in _fields(val):
                if nf == 1:       # name
                    m.normalizer = nv.decode("utf-8", "replace")
                elif nf == 3:     # add_dummy_prefix
                    m.add_dummy_prefix = bool(nv)
                elif nf == 4:     # remove_extra_whitespaces
                    m.remove_extra_ws = bool(nv)
    return m


# NMT normalization rules (sentencepiece builder.cc BuildNmtNFKCMap):
# control characters are dropped, the unicode space family folds to
# ASCII space, and zero-width joiners/BOM are removed.
_NMT_TO_SPACE = {0x0009, 0x000A, 0x000D, 0x0085, 0x00A0, 0x1680, 0x2028,
                 0x2029, 0x202F, 0x205F, 0x3000} \
    | set(range(0x2000, 0x200B))
_NMT_REMOVE = ({0x000B, 0x007F, 0x008F, 0x009F, 0x00AD, 0x200C, 0x200D,
                0x200E, 0x200F, 0xFEFF, 0xFFFD}
               | set(range(0x0001, 0x0009))
               | set(range(0x000E, 0x0020)))


def _nmt_fold(text: str) -> str:
    out = []
    for ch in text:
        cp = ord(ch)
        if cp in _NMT_REMOVE:
            continue
        out.append(" " if cp in _NMT_TO_SPACE else ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# encode / decode


class _Encoding:
    """Mimics tokenizers.Encoding for the call sites that read `.ids`."""

    __slots__ = ("ids",)

    def __init__(self, ids: list[int]):
        self.ids = ids


class SentencePieceTokenizer:
    """Drop-in for the subset of `tokenizers.Tokenizer` the engine uses:
    encode(text[, pair]).ids, decode(ids), get_vocab()."""

    def __init__(self, model: SpModel):
        self.model = model
        self._vocab: dict[str, int] = {}
        for i, p in enumerate(model.pieces):
            self._vocab.setdefault(p.piece, i)
        self._byte_ids: dict[int, int] = {}
        self._id_is_byte = [False] * len(model.pieces)
        self._id_is_control = [False] * len(model.pieces)
        for i, p in enumerate(model.pieces):
            if p.type == BYTE and len(p.piece) == 6:  # "<0xAB>"
                self._byte_ids[int(p.piece[3:5], 16)] = i
                self._id_is_byte[i] = True
            elif p.type in (CONTROL, UNUSED):
                self._id_is_control[i] = True
        self._max_piece_len = max(
            (len(p.piece) for p in model.pieces), default=1)

    @classmethod
    def from_file(cls, path: str) -> "SentencePieceTokenizer":
        with open(path, "rb") as f:
            return cls(parse_model_proto(f.read()))

    # -- interface parity with tokenizers.Tokenizer ------------------------

    def get_vocab(self) -> dict[str, int]:
        return dict(self._vocab)

    def get_vocab_size(self) -> int:
        return len(self.model.pieces)

    def token_to_id(self, token: str) -> Optional[int]:
        return self._vocab.get(token)

    def id_to_token(self, idx: int) -> Optional[str]:
        if 0 <= idx < len(self.model.pieces):
            return self.model.pieces[idx].piece
        return None

    def encode(self, text: str, pair: Optional[str] = None) -> _Encoding:
        ids = self._encode_str(text)
        if pair is not None:
            ids = ids + self._encode_str(pair)
        return _Encoding(ids)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        parts: list[str] = []
        byte_buf = bytearray()

        def flush() -> None:
            if byte_buf:
                parts.append(byte_buf.decode("utf-8", errors="replace"))
                byte_buf.clear()

        for i in ids:
            i = int(i)
            if not 0 <= i < len(self.model.pieces):
                continue
            if self._id_is_byte[i]:
                byte_buf.append(int(self.model.pieces[i].piece[3:5], 16))
                continue
            flush()
            if self._id_is_control[i] and skip_special_tokens:
                continue
            p = self.model.pieces[i]
            if p.type == UNKNOWN:
                parts.append(" ⁇ ")
            else:
                parts.append(p.piece)
        flush()
        text = "".join(parts).replace(WS, " ")
        if self.model.add_dummy_prefix and text.startswith(" "):
            text = text[1:]
        return text

    # -- internals ----------------------------------------------------------

    def _normalize(self, text: str) -> str:
        name = self.model.normalizer
        if "nfkc" in name:
            import unicodedata
            if name.startswith("nmt"):
                text = _nmt_fold(text)
            text = unicodedata.normalize("NFKC", text)
            if name.endswith("_cf"):
                text = text.casefold()
        if self.model.remove_extra_ws:
            # Collapse runs and strip edges (NormalizerSpec semantics).
            while "  " in text:
                text = text.replace("  ", " ")
            text = text.strip(" ")
        text = text.replace(" ", WS)
        if self.model.add_dummy_prefix:
            text = WS + text
        return text

    def _encode_str(self, text: str) -> list[int]:
        if not text:
            return []
        norm = self._normalize(text)
        if self.model.model_type == 2:  # BPE
            return self._encode_bpe(norm)
        return self._encode_unigram(norm)

    def _char_ids(self, ch: str) -> list[int]:
        """Single character -> piece id(s), using byte fallback or unk."""
        cid = self._vocab.get(ch)
        if cid is not None:
            return [cid]
        if self.model.byte_fallback and self._byte_ids:
            return [self._byte_ids[b] for b in ch.encode("utf-8")
                    if b in self._byte_ids]
        return [self.model.unk_id]

    def _encode_bpe(self, text: str) -> list[int]:
        """Greedy highest-score adjacent merge, the sentencepiece BPE
        decoder-equivalent (merge the best-scoring joinable pair until no
        adjacent pair concatenates to an in-vocab piece)."""
        symbols: list[str] = list(text)
        # Seed: replace unknown single characters by byte-fallback markers
        # AFTER the merge loop (merging only ever happens between in-vocab
        # or still-mergeable strings, matching sp behavior of operating on
        # the raw character sequence).
        while len(symbols) > 1:
            best_score = None
            best_i = -1
            for i in range(len(symbols) - 1):
                merged = symbols[i] + symbols[i + 1]
                mid = self._vocab.get(merged)
                if mid is None:
                    continue
                s = self.model.pieces[mid].score
                if best_score is None or s > best_score:
                    best_score, best_i = s, i
            if best_i < 0:
                break
            symbols[best_i:best_i + 2] = [symbols[best_i]
                                          + symbols[best_i + 1]]
        ids: list[int] = []
        for sym in symbols:
            sid = self._vocab.get(sym)
            if sid is not None:
                ids.append(sid)
            else:
                for ch in sym:
                    ids.extend(self._char_ids(ch))
        return ids

    def _encode_unigram(self, text: str) -> list[int]:
        """Viterbi over piece scores (sentencepiece unigram inference)."""
        n = len(text)
        NEG = -1e18
        best = [NEG] * (n + 1)
        back: list[Optional[tuple[int, int]]] = [None] * (n + 1)
        best[0] = 0.0
        unk_penalty = min((p.score for p in self.model.pieces
                           if p.type == NORMAL), default=-10.0) - 10.0
        for i in range(n):
            if best[i] == NEG:
                continue
            hi = min(n, i + self._max_piece_len)
            matched = False
            for j in range(i + 1, hi + 1):
                pid = self._vocab.get(text[i:j])
                if pid is None:
                    continue
                p = self.model.pieces[pid]
                if p.type in (CONTROL, UNUSED, BYTE):
                    continue
                matched = True
                sc = best[i] + p.score
                if sc > best[j]:
                    best[j] = sc
                    back[j] = (i, pid)
            if not matched:
                # unknown char: single-char hop via byte fallback / unk
                sc = best[i] + unk_penalty
                if sc > best[i + 1]:
                    best[i + 1] = sc
                    back[i + 1] = (i, -1)
        ids_rev: list[int] = []
        j = n
        while j > 0:
            step = back[j]
            if step is None:  # unreachable guard: fall back one char
                j -= 1
                continue
            i, pid = step
            if pid >= 0:
                ids_rev.append(pid)
            else:
                for cid in reversed(self._char_ids(text[i:j])):
                    ids_rev.append(cid)
            j = i
        return list(reversed(ids_rev))


# ---------------------------------------------------------------------------
# test-support: serialize a tiny ModelProto (wire format writer) so unit
# tests can build models without the sentencepiece library.


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(fnum: int, payload: bytes) -> bytes:
    return _varint((fnum << 3) | 2) + _varint(len(payload)) + payload


def serialize_model_proto(pieces: list[tuple[str, float, int]],
                          model_type: int = 1,
                          byte_fallback: bool = False,
                          add_dummy_prefix: bool = True,
                          normalizer: str = "identity",
                          remove_extra_ws: bool = False) -> bytes:
    out = bytearray()
    for piece, score, ptype in pieces:
        body = (_ld(1, piece.encode("utf-8"))
                + _varint((2 << 3) | 5) + struct.pack("<f", score)
                + _varint((3 << 3) | 0) + _varint(ptype))
        out += _ld(1, body)
    trainer = (_varint((3 << 3) | 0) + _varint(model_type)
               + _varint((35 << 3) | 0) + _varint(int(byte_fallback)))
    out += _ld(2, trainer)
    norm = (_ld(1, normalizer.encode("utf-8"))
            + _varint((3 << 3) | 0) + _varint(int(add_dummy_prefix))
            + _varint((4 << 3) | 0) + _varint(int(remove_extra_ws)))
    out += _ld(3, norm)
    return bytes(out)
