"""Token-level FSM over a byte DFA: per-state allowed-token bitmasks.

TPU-native analog of the reference's outlines ``RegexLogitsProcessor``
(vllm/model_executor/guided_decoding/outlines_logits_processors.py) — but
instead of biasing logits on the host (which would need the full [V] logits
fetched every step over a slow link), the host uploads a packed uint32
bitmask (ceil(V/32) words ≈ 4 KB for a 128k vocab) and the decode program
unmasks in-graph (ops.sampling.apply_token_bitmask).

The token-transition closure is vectorized: all vocabulary tokens are
walked through the DFA simultaneously with numpy gathers over the
class-transition table (max-token-len gather steps instead of a Python
loop over 128k tokens).  Masks are cached per DFA state.
"""

from __future__ import annotations

import numpy as np

from .regex import ByteDFA


class TokenFSM:
    """``vocab``: token id -> byte string (b"" disables the token).
    ``eos_token_id``: allowed exactly in accepting DFA states."""

    def __init__(self, dfa: ByteDFA, vocab: list[bytes],
                 eos_token_id: int | None, vocab_size: int | None = None):
        self.dfa = dfa
        self.eos_token_id = eos_token_id
        v = vocab_size if vocab_size is not None else len(vocab)
        assert v >= len(vocab), (v, len(vocab))
        self.vocab_size = v
        self.num_words = (v + 31) // 32
        self.start = dfa.start

        maxlen = max((len(t) for t in vocab), default=1) or 1
        n_tok = len(vocab)
        # Token byte-class matrix [n_tok, maxlen]; pad with class 0 (inert:
        # padded steps are masked by tok_lens).
        self._tok_cls = np.zeros((n_tok, maxlen), dtype=np.int32)
        self._tok_lens = np.zeros(n_tok, dtype=np.int32)
        class_of = dfa.class_of
        for tid, tok in enumerate(vocab):
            self._tok_lens[tid] = len(tok)
            if tok:
                self._tok_cls[tid, :len(tok)] = class_of[
                    np.frombuffer(tok, dtype=np.uint8)]
        self._vocab = vocab
        self._mask_cache: dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------

    def _end_states(self, state: int) -> np.ndarray:
        """[n_tok] end state of every token walked from ``state``."""
        trans = self.dfa.trans
        cur = np.full(len(self._vocab), state, dtype=np.int32)
        for i in range(self._tok_cls.shape[1]):
            active = self._tok_lens > i
            if not active.any():
                break
            nxt = trans[cur, self._tok_cls[:, i]]
            cur = np.where(active, nxt, cur)
        return cur

    def allowed_mask(self, state: int) -> np.ndarray:
        """Packed [num_words] uint32 bitmask of allowed token ids at
        ``state`` (bit ``tid % 32`` of word ``tid // 32``).  Guarantees at
        least one bit set: at a dead end, EOS is force-allowed so the
        request can terminate."""
        cached = self._mask_cache.get(state)
        if cached is not None:
            return cached
        end = self._end_states(state)
        allowed = (end != self.dfa.dead) & (self._tok_lens > 0)
        bits = np.zeros(self.num_words * 32, dtype=bool)
        bits[:len(allowed)] = allowed
        if self.eos_token_id is not None and (
                self.dfa.accept[state] or not allowed.any()):
            bits[self.eos_token_id] = True
        if not bits.any() and self.eos_token_id is not None:
            bits[self.eos_token_id] = True
        words = np.packbits(
            bits.reshape(-1, 32)[:, ::-1], axis=1, bitorder="big")
        mask = words.view(">u4").astype(np.uint32).reshape(-1)
        self._mask_cache[state] = mask
        return mask

    def advance(self, state: int, token_id: int) -> int:
        """DFA state after emitting ``token_id`` (EOS keeps the state)."""
        if token_id == self.eos_token_id or token_id >= len(self._vocab):
            return state
        return self.dfa.walk(state, self._vocab[token_id])

    def is_accept(self, state: int) -> bool:
        return bool(self.dfa.accept[state])

    def only_eos(self, state: int) -> bool:
        """True when nothing but EOS can legally follow."""
        mask = self.allowed_mask(state)
        if self.eos_token_id is None:
            return not mask.any()
        eos_word = np.uint32(1 << (self.eos_token_id % 32))
        without = mask.copy()
        without[self.eos_token_id // 32] &= ~eos_word
        return not without.any()


class GuidedState:
    """Per-sequence guided-decoding cursor (attached to ``Sequence``)."""

    __slots__ = ("fsm", "state")

    def __init__(self, fsm: TokenFSM):
        self.fsm = fsm
        self.state = fsm.start

    def mask(self) -> np.ndarray:
        return self.fsm.allowed_mask(self.state)

    def advance(self, token_id: int) -> None:
        self.state = self.fsm.advance(self.state, token_id)
