"""Token-id -> byte-string extraction from a ``tokenizers`` tokenizer.

The FSM (fsm.py) matches tokens by the bytes they contribute to the output
text.  HF tokenizers store vocab entries in two encodings:

- byte-level BPE (GPT-2/Llama-3 style): each byte is a printable unicode
  proxy char (the classic ``bytes_to_unicode`` table) — invert it.
- SentencePiece (Llama-2/Mistral style): "▁" is the word-boundary
  space and raw bytes appear as "<0xNN>" literals.

Reference analog: outlines' ``adapt_tokenizer`` (used via
vllm/model_executor/guided_decoding/outlines_logits_processors.py).
"""

from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=1)
def _byte_decoder() -> dict[str, int]:
    """Inverse of GPT-2 bytes_to_unicode."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


def token_bytes_from_tokenizer(tokenizer, vocab_size: int | None = None
                               ) -> list[bytes]:
    """[vocab_size] list: token id -> UTF-8 bytes (b"" for special tokens,
    which guided decoding never allows)."""
    vocab: dict[str, int] = tokenizer.get_vocab()
    size = vocab_size or (max(vocab.values()) + 1 if vocab else 0)
    out: list[bytes] = [b""] * size

    byte_level = any(tok.startswith("Ġ") or tok == "Ġ"
                     for tok in vocab)
    bd = _byte_decoder()
    # added/special tokens (bos/eos/pad/<|...|>) contribute no text
    specials = set()
    try:
        added = tokenizer.get_added_tokens_decoder()
        specials = {tid for tid, t in added.items()
                    if getattr(t, "special", False)}
    except Exception:
        pass

    for tok, tid in vocab.items():
        if tid >= size or tid in specials:
            continue
        if byte_level:
            try:
                out[tid] = bytes(bd[c] for c in tok)
                continue
            except KeyError:
                pass  # special token with chars outside the table
        if tok.startswith("<0x") and tok.endswith(">") and len(tok) == 6:
            try:
                out[tid] = bytes([int(tok[3:5], 16)])
                continue
            except ValueError:
                pass
        out[tid] = tok.replace("▁", " ").encode("utf-8")
    return out
