"""Tokenizer loading + incremental detokenization.

Loading (reference vllm/transformers_utils/tokenizer.py): prefers the fast
`tokenizers` library (tokenizer.json); falls back to the in-tree pure-Python
sentencepiece reader for `tokenizer.model`-only checkpoints (most
Llama/Mistral releases).  Returns None when no tokenizer files exist; the
engine then works in token-id space only (the benchmark path).

Incremental decode (reference vllm/transformers_utils/detokenizer.py
detokenize_incrementally): re-decoding the whole output every step is
O(n^2) per request; instead each sequence keeps (prefix_offset,
read_offset) into its output ids and we only decode the small window since
the last emission, holding back text that still ends in an incomplete
UTF-8 sequence (U+FFFD) until the bytes complete.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_load_tokenizer(path: Optional[str]):
    if not path:
        return None
    tok_json = os.path.join(path, "tokenizer.json")
    if os.path.exists(tok_json):
        try:
            from tokenizers import Tokenizer
            return Tokenizer.from_file(tok_json)
        except Exception:
            return None
    tok_model = os.path.join(path, "tokenizer.model")
    if os.path.exists(tok_model):
        try:
            from .sp_tokenizer import SentencePieceTokenizer
            return SentencePieceTokenizer.from_file(tok_model)
        except Exception:
            return None
    return None


def detokenize_incrementally(tokenizer, token_ids: list[int],
                             prefix_offset: int, read_offset: int,
                             finished: bool = False,
                             ) -> tuple[str, int, int]:
    """Decode the tokens appended since the last call.

    Returns (new_text, new_prefix_offset, new_read_offset).  new_text is ""
    when the tail still ends in an incomplete multi-byte sequence (unless
    `finished`, which flushes everything).
    """
    if read_offset >= len(token_ids) and not finished:
        return "", prefix_offset, read_offset
    prefix_text = tokenizer.decode(token_ids[prefix_offset:read_offset])
    new_text = tokenizer.decode(token_ids[prefix_offset:])
    if len(new_text) > len(prefix_text) and \
            (finished or not new_text.endswith("�")):
        delta = new_text[len(prefix_text):]
        return delta, read_offset, len(token_ids)
    # Hold back: incomplete UTF-8 tail (byte-level BPE mid-codepoint) or
    # no visible text yet.  Keep offsets so the window grows next call.
    if finished:
        return new_text[len(prefix_text):], read_offset, len(token_ids)
    return "", prefix_offset, read_offset
