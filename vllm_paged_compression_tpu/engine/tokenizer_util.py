"""Optional tokenizer loading (reference transformers_utils/tokenizer.py).

Uses the `tokenizers` library directly (tokenizer.json) — no transformers
import on the serving path.  Returns None when no tokenizer files exist;
the engine then works in token-id space only (the benchmark path)."""

from __future__ import annotations

import os
from typing import Optional


def maybe_load_tokenizer(path: Optional[str]):
    if not path:
        return None
    tok_json = os.path.join(path, "tokenizer.json")
    if not os.path.exists(tok_json):
        return None
    try:
        from tokenizers import Tokenizer
        return Tokenizer.from_file(tok_json)
    except Exception:
        return None
