"""Speculative decoding (reference vllm/spec_decode/ — SURVEY C16).

Round-1 scope: the **ngram** proposer (reference ngram_worker.py — no
draft model, proposals come from matching the request's own history) with
greedy batched verification.  The verify pass is one fixed-shape program
that reuses the paged-decode attention kernel with B·(k+1) effective query
rows (per-row kv lengths expose the in-flight proposal prefix), so no new
kernel is needed.  Rollback of rejected tokens is free under paged
masking: their KV rows sit past the committed kv_len and are overwritten
by later steps.

Like the reference (assert at vllm/engine/llm_engine.py:1182), speculative
decoding is mutually exclusive with paged eviction.
"""

from .config import SpeculativeConfig  # noqa: F401
from .ngram import propose_ngram  # noqa: F401
