"""In-graph eviction math: token/page scoring, prompt keep-index selection,
and block-table victim machinery.

This is the TPU-native re-design of the reference's KVCachePruner
(vllm/attention/kvcache_prunner.py) and the decode pruning routines of
torch_cuda_sdpa.py: instead of per-request Python loops over CUDA streams,
everything here is fixed-shape jnp that runs inside the jitted step —
per-head top-k via double argsort, order-preserving keep-gather via a stable
boolean sort, and eviction-as-gather on the block table.

Key semantic notes (verified against the reference):

- Prompt pruning for score-based methods is **per-KV-head**: the reference
  builds a [T, heads] mask from per-head top-k and boolean-indexes the
  [T, heads, d] tensors, so each head keeps its own token subset, reassembled
  into dense rows (kvcache_prunner.py:140-149).  Kept entries preserve their
  original relative order.  Deliberate deviation: the reference's
  ``middle_key[mask].view(-1, H, hd)`` flattens token-major and re-chunks,
  which scrambles K/V across heads whenever heads keep different token sets
  (a head-1 slot can receive head-0 rows) — an indexing artifact, not a
  design choice.  Here each head's i-th kept row is that head's i-th kept
  token; the kept token *set* per head matches the reference exactly.
- Page (block) score = ||v||2 over head_dim, mean over heads, sum over the
  page's tokens (get_block_score, kvcache_prunner.py:51-66; sub-method fixed
  to value_l2, :13).
- Decode eviction removes one *table position* and shifts the rest left
  (_create_updated_block_tables, torch_cuda_sdpa.py:1562-1586); here that is
  a fixed-shape gather so it can run under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------

def token_scores(k: jnp.ndarray, v: jnp.ndarray, method: str) -> jnp.ndarray:
    """Per-token, per-KV-head scores, [T, Hkv].  Higher = more worth keeping.

    Mirrors get_token_score (kvcache_prunner.py:29-49) with sub_evict_method
    fixed to value_l2 for local/global.
    """
    if method in ("local", "global"):
        return jnp.linalg.norm(v.astype(jnp.float32), axis=-1)
    if method == "inverse_key_l2":
        key_l2 = jnp.linalg.norm(k.astype(jnp.float32), axis=-1)
        return 1.0 / (key_l2 + _EPS)
    raise ValueError(f"no token scores for method {method!r}")


def index_cache_pages(cache, pages: jnp.ndarray):
    """Gather pages from a cache pool leaf (plain array or QuantKV)."""
    from .quant import QuantKV
    if isinstance(cache, QuantKV):
        return QuantKV(q=cache.q[pages], s=cache.s[pages])
    return cache[pages]


def page_scores_from_cache(v_cache_pages) -> jnp.ndarray:
    """Value-L2 page scores for a batch of pages.

    v_cache_pages: [..., page_size, Hkv, d] (or the QuantKV equivalent,
    scored on dequantized values — quantized-KV eviction scoring has no
    reference prior art; the reference rejects fp8 KV with eviction,
    torch_cuda_sdpa.py:769-772) -> [...] scalar per page: ||v||2 over d,
    mean over heads, sum over page tokens (get_block_score value_l2 branch,
    kvcache_prunner.py:54-56).
    """
    from .quant import QuantKV
    if isinstance(v_cache_pages, QuantKV):
        # ||q*s||2 over d = s * ||q||2 (s >= 0): score without
        # materializing the dequantized page.
        norms = (jnp.linalg.norm(
            v_cache_pages.q.astype(jnp.float32), axis=-1)
            * v_cache_pages.s)
        return norms.mean(axis=-1).sum(axis=-1)
    norms = jnp.linalg.norm(v_cache_pages.astype(jnp.float32), axis=-1)
    return norms.mean(axis=-1).sum(axis=-1)


# ---------------------------------------------------------------------------
# prompt pruning
# ---------------------------------------------------------------------------

def _per_head_keep_rank(scores: jnp.ndarray) -> jnp.ndarray:
    """rank[t, h] = descending-score rank of token t within head h."""
    order = jnp.argsort(-scores, axis=0, stable=True)
    return jnp.argsort(order, axis=0, stable=True)


def prompt_keep_indices(scores: jnp.ndarray, q_len, block_size: int,
                        cache_budget: int, method: str,
                        out_len: int) -> jnp.ndarray:
    """Order-preserving per-head gather indices for evict-at-prefill.

    Args:
      scores:  [T, Hkv] token scores (pass zeros for streamingLLM methods,
               whose selection is position-only).
      q_len:   true prompt length (traced scalar; T is the padded bucket).
      out_len: static output length (>= max possible stored length).

    Returns gather_idx [out_len, Hkv]: for each head, the positions of the
    kept tokens in original order; rows past the true stored length point at
    arbitrary kept positions and must be masked by the caller.

    Selection mirrors prune_prompt (kvcache_prunner.py:76-165):
      sink  = [0, block_size)                      always kept
      tail  = [q_len - block_size - rem, q_len)    always kept
      middle keeps the top ``budget - 2*block_size`` tokens by score
      (streamingLLM: the *last* that many middle tokens).
    """
    scores_arr = scores
    n_heads = scores.shape[1]
    t_pad = scores_arr.shape[0]

    rem = q_len % block_size
    first_end = block_size
    middle_end = q_len - block_size - rem
    middle_len = jnp.maximum(middle_end - first_end, 0)
    middle_keep = jnp.minimum(
        jnp.maximum(cache_budget - 2 * block_size, 0), middle_len)

    pos = jnp.arange(t_pad)[:, None]                      # [T, 1]
    in_sink = pos < first_end
    in_tail = (pos >= middle_end) & (pos < q_len)
    in_middle = (pos >= first_end) & (pos < middle_end)

    if method in ("streamingLLM", "streamingLLM-1"):
        # Keep the last ``middle_keep`` middle tokens
        # (kvcache_prunner.py:94-99: middle slice start shifts right by the
        # evicted count).
        keep_middle = in_middle & (pos >= middle_end - middle_keep)
        keep = in_sink | in_tail | keep_middle
        keep = jnp.broadcast_to(keep, (t_pad, n_heads))
    else:
        # Score-based: per-head rank among *middle* tokens only.
        middle_scores = jnp.where(in_middle, scores_arr, -jnp.inf)
        rank = _per_head_keep_rank(middle_scores)
        keep_middle = in_middle & (rank < middle_keep)
        keep = in_sink | in_tail | keep_middle

    # Stable sort of (not keep): keeps come first, in position order.
    gather = jnp.argsort(~keep, axis=0, stable=True)      # [T, Hkv]
    return gather[:out_len]


def gather_pruned_kv(k: jnp.ndarray, v: jnp.ndarray,
                     gather_idx: jnp.ndarray):
    """Apply per-head keep indices: k/v [T, Hkv, d], gather_idx [S, Hkv]
    -> [S, Hkv, d] dense pruned tensors (per-head row mixing, matching the
    reference's boolean-mask reassembly, kvcache_prunner.py:148-149)."""
    return (jnp.take_along_axis(k, gather_idx[:, :, None], axis=0),
            jnp.take_along_axis(v, gather_idx[:, :, None], axis=0))


# ---------------------------------------------------------------------------
# decode-time eviction
# ---------------------------------------------------------------------------

def select_victims(page_scores: jnp.ndarray, block_tables: jnp.ndarray,
                   evict_flags: jnp.ndarray, num_pages_per_seq: jnp.ndarray,
                   topk_blocks: int) -> jnp.ndarray:
    """Pick the victim *table index* per sequence by argmin page score.

    Candidates are table positions [1, 1+topk) for local or [1, last) for
    global (torch_cuda_sdpa.py:1505-1544); ``topk_blocks == -1`` means
    global.  Returns [B] int32; -1 where no eviction fires.
    """
    b, p = block_tables.shape
    idx = jnp.arange(p)[None, :]
    if topk_blocks > 0:
        cand = (idx >= 1) & (idx < 1 + topk_blocks) \
            & (idx < num_pages_per_seq[:, None] - 1)
    else:
        cand = (idx >= 1) & (idx < num_pages_per_seq[:, None] - 1)
    scores = page_scores[block_tables]                    # [B, P]
    scores = jnp.where(cand, scores, jnp.inf)
    victim = jnp.argmin(scores, axis=1).astype(jnp.int32)
    return jnp.where(evict_flags, victim, -1)


def shift_block_tables(block_tables: jnp.ndarray,
                       victims: jnp.ndarray) -> jnp.ndarray:
    """Remove the victim entry and shift the tail left (fixed shape).

    new[i, j] = old[i, j + (j >= victim_i)]; rows with victim < 0 unchanged.
    The final (now-stale) entry is left in place — callers mask by kv_len.
    Matches _create_updated_block_tables (torch_cuda_sdpa.py:1562-1586)
    without the clone-loop.
    """
    b, p = block_tables.shape
    j = jnp.arange(p)[None, :]
    vict = victims[:, None]
    src = jnp.where((vict >= 0) & (j >= vict), jnp.minimum(j + 1, p - 1), j)
    return jnp.take_along_axis(block_tables, src, axis=1)
