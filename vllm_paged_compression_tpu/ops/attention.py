"""Attention reference implementations in pure jnp.

These are the semantic oracles for the Pallas kernels (ops/pallas/*) and the
always-available fallback path.  They cover the three attention shapes the
reference engine needs:

- ``prefill_attention``        — full causal self-attention over one prompt
  (reference: per-seq torch.sdpa loop, torch_cuda_sdpa.py:1069-1127).
- ``pruned_prefill_attention`` — queries = all prompt tokens, keys = the
  pruned subset, with torch-sdpa ``is_causal`` top-left-aligned masking
  (query i attends kept-key j iff j <= i) — the evict-then-attend prefill
  semantics of torch_cuda_sdpa.py:1118-1125.
- ``paged_decode_attention``   — one query token per sequence against the
  paged KV cache through a block table (reference: PagedAttention
  forward_decode → csrc paged_attention_v1/v2).

All functions take [tokens, heads, head_dim] layouts and handle GQA by
logical head-group broadcast (no materialized repeat_interleave — the einsum
reshapes queries to [kv_heads, group, ...] instead, which XLA maps onto the
MXU without duplicating K/V bytes).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_NEG_INF = -2.0**30  # large-negative instead of -inf: avoids NaNs for fully
                     # masked rows (padded queries), matches masked-softmax
                     # behavior of the CUDA kernels for valid rows.


def alibi_slopes(num_heads: int, variant: str = "bloom",
                 bias_max: float = 8.0) -> list[float]:
    """Per-head ALiBi slopes.

    ``bloom``: the closed form used by Bloom / JAIS / Baichuan-13B
    (reference vllm/model_executor/models/jais.py:57-69 and HF
    build_alibi_tensor) — floor power of two + every-other extras.
    ``mpt``: MosaicML's variant (HF build_mpt_alibi_tensor) — ceil power
    of two scaled by ``alibi_bias_max``, odd slopes first for the
    non-power-of-two remainder.  The two agree when num_heads is a power
    of two and bias_max is 8.
    """
    if variant == "mpt":
        np2 = 2 ** math.ceil(math.log2(num_heads))
        base = [(i + 1) * bias_max / np2 for i in range(np2)]
        slopes = [1.0 / 2 ** b for b in base]
        if np2 != num_heads:
            slopes = (slopes[1::2] + slopes[0::2])[:num_heads]
        return slopes

    def pow2_slopes(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start ** (i + 1) for i in range(n)]

    if math.log2(num_heads).is_integer():
        return pow2_slopes(num_heads)
    c = 2 ** math.floor(math.log2(num_heads))
    return pow2_slopes(c) + \
        alibi_slopes(2 * c, variant)[0::2][:num_heads - c]


def _alibi_bias(slopes: jnp.ndarray, num_kv_heads: int,
                key_pos: jnp.ndarray) -> jnp.ndarray:
    """[Hkv, G, 1, S] bias = slope * key_position.  ALiBi's canonical bias
    is slope * (j - i); softmax is shift-invariant per query row, so the
    absolute-key-position form is equivalent wherever the row's valid key
    set is contiguous from 0 (HF build_alibi_tensor uses the same trick).
    """
    s = slopes.astype(jnp.float32).reshape(num_kv_heads, -1)
    return s[:, :, None, None] * key_pos.astype(jnp.float32)


def _group_query(q: jnp.ndarray, num_kv_heads: int):
    """[T, H, d] -> [T, Hkv, G, d] where H = Hkv * G."""
    t, h, d = q.shape
    group = h // num_kv_heads
    return q.reshape(t, num_kv_heads, group, d), group


def _masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray):
    scores = jnp.where(mask, scores, _NEG_INF)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    return probs / (jnp.sum(probs, axis=-1, keepdims=True) + 1e-9)


def _softcap(scores: jnp.ndarray, cap):
    """Gemma2-style attention logit soft-capping (applied pre-mask)."""
    if cap is None:
        return scores
    return cap * jnp.tanh(scores / cap)


def blocksparse_allowed(q_pos: jnp.ndarray, k_pos: jnp.ndarray,
                        num_heads: int, block: int, local: int,
                        vert: int, homo: bool) -> jnp.ndarray:
    """Phi-3-small blocksparse pattern (reference
    vllm/attention/ops/blocksparse_attention/utils.py get_sparse_attn_mask):
    key block allowed iff within ``local`` blocks of the query block or on
    a vertical stride column; non-homo heads slide the stride by
    ``max(1, vert // num_heads)`` per head.  Returns bool
    [H or 1, Tq, Tk] (causality applied by the caller)."""
    qb = q_pos // block
    kb = k_pos // block
    local_ok = (qb[..., :, None] - kb[..., None, :]) < local
    if homo:
        vert_ok = (kb + 1) % vert == 0
        return (local_ok | vert_ok[..., None, :])[None]
    step = max(1, vert // num_heads)
    offs = jnp.arange(num_heads) * step                  # [H]
    vert_ok = (kb[None, :] + offs[:, None] + 1) % vert == 0   # [H, Tk]
    return local_ok[None] | vert_ok[:, None, :]


def prefill_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      scale: float, q_len: jnp.ndarray | int,
                      softcap: float | None = None,
                      alibi_slopes: jnp.ndarray | None = None,
                      bidirectional: bool = False,
                      extra_mask: jnp.ndarray | None = None
                      ) -> jnp.ndarray:
    """Causal self-attention for one (padded) prompt.

    q: [T, H, d], k/v: [T, Hkv, d]; positions beyond ``q_len`` are padding.
    Returns [T, H, d] (garbage rows at padding positions).

    ``bidirectional``: prefix-LM prompts (PaliGemma: image + text prompt
    tokens attend to each other with NO causal mask, HF
    modeling_paligemma causal-mask construction; generated tokens are
    causal as usual because decode attends the whole past anyway).
    """
    t = q.shape[0]
    qg, group = _group_query(q, k.shape[1])
    scores = _softcap(
        jnp.einsum("tkgd,skd->kgts", qg.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale, softcap)
    if alibi_slopes is not None:
        scores = scores + _alibi_bias(alibi_slopes, k.shape[1],
                                      jnp.arange(t))
    pos = jnp.arange(t)
    causal = (jnp.ones((t, t), bool) if bidirectional
              else pos[:, None] >= pos[None, :])
    valid = pos[None, :] < q_len
    mask = (causal & valid)[None, None]
    if extra_mask is not None:
        # Per-head structured mask (blocksparse): [H or 1, Tq, Tk] ->
        # [kH, g, Tq, Tk].
        em = jnp.broadcast_to(extra_mask, (q.shape[1], t, t))
        mask = mask & em.reshape(k.shape[1], group, t, t)
    probs = _masked_softmax(scores, mask)
    out = jnp.einsum("kgts,skd->tkgd", probs, v.astype(jnp.float32))
    return out.reshape(t, -1, q.shape[-1]).astype(q.dtype)


def pruned_prefill_attention(q: jnp.ndarray, k_kept: jnp.ndarray,
                             v_kept: jnp.ndarray, scale: float,
                             q_len: jnp.ndarray | int,
                             kept_len: jnp.ndarray | int,
                             softcap: float | None = None,
                             alibi_slopes: jnp.ndarray | None = None
                             ) -> jnp.ndarray:
    """Evict-then-attend prefill: all queries vs the pruned key set.

    torch.sdpa with ``is_causal=True`` on an [L, S] problem builds a
    *top-left aligned* triangular mask (query i sees keys j <= i), so late
    queries see every kept key and early queries see only the first few kept
    rows — we reproduce that exactly (torch_cuda_sdpa.py:1118-1125).
    """
    t = q.shape[0]
    s = k_kept.shape[0]
    qg, group = _group_query(q, k_kept.shape[1])
    scores = _softcap(
        jnp.einsum("tkgd,skd->kgts", qg.astype(jnp.float32),
                   k_kept.astype(jnp.float32)) * scale, softcap)
    if alibi_slopes is not None:
        # Key positions = indices in the kept set (the cache layout the
        # decode path will also see).
        scores = scores + _alibi_bias(alibi_slopes, k_kept.shape[1],
                                      jnp.arange(s))
    qpos = jnp.arange(t)[:, None]
    kpos = jnp.arange(s)[None, :]
    mask = (kpos <= qpos) & (kpos < kept_len) & (qpos < q_len)
    probs = _masked_softmax(scores, mask[None, None])
    out = jnp.einsum("kgts,skd->tkgd", probs, v_kept.astype(jnp.float32))
    return out.reshape(t, -1, q.shape[-1]).astype(q.dtype)


def paged_decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                           v_cache: jnp.ndarray, block_tables: jnp.ndarray,
                           kv_lens: jnp.ndarray, scale: float,
                           softcap: float | None = None,
                           alibi_slopes: jnp.ndarray | None = None,
                           extra_mask: jnp.ndarray | None = None
                           ) -> jnp.ndarray:
    """Single-token decode attention through block tables.

    q:            [B, H, d]
    k/v_cache:    [num_pages, page_size, Hkv, d]
    block_tables: [B, max_pages] int32 (entries past the seq's pages = 0;
                  masked out by kv_lens, so index 0 stays in-bounds)
    kv_lens:      [B] physical KV length per sequence
    Returns [B, H, d].
    """
    from .quant import QuantKV
    if isinstance(k_cache, QuantKV):
        # Gather quantized pages + scales, dequantize in fp32.
        k_cache = (k_cache.q[block_tables].astype(jnp.float32)
                   * k_cache.s[block_tables][..., None])
        v_cache = (v_cache.q[block_tables].astype(jnp.float32)
                   * v_cache.s[block_tables][..., None])
        b, h, d = q.shape
        page_size, num_kv = k_cache.shape[2], k_cache.shape[3]
        max_pages = block_tables.shape[1]
        k = k_cache.reshape(b, max_pages * page_size, num_kv, d)
        v = v_cache.reshape(b, max_pages * page_size, num_kv, d)
    else:
        b, h, d = q.shape
        page_size = k_cache.shape[1]
        num_kv = k_cache.shape[2]
        max_pages = block_tables.shape[1]
        # Gather pages: [B, max_pages, page_size, Hkv, d] -> [B, S, Hkv, d]
        k = k_cache[block_tables].reshape(b, max_pages * page_size, num_kv,
                                          d)
        v = v_cache[block_tables].reshape(b, max_pages * page_size, num_kv,
                                          d)
    qg = q.reshape(b, num_kv, h // num_kv, d)
    scores = _softcap(
        jnp.einsum("bkgd,bskd->bkgs", qg.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale, softcap)
    if alibi_slopes is not None:
        # Key position = physical cache index (the reference CUDA paged
        # attention kernel's alibi handling does the same; under eviction
        # indices shift with the compacted table).
        scores = scores + _alibi_bias(
            alibi_slopes, num_kv,
            jnp.arange(max_pages * page_size))[:, :, 0, :][None]
    valid = jnp.arange(max_pages * page_size)[None, :] < kv_lens[:, None]
    mask = valid[:, None, None, :]
    if extra_mask is not None:
        # Per-head structured mask (blocksparse): [B, H, S] ->
        # [B, kH, g, S].
        s = max_pages * page_size
        mask = mask & extra_mask.reshape(b, num_kv, h // num_kv, s)
    probs = _masked_softmax(scores, mask)
    out = jnp.einsum("bkgs,bskd->bkgd", probs, v.astype(jnp.float32))
    return out.reshape(b, h, d).astype(q.dtype)


def context_prefill_attention(q: jnp.ndarray, k_ctx: jnp.ndarray,
                              v_ctx: jnp.ndarray, k_chunk: jnp.ndarray,
                              v_chunk: jnp.ndarray, scale: float,
                              q_len, ctx_len,
                              softcap: float | None = None,
                              alibi_slopes: jnp.ndarray | None = None
                              ) -> jnp.ndarray:
    """Chunked-prefill attention: chunk queries attend to (a) all previously
    cached context tokens and (b) the chunk itself, causally.

    Reference analog: the chunked-prefill path's prefix-prefill kernel
    (vllm/attention/ops/prefix_prefill.py — queries over [context | new]
    keys); functionally re-derived, with context fed as dense gathered rows.

    q:            [Tc, H, d]   chunk queries (global position = ctx_len + i)
    k/v_ctx:      [C, Hkv, d]  gathered context rows (positions [0, ctx_len);
                  rows >= ctx_len are padding)
    k/v_chunk:    [Tc, Hkv, d] this chunk's fresh K/V
    q_len:        true chunk length (<= Tc)
    ctx_len:      true context length (<= C)
    Returns [Tc, H, d] (garbage rows past q_len).
    """
    tc = q.shape[0]
    c = k_ctx.shape[0]
    k = jnp.concatenate([k_ctx, k_chunk], axis=0)
    v = jnp.concatenate([v_ctx, v_chunk], axis=0)
    qg, group = _group_query(q, k.shape[1])
    scores = _softcap(
        jnp.einsum("tkgd,skd->kgts", qg.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale, softcap)
    row = jnp.arange(tc)[:, None]
    col = jnp.arange(c + tc)[None, :]
    is_ctx = col < c
    local = col - c
    if alibi_slopes is not None:
        # Global key position: context rows sit at their own index, chunk
        # rows at ctx_len + local.
        key_pos = jnp.where(is_ctx[0], jnp.arange(c + tc),
                            ctx_len + jnp.arange(c + tc) - c)
        scores = scores + _alibi_bias(alibi_slopes, k.shape[1], key_pos)
    mask = jnp.where(is_ctx, col < ctx_len,
                     (local <= row) & (local < q_len)) & (row < q_len)
    probs = _masked_softmax(scores, mask[None, None])
    out = jnp.einsum("kgts,skd->tkgd", probs, v.astype(jnp.float32))
    return out.reshape(tc, -1, q.shape[-1]).astype(q.dtype)
