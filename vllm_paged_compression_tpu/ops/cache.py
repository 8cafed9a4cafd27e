"""KV-cache write/scatter ops (pure jnp; Pallas fusion comes in ops/pallas).

TPU-native analogs of the reference cache kernels
(csrc/cache_kernels.cu: reshape_and_cache :263, copy_blocks :101,
swap_blocks :24): the paged pools are flat jax arrays and writes are
fixed-shape scatters, which XLA lowers to in-place dynamic-update when the
cache buffers are donated into the jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quant import QuantKV, quantize_kv_rows


def _scatter_rows(cache: jnp.ndarray, rows: jnp.ndarray,
                  slots: jnp.ndarray) -> jnp.ndarray:
    num_pages, page_size = cache.shape[:2]
    flat = cache.reshape(num_pages * page_size, *cache.shape[2:])
    flat = flat.at[slots].set(rows.astype(cache.dtype), mode="drop")
    return flat.reshape(cache.shape)


def write_kv_slots(k_cache, v_cache, k: jnp.ndarray, v: jnp.ndarray,
                   slots: jnp.ndarray):
    """Scatter new K/V rows into flat slots.

    k/v_cache: [num_pages, page_size, Hkv, d]  (the last page is the
               engine's trash page — padding writes are steered there by
               the caller, never via negative indices, which jnp would wrap)
               or QuantKV pools (int8/fp8 values + per-row scales), in which
               case the incoming rows are quantized online before scatter.
    k/v:       [N, Hkv, d]
    slots:     [N] flat slot ids (page * page_size + offset), all >= 0.
    """
    if isinstance(k_cache, QuantKV):
        kq, ks = quantize_kv_rows(k, k_cache.q.dtype)
        vq, vs = quantize_kv_rows(v, v_cache.q.dtype)
        return (QuantKV(q=_scatter_rows(k_cache.q, kq, slots),
                        s=_scatter_rows(k_cache.s, ks, slots)),
                QuantKV(q=_scatter_rows(v_cache.q, vq, slots),
                        s=_scatter_rows(v_cache.s, vs, slots)))
    return (_scatter_rows(k_cache, k, slots),
            _scatter_rows(v_cache, v, slots))


def write_kv_pages(k_cache, v_cache, k: jnp.ndarray, v: jnp.ndarray,
                   pages: jnp.ndarray):
    """Page-granular cache write for prefill: rows land in whole pages.

    k/v: [N, Hkv, d] with N == len(pages) * page_size; ``pages`` holds the
    destination page id per page-sized row group (padding groups point at
    the trash page).  All ids are in-bounds by construction.

    Why this exists: an XLA pathology makes the row-granular scatter
    (write_kv_slots) inside the scanned layer body explode compile time —
    measured 324 s (mode="drop") / 61 s (promise_in_bounds) vs 2.8 s for
    this page-granular form on a 28-layer 1024-token prefill.  Decode
    keeps the row scatter (B rows/step; no pathology there).
    """
    ps = k_cache.q.shape[1] if isinstance(k_cache, QuantKV) \
        else k_cache.shape[1]
    n = pages.shape[0]
    assert k.shape[0] == n * ps, (k.shape, n, ps)
    if isinstance(k_cache, QuantKV):
        kq, ks = quantize_kv_rows(k, k_cache.q.dtype)
        vq, vs = quantize_kv_rows(v, v_cache.q.dtype)

        def put(cache, rows):
            rows = rows.reshape((n, ps) + rows.shape[1:])
            return cache.at[pages].set(rows.astype(cache.dtype),
                                       mode="promise_in_bounds")

        return (QuantKV(q=put(k_cache.q, kq), s=put(k_cache.s, ks)),
                QuantKV(q=put(v_cache.q, vq), s=put(v_cache.s, vs)))

    def put(cache, rows):
        rows = rows.reshape((n, ps) + rows.shape[1:])
        return cache.at[pages].set(rows.astype(cache.dtype),
                                   mode="promise_in_bounds")

    return put(k_cache, k), put(v_cache, v)


def zero_kv_slots(k_cache, v_cache, slots: jnp.ndarray):
    """Overwrite slots with zeros (streamingLLM-1 / inverse_key_l2 side
    writes, torch_cuda_sdpa.py:919-933).  slots: [N], -1 entries dropped."""
    n = slots.shape[0]
    if isinstance(k_cache, QuantKV):
        shape = (n,) + k_cache.q.shape[2:]
        return write_kv_slots(k_cache, v_cache,
                              jnp.zeros(shape, jnp.float32),
                              jnp.zeros(shape, jnp.float32), slots)
    zeros_k = jnp.zeros((n,) + k_cache.shape[2:], k_cache.dtype)
    zeros_v = jnp.zeros((n,) + v_cache.shape[2:], v_cache.dtype)
    return write_kv_slots(k_cache, v_cache, zeros_k, zeros_v, slots)


def copy_pages(cache: jnp.ndarray, src_pages: jnp.ndarray,
               dst_pages: jnp.ndarray) -> jnp.ndarray:
    """Page-granular copy (reference copy_blocks, cache_kernels.cu:101) —
    used by CoW forking; a fixed-shape gather+scatter."""
    return cache.at[dst_pages].set(cache[src_pages], mode="drop")
