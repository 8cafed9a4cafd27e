"""KV-cache write/scatter ops (pure jnp; Pallas fusion comes in ops/pallas).

TPU-native analogs of the reference cache kernels
(csrc/cache_kernels.cu: reshape_and_cache :263, copy_blocks :101,
swap_blocks :24): the paged pools are flat jax arrays and writes are
fixed-shape scatters, which XLA lowers to in-place dynamic-update when the
cache buffers are donated into the jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp


def write_kv_slots(k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                   k: jnp.ndarray, v: jnp.ndarray,
                   slots: jnp.ndarray):
    """Scatter new K/V rows into flat slots.

    k/v_cache: [num_pages, page_size, Hkv, d]  (the last page is the
               engine's trash page — padding writes are steered there by
               the caller, never via negative indices, which jnp would wrap)
    k/v:       [N, Hkv, d]
    slots:     [N] flat slot ids (page * page_size + offset), all >= 0.
    """
    num_pages, page_size = k_cache.shape[:2]
    flat_k = k_cache.reshape(num_pages * page_size, *k_cache.shape[2:])
    flat_v = v_cache.reshape(num_pages * page_size, *v_cache.shape[2:])
    flat_k = flat_k.at[slots].set(k.astype(k_cache.dtype), mode="drop")
    flat_v = flat_v.at[slots].set(v.astype(v_cache.dtype), mode="drop")
    return flat_k.reshape(k_cache.shape), flat_v.reshape(v_cache.shape)


def zero_kv_slots(k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                  slots: jnp.ndarray):
    """Overwrite slots with zeros (streamingLLM-1 / inverse_key_l2 side
    writes, torch_cuda_sdpa.py:919-933).  slots: [N], -1 entries dropped."""
    n = slots.shape[0]
    zeros_k = jnp.zeros((n,) + k_cache.shape[2:], k_cache.dtype)
    zeros_v = jnp.zeros((n,) + v_cache.shape[2:], v_cache.dtype)
    return write_kv_slots(k_cache, v_cache, zeros_k, zeros_v, slots)


def copy_pages(cache: jnp.ndarray, src_pages: jnp.ndarray,
               dst_pages: jnp.ndarray) -> jnp.ndarray:
    """Page-granular copy (reference copy_blocks, cache_kernels.cu:101) —
    used by CoW forking; a fixed-shape gather+scatter."""
    return cache.at[dst_pages].set(cache[src_pages], mode="drop")
