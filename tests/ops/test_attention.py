"""Attention reference impls vs. straightforward numpy oracles
(reference analog: tests/kernels/test_attention.py compares the CUDA kernel
against a naive torch implementation)."""

import numpy as np
import pytest

import jax.numpy as jnp

# On the real chip, f32 matmuls run as bf16 multi-pass on the MXU
# (~1e-3 agreement on O(1) outputs); CPU/interpret is exact.  Same
# calibration as tests/ops/test_pallas_kernels.py.
import os
_REAL = os.environ.get("VPC_TEST_REAL_DEVICE") == "1"
RTOL = 1e-2 if _REAL else 2e-5
ATOL = 1e-2 if _REAL else 2e-5

from vllm_paged_compression_tpu.ops.attention import (
    paged_decode_attention, prefill_attention, pruned_prefill_attention)


def numpy_attention(q, k, v, scale, mask):
    """q [T,H,d], k/v [S,Hkv,d], mask [T,S] bool."""
    t, h, d = q.shape
    s, hkv, _ = k.shape
    group = h // hkv
    out = np.zeros_like(q, dtype=np.float32)
    for i in range(h):
        kh = k[:, i // group].astype(np.float32)
        vh = v[:, i // group].astype(np.float32)
        scores = q[:, i].astype(np.float32) @ kh.T * scale
        scores = np.where(mask, scores, -1e30)
        scores -= scores.max(axis=-1, keepdims=True)
        p = np.exp(scores)
        p /= p.sum(axis=-1, keepdims=True) + 1e-9
        out[:, i] = p @ vh
    return out


@pytest.mark.parametrize("heads,kv_heads", [(4, 4), (8, 2)])
def test_prefill_matches_numpy(heads, kv_heads):
    rng = np.random.default_rng(0)
    t, d, q_len = 24, 16, 19
    q = rng.standard_normal((t, heads, d), dtype=np.float32)
    k = rng.standard_normal((t, kv_heads, d), dtype=np.float32)
    v = rng.standard_normal((t, kv_heads, d), dtype=np.float32)
    scale = d ** -0.5
    out = prefill_attention(jnp.array(q), jnp.array(k), jnp.array(v),
                            scale, q_len)
    pos = np.arange(t)
    mask = (pos[:, None] >= pos[None, :]) & (pos[None, :] < q_len)
    expect = numpy_attention(q, k, v, scale, mask)
    np.testing.assert_allclose(np.asarray(out)[:q_len], expect[:q_len],
                               rtol=RTOL, atol=ATOL)


def test_pruned_prefill_top_left_causal():
    """Query i attends kept keys j <= i (torch sdpa is_causal semantics for
    L != S, torch_cuda_sdpa.py:1118-1125)."""
    rng = np.random.default_rng(1)
    t, s_pad, heads, d = 16, 10, 2, 8
    q_len, kept_len = 14, 7
    q = rng.standard_normal((t, heads, d), dtype=np.float32)
    k = rng.standard_normal((s_pad, heads, d), dtype=np.float32)
    v = rng.standard_normal((s_pad, heads, d), dtype=np.float32)
    scale = d ** -0.5
    out = pruned_prefill_attention(jnp.array(q), jnp.array(k), jnp.array(v),
                                   scale, q_len, kept_len)
    qpos = np.arange(t)[:, None]
    kpos = np.arange(s_pad)[None, :]
    mask = (kpos <= qpos) & (kpos < kept_len)
    expect = numpy_attention(q, k, v, scale, mask)
    np.testing.assert_allclose(np.asarray(out)[:q_len], expect[:q_len],
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("heads,kv_heads", [(4, 4), (8, 2)])
def test_paged_decode_matches_contiguous(heads, kv_heads):
    """Scatter a contiguous context into shuffled pages; paged attention
    through the block table must equal attention over the contiguous
    context."""
    rng = np.random.default_rng(2)
    bs, d = 4, 16
    num_pages, page_size = 32, 4
    kv_lens = np.array([9, 16, 3, 13])
    max_pages = 5
    k_ctx = rng.standard_normal((bs, max_pages * page_size, kv_heads, d),
                                dtype=np.float32)
    v_ctx = rng.standard_normal((bs, max_pages * page_size, kv_heads, d),
                                dtype=np.float32)
    q = rng.standard_normal((bs, heads, d), dtype=np.float32)

    # Build shuffled page assignment per sequence.
    k_cache = np.zeros((num_pages, page_size, kv_heads, d), np.float32)
    v_cache = np.zeros_like(k_cache)
    perm = rng.permutation(num_pages)
    tables = np.zeros((bs, max_pages), np.int32)
    pi = 0
    for b in range(bs):
        n = -(-int(kv_lens[b]) // page_size)
        for j in range(n):
            page = perm[pi]; pi += 1
            tables[b, j] = page
            k_cache[page] = k_ctx[b, j * page_size:(j + 1) * page_size]
            v_cache[page] = v_ctx[b, j * page_size:(j + 1) * page_size]

    scale = d ** -0.5
    out = paged_decode_attention(jnp.array(q), jnp.array(k_cache),
                                 jnp.array(v_cache), jnp.array(tables),
                                 jnp.array(kv_lens), scale)
    for b in range(bs):
        n = int(kv_lens[b])
        mask = np.ones((1, n), bool)
        expect = numpy_attention(q[b:b + 1].reshape(1, heads, d),
                                 k_ctx[b, :n], v_ctx[b, :n], scale, mask)
        np.testing.assert_allclose(np.asarray(out)[b][None], expect,
                                   rtol=RTOL, atol=ATOL)
