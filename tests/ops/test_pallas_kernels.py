"""Pallas kernels vs their jnp oracles (CPU interpret mode).

Reference test-strategy analog: tests/kernels/test_attention.py compares
the paged_attention CUDA kernels against a naive torch implementation
(SURVEY.md §4); here the oracle is ops/attention.py and the kernels run
through the Pallas interpreter.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

# Interpret mode is bit-faithful f32; the real chip's MXU computes f32
# dots via bf16 multi-pass (plus --xla_allow_excess_precision), so
# kernel-vs-oracle agreement is ~1e-3 there (measured max 5.6e-3 on
# O(1) outputs).
_REAL = os.environ.get("VPC_TEST_REAL_DEVICE") == "1"
RTOL = 1e-2 if _REAL else 2e-5
ATOL = 1e-2 if _REAL else 2e-5

from vllm_paged_compression_tpu.ops.attention import (
    paged_decode_attention, prefill_attention, pruned_prefill_attention)
from vllm_paged_compression_tpu.ops.pallas import (
    flash_prefill_attention, paged_decode_attention_pallas)


def _mk_cache(rng, num_pages, ps, hkv, d, dtype):
    k = rng.standard_normal((num_pages, ps, hkv, d)).astype(dtype)
    v = rng.standard_normal((num_pages, ps, hkv, d)).astype(dtype)
    return jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("h,hkv,d", [(8, 8, 64), (8, 2, 64), (12, 4, 128)])
def test_paged_decode_matches_oracle(h, hkv, d):
    rng = np.random.default_rng(0)
    b, ps, num_pages, max_pages = 3, 16, 32, 6
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    kc, vc = _mk_cache(rng, num_pages, ps, hkv, d, np.float32)
    tables = jnp.asarray(
        rng.permutation(num_pages)[:b * max_pages].reshape(b, max_pages)
        .astype(np.int32))
    kv_lens = jnp.asarray([5, 16 * 3, 16 * 6 - 7], jnp.int32)
    scale = d ** -0.5
    ref = paged_decode_attention(q, kc, vc, tables, kv_lens, scale)
    out = paged_decode_attention_pallas(q, kc, vc, tables, kv_lens, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)


def test_paged_decode_ignores_out_of_range_table_entries():
    """Entries past num_pages-in-use must not affect the result (they are
    masked by kv_lens) as long as they are in-bounds indices."""
    rng = np.random.default_rng(1)
    b, h, hkv, d, ps = 2, 4, 4, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    kc, vc = _mk_cache(rng, 16, ps, hkv, d, np.float32)
    t1 = jnp.asarray([[3, 5, 0, 0], [7, 1, 2, 0]], jnp.int32)
    t2 = jnp.asarray([[3, 5, 9, 9], [7, 1, 2, 15]], jnp.int32)
    kv_lens = jnp.asarray([20, 40], jnp.int32)
    o1 = paged_decode_attention_pallas(q, kc, vc, t1, kv_lens, d ** -0.5)
    o2 = paged_decode_attention_pallas(q, kc, vc, t2, kv_lens, d ** -0.5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("t,h,hkv,d", [(64, 4, 4, 64), (256, 8, 2, 64),
                                       (128, 12, 4, 128)])
def test_flash_prefill_matches_oracle(t, h, hkv, d):
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((t, hkv, d)).astype(np.float32))
    q_len = t - 5
    scale = d ** -0.5
    ref = prefill_attention(q, k, v, scale, q_len)
    out = flash_prefill_attention(q, k, v, scale, q_len, q_len)
    np.testing.assert_allclose(np.asarray(out)[:q_len],
                               np.asarray(ref)[:q_len],
                               rtol=RTOL, atol=ATOL)


def test_flash_prefill_pruned_top_left_alignment():
    """Pruned prefill: kept keys S < T with torch-sdpa top-left causal
    masking must match the oracle exactly."""
    rng = np.random.default_rng(3)
    t, s, h, hkv, d = 192, 64, 8, 4, 64
    q = jnp.asarray(rng.standard_normal((t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((s, hkv, d)).astype(np.float32))
    q_len, kept = t - 3, s - 9
    scale = d ** -0.5
    ref = pruned_prefill_attention(q, k, v, scale, q_len, kept)
    out = flash_prefill_attention(q, k, v, scale, q_len, kept)
    np.testing.assert_allclose(np.asarray(out)[:q_len],
                               np.asarray(ref)[:q_len],
                               rtol=RTOL, atol=ATOL)


def test_flash_prefill_non_divisible_lengths():
    rng = np.random.default_rng(4)
    t, h, hkv, d = 100, 4, 2, 64   # t not a multiple of the block size
    q = jnp.asarray(rng.standard_normal((t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((t, hkv, d)).astype(np.float32))
    scale = d ** -0.5
    ref = prefill_attention(q, k, v, scale, t)
    out = flash_prefill_attention(q, k, v, scale, t, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)


def test_context_prefill_oracle_vs_naive_full():
    """context_prefill_attention(ctx + chunk) must equal a full-prompt
    prefill restricted to the chunk rows."""
    from vllm_paged_compression_tpu.ops.attention import (
        context_prefill_attention)
    rng = np.random.default_rng(5)
    total, ctx_len, h, hkv, d = 96, 60, 4, 2, 64
    tc = total - ctx_len
    q_all = rng.standard_normal((total, h, d)).astype(np.float32)
    k_all = rng.standard_normal((total, hkv, d)).astype(np.float32)
    v_all = rng.standard_normal((total, hkv, d)).astype(np.float32)
    scale = d ** -0.5
    full = prefill_attention(jnp.asarray(q_all), jnp.asarray(k_all),
                             jnp.asarray(v_all), scale, total)
    out = context_prefill_attention(
        jnp.asarray(q_all[ctx_len:]), jnp.asarray(k_all[:ctx_len]),
        jnp.asarray(v_all[:ctx_len]), jnp.asarray(k_all[ctx_len:]),
        jnp.asarray(v_all[ctx_len:]), scale, tc, ctx_len)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(full)[ctx_len:],
                               rtol=RTOL, atol=ATOL)


def test_flash_context_prefill_matches_oracle():
    from vllm_paged_compression_tpu.ops.attention import (
        context_prefill_attention)
    from vllm_paged_compression_tpu.ops.pallas import (
        flash_context_prefill_attention)
    rng = np.random.default_rng(6)
    tc, c, h, hkv, d = 160, 200, 8, 4, 64
    q = jnp.asarray(rng.standard_normal((tc, h, d)).astype(np.float32))
    kc_ = jnp.asarray(rng.standard_normal((c, hkv, d)).astype(np.float32))
    vc_ = jnp.asarray(rng.standard_normal((c, hkv, d)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((tc, hkv, d)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((tc, hkv, d)).astype(np.float32))
    q_len, ctx_len = tc - 7, c - 13
    scale = d ** -0.5
    ref = context_prefill_attention(q, kc_, vc_, kn, vn, scale, q_len,
                                    ctx_len)
    out = flash_context_prefill_attention(q, kc_, vc_, kn, vn, scale,
                                          q_len, ctx_len)
    np.testing.assert_allclose(np.asarray(out)[:q_len],
                               np.asarray(ref)[:q_len],
                               rtol=RTOL, atol=ATOL)


# ---- fused decode (write + attention, in place) --------------------------

def _fused_setup(rng, L=2, pool=24, ps=16, hkv=4, d=64, h=8, b=3, p=5):
    from vllm_paged_compression_tpu.ops.pallas.fused_decode import (
        fused_paged_decode_attention, fused_paged_decode_reference)
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((b, hkv, d)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((b, hkv, d)).astype(np.float32))
    kc = jnp.asarray(
        rng.standard_normal((L, pool, ps, hkv, d)).astype(np.float32))
    vc = jnp.asarray(
        rng.standard_normal((L, pool, ps, hkv, d)).astype(np.float32))
    tables = jnp.asarray(
        rng.permutation(pool - 1)[:b * p].reshape(b, p).astype(np.int32))
    kv_lens = jnp.asarray([7, ps * 2, ps * 5 - 3], jnp.int32)
    slots = jnp.asarray([
        int(tables[i, (int(kv_lens[i]) - 1) // ps]) * ps
        + (int(kv_lens[i]) - 1) % ps for i in range(b)], jnp.int32)
    return (fused_paged_decode_attention, fused_paged_decode_reference,
            q, kn, vn, kc, vc, tables, kv_lens, slots)


@pytest.mark.parametrize("zero", [False, True])
def test_fused_decode_matches_reference(zero):
    """The fused Pallas kernel (interpret mode) must write the new rows,
    apply zero-overwrites, and attend exactly like the jnp reference."""
    rng = np.random.default_rng(3)
    (fused, ref_fn, q, kn, vn, kc, vc, tables, kv_lens,
     slots) = _fused_setup(rng)
    zslots = (jnp.asarray([int(tables[i, 1]) * 16 + 2 for i in range(3)],
                          jnp.int32) if zero else None)
    o1, kc1, vc1 = fused(q, kn, vn, kc, vc, 1, tables, kv_lens, slots,
                         zslots, scale=0.125)
    o2, kc2, vc2 = ref_fn(q, kn, vn, kc, vc, 1, tables, kv_lens, slots,
                          zslots, scale=0.125)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_array_equal(np.asarray(kc1), np.asarray(kc2))
    np.testing.assert_array_equal(np.asarray(vc1), np.asarray(vc2))


def test_fused_decode_untouched_layer_intact():
    """Only the addressed layer's pool may change."""
    rng = np.random.default_rng(4)
    (fused, _, q, kn, vn, kc, vc, tables, kv_lens,
     slots) = _fused_setup(rng)
    _, kc1, vc1 = fused(q, kn, vn, kc, vc, 1, tables, kv_lens, slots,
                        scale=0.125)
    np.testing.assert_array_equal(np.asarray(kc1[0]), np.asarray(kc[0]))
    np.testing.assert_array_equal(np.asarray(vc1[0]), np.asarray(vc[0]))
    assert not np.array_equal(np.asarray(kc1[1]), np.asarray(kc[1]))


@pytest.mark.parametrize("d,hkv", [(128, 4), (64, 8), (64, 2)])
def test_fused_decode_layout_variants(d, hkv):
    """Both write layouts — aligned row-DMA (d % 128 == 0) and the
    flat-page RMW variant (64-dim heads) — must match the reference."""
    rng = np.random.default_rng(5)
    (fused, ref_fn, q, kn, vn, kc, vc, tables, kv_lens,
     slots) = _fused_setup(rng, hkv=hkv, d=d)
    o1, kc1, vc1 = fused(q, kn, vn, kc, vc, 1, tables, kv_lens, slots,
                         scale=d ** -0.5)
    o2, kc2, vc2 = ref_fn(q, kn, vn, kc, vc, 1, tables, kv_lens, slots,
                          scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_array_equal(np.asarray(kc1), np.asarray(kc2))
    np.testing.assert_array_equal(np.asarray(vc1), np.asarray(vc2))


def _quantize_pools(kc, vc, qdtype, sdtype=jnp.float32):
    """Quantize dense test pools into QuantKV row-by-row (same math as the
    online path: per-(token, head) scales over head_dim).  ``sdtype``
    mirrors the cache engine's scale-pool dtype (bf16 in production)."""
    from vllm_paged_compression_tpu.ops.quant import (QuantKV,
                                                      quantize_kv_rows)
    L, pool, ps, hkv, d = kc.shape

    def one(c):
        q, s = quantize_kv_rows(c.reshape(-1, hkv, d), qdtype)
        return QuantKV(q=q.reshape(L, pool, ps, hkv, d),
                       s=s.reshape(L, pool, ps, hkv).astype(sdtype))
    return one(kc), one(vc)


@pytest.mark.parametrize("hkv", [4, 8])   # cpp 64 (per-page) / 128 (strip)
@pytest.mark.parametrize("qdtype", ["int8", "fp8"])
@pytest.mark.parametrize("zero", [False, True])
def test_fused_decode_quant_matches_reference(qdtype, zero, hkv):
    """Quantized-KV fused kernel: writes this step's quantized rows +
    scales, applies zero-overwrites, and attends identically to the jnp
    oracle (which dequantizes whole pages).  Covers both static layouts
    (aligned chunk-strip at ps*hkv=128, per-page at 64).  This
    combination — fp8/int8 KV with in-forward eviction writes — is the
    capability the reference rejects outright
    (torch_cuda_sdpa.py:769-772)."""
    dt = jnp.int8 if qdtype == "int8" else jnp.float8_e4m3fn
    rng = np.random.default_rng(8)
    (fused, ref_fn, q, kn, vn, kc, vc, tables, kv_lens,
     slots) = _fused_setup(rng, hkv=hkv, d=128, h=8)
    kcq, vcq = _quantize_pools(kc, vc, dt)
    zslots = (jnp.asarray([int(tables[i, 1]) * 16 + 2 for i in range(3)],
                          jnp.int32) if zero else None)
    o1, kc1, vc1 = fused(q, kn, vn, kcq, vcq, 1, tables, kv_lens, slots,
                         zslots, scale=128 ** -0.5)
    o2, kc2, vc2 = ref_fn(q, kn, vn, kcq, vcq, 1, tables, kv_lens, slots,
                          zslots, scale=128 ** -0.5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(
        np.asarray(kc1.q, np.uint8).view(np.uint8),
        np.asarray(kc2.q, np.uint8).view(np.uint8))
    np.testing.assert_array_equal(np.asarray(kc1.s), np.asarray(kc2.s))
    np.testing.assert_array_equal(np.asarray(vc1.s), np.asarray(vc2.s))


def test_fused_decode_quant_unaligned_pool_pages():
    """Pool page counts that are not sublane-tile multiples (e.g. 26)
    must work — a VMEM-resident [130, cpp] scale plane faulted real
    v5e hardware before the XLA-side pre-gather design.  Also covers
    the production bf16 scale-pool dtype."""
    rng = np.random.default_rng(12)
    (fused, ref_fn, q, kn, vn, kc, vc, tables, kv_lens,
     slots) = _fused_setup(rng, pool=26, hkv=8, d=128, h=8)
    kcq, vcq = _quantize_pools(kc, vc, jnp.int8, jnp.bfloat16)
    o1, kc1, vc1 = fused(q, kn, vn, kcq, vcq, 1, tables, kv_lens, slots,
                         scale=0.125)
    o2, kc2, vc2 = ref_fn(q, kn, vn, kcq, vcq, 1, tables, kv_lens, slots,
                          scale=0.125)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(kc1.s), np.asarray(kc2.s))


def test_fused_decode_quant_strip_dma_fallback(monkeypatch):
    """Aligned configs whose pre-gathered scale block would exceed the
    VMEM limit must take the per-chunk strip-DMA path and still match
    the oracle."""
    from vllm_paged_compression_tpu.ops.pallas import fused_decode as fd
    monkeypatch.setattr(fd, "_GATHER_LIMIT", 0)
    rng = np.random.default_rng(11)
    (fused, ref_fn, q, kn, vn, kc, vc, tables, kv_lens,
     slots) = _fused_setup(rng, hkv=8, d=128, h=8)
    kcq, vcq = _quantize_pools(kc, vc, jnp.int8)
    o1, kc1, vc1 = fused(q, kn, vn, kcq, vcq, 1, tables, kv_lens, slots,
                         scale=0.125)
    o2, kc2, vc2 = ref_fn(q, kn, vn, kcq, vcq, 1, tables, kv_lens, slots,
                          scale=0.125)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(kc1.s), np.asarray(kc2.s))


def test_fused_decode_quant_untouched_layer_intact():
    rng = np.random.default_rng(9)
    (fused, _, q, kn, vn, kc, vc, tables, kv_lens,
     slots) = _fused_setup(rng, hkv=4, d=128)
    kcq, vcq = _quantize_pools(kc, vc, jnp.int8)
    _, kc1, vc1 = fused(q, kn, vn, kcq, vcq, 1, tables, kv_lens, slots,
                        scale=0.125)
    np.testing.assert_array_equal(np.asarray(kc1.q[0]),
                                  np.asarray(kcq.q[0]))
    np.testing.assert_array_equal(np.asarray(kc1.s[0]),
                                  np.asarray(kcq.s[0]))
    assert not np.array_equal(np.asarray(vc1.q[1]), np.asarray(vcq.q[1]))


def test_fused_decode_quant_rejects_unaligned_head_dim():
    from vllm_paged_compression_tpu.ops.pallas.fused_decode import (
        fused_paged_decode_attention)
    rng = np.random.default_rng(10)
    (fused, _, q, kn, vn, kc, vc, tables, kv_lens,
     slots) = _fused_setup(rng, hkv=4, d=64)
    kcq, vcq = _quantize_pools(kc, vc, jnp.int8)
    with pytest.raises(ValueError, match="head_dim % 128"):
        fused_paged_decode_attention(q, kn, vn, kcq, vcq, 1, tables,
                                     kv_lens, slots, scale=0.125)


def test_fused_decode_rejects_untileable_dims():
    from vllm_paged_compression_tpu.ops.pallas.fused_decode import (
        fused_paged_decode_attention)
    rng = np.random.default_rng(6)
    (fused, _, q, kn, vn, kc, vc, tables, kv_lens,
     slots) = _fused_setup(rng, hkv=3, d=40)
    with pytest.raises(ValueError, match="multiple of 128"):
        fused_paged_decode_attention(q, kn, vn, kc, vc, 1, tables,
                                     kv_lens, slots, scale=0.1)


# ---- sliding-window paths -------------------------------------------------

def test_flash_prefill_sliding_window_matches_oracle():
    """window=w must equal the oracle with an explicit band mask (query i
    attends keys (i-w, i])."""
    rng = np.random.default_rng(7)
    t, h, hkv, d, w = 200, 4, 2, 64, 37
    q = jnp.asarray(rng.standard_normal((t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((t, hkv, d)).astype(np.float32))
    q_len = t - 3
    scale = d ** -0.5
    pos = np.arange(t)
    band = jnp.asarray((pos[:, None] - pos[None, :] < w))[None]
    ref = prefill_attention(q, k, v, scale, q_len, extra_mask=band)
    out = flash_prefill_attention(q, k, v, scale, q_len, q_len,
                                  window=jnp.int32(w))
    np.testing.assert_allclose(np.asarray(out)[:q_len],
                               np.asarray(ref)[:q_len],
                               rtol=RTOL, atol=ATOL)


def test_flash_prefill_window_zero_is_full_causal():
    rng = np.random.default_rng(8)
    t, h, hkv, d = 96, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((t, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((t, hkv, d)).astype(np.float32))
    scale = d ** -0.5
    ref = flash_prefill_attention(q, k, v, scale, t, t)
    out = flash_prefill_attention(q, k, v, scale, t, t,
                                  window=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("d,hkv", [(128, 4), (64, 2)])
def test_fused_decode_window_starts_match_reference(d, hkv):
    """Per-row window starts (sliding-window decode) on both layout
    variants: positions below the start must not contribute, and the
    kernel must match the masked jnp reference exactly."""
    rng = np.random.default_rng(9)
    (fused, ref_fn, q, kn, vn, kc, vc, tables, kv_lens,
     slots) = _fused_setup(rng, hkv=hkv, d=d)
    # kv_lens are [7, 32, 77]; window 20 -> starts [0, 12, 57] which
    # exercises a start inside chunk 0 and one past a whole chunk.
    starts = jnp.maximum(kv_lens - 20, 0)
    o1, kc1, vc1 = fused(q, kn, vn, kc, vc, 1, tables, kv_lens, slots,
                         None, starts, scale=d ** -0.5)
    o2, kc2, vc2 = ref_fn(q, kn, vn, kc, vc, 1, tables, kv_lens, slots,
                          None, starts, scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_array_equal(np.asarray(kc1), np.asarray(kc2))
    # Zero starts reproduce the unwindowed result.
    o3, _, _ = fused(q, kn, vn, kc, vc, 1, tables, kv_lens, slots,
                     scale=d ** -0.5)
    o4, _, _ = ref_fn(q, kn, vn, kc, vc, 1, tables, kv_lens, slots,
                      scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o4),
                               rtol=RTOL, atol=ATOL)


def test_widen_bf16_matches_xla_convert_all_bytes():
    """The integer e4m3->bf16 widening (fused_decode._widen_bf16) must
    agree with XLA's convert for every one of the 256 byte patterns,
    except the two documented deviations: denorms flush to signed zero
    (|v| < 2^-6 — beneath the quantizer's own step) and e4m3fn NaN
    (0x7F/0xFF) clamps to finite +-480 instead of propagating."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vllm_paged_compression_tpu.ops.pallas.fused_decode import (
        _widen_bf16)
    from jax.experimental import pallas as pl

    def run_widen(x):
        # pltpu.bitcast only lowers inside a kernel; interpret mode
        # evaluates it on CPU exactly as Mosaic does on chip.
        return pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__(
                slice(None), _widen_bf16(x_ref[:])),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
            interpret=True)(x)

    b = np.arange(256, dtype=np.uint8)
    x = jax.lax.bitcast_convert_type(jnp.asarray(b.reshape(16, 16)),
                                     jnp.float8_e4m3fn)
    got = np.asarray(run_widen(x), np.float32).reshape(-1)
    ref = np.asarray(x.astype(jnp.bfloat16), np.float32).reshape(-1)
    em = b & 0x7F
    denorm = em < 8            # e == 0: zero + denorms
    nan = em == 0x7F           # e4m3fn NaN
    normal = ~denorm & ~nan
    np.testing.assert_array_equal(got[normal], ref[normal])
    assert np.all(got[denorm] == 0.0)
    assert np.all(np.abs(got[nan]) == 480.0)
    # int8 passthrough stays the native convert
    i = jnp.asarray(np.arange(-128, 128, dtype=np.int8).reshape(16, 16))
    np.testing.assert_array_equal(
        np.asarray(_widen_bf16(i), np.float32),
        np.asarray(i.astype(jnp.bfloat16), np.float32))
