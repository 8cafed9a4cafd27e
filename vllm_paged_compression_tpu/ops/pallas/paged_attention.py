"""Pallas TPU paged-attention decode kernel.

TPU-native replacement for the reference's paged_attention_v1/v2 CUDA
kernels (csrc/attention/paged_attention_v{1,2}.cu, wrapped by
vllm/attention/ops/paged_attn.py:86-191): one query token per sequence
attends to its paged KV cache through a block table.

Design (not a translation):
- grid = (batch, max_pages).  The page axis is innermost and sequential;
  flash-style online-softmax statistics (m, l, acc) persist in VMEM
  scratch across page iterations, so no [B, S] score matrix is ever
  materialized and no gathered KV copy is written back to HBM (the jnp
  oracle ``paged_decode_attention`` materializes both).
- The block table and kv lengths ride in as **scalar-prefetch** operands
  (pltpu.PrefetchScalarGridSpec): the K/V BlockSpec index maps read
  ``tables_ref[b, i]`` to aim each page DMA straight at the right cache
  page — the in-kernel analog of the CUDA kernel's block-table
  indirection, with Pallas' automatic double-buffering overlapping the
  page fetch for (b, i+1) with compute on (b, i).
- GQA runs as ONE MXU matmul per page: scores = q [H, d] @ k [d, ps*Hkv]
  with the (query head ↔ kv head) mismatch columns masked to -inf before
  the softmax accumulation.  Masked probabilities are exactly zero, so
  probs @ v_page [ps*Hkv, d] yields each head's output without ever
  materializing a repeated K/V (the reference repeats KV heads on read).
- Pages past a sequence's kv_len are skipped (@pl.when) and their DMA is
  aimed at the sequence's page 0, staying in-bounds.

The kernel is exact (fp32 accumulation) and is validated against the jnp
oracle in tests/ops/test_pallas_kernels.py (CPU interpret mode) and on
the real chip by tests gated behind VPC_TEST_REAL_DEVICE=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -2.0**30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _decode_kernel(tables_ref, lens_ref, q_ref, k_ref, v_ref, o_ref,
                   m_ref, l_ref, acc_ref, *, scale: float, page_size: int,
                   num_kv_heads: int, group: int, softcap):
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_pages = pl.num_programs(1)
    kv_len = lens_ref[b]
    h = q_ref.shape[1]
    d = q_ref.shape[2]
    cols = page_size * num_kv_heads

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i * page_size < kv_len)
    def _():
        q = q_ref[0].astype(jnp.float32) * scale          # [H, d]
        # [ps, Hkv, d] -> [ps*Hkv, d]; minor (lane) dim d is untouched.
        k = k_ref[0].astype(jnp.float32).reshape(cols, d)
        v = v_ref[0].astype(jnp.float32).reshape(cols, d)
        s = jax.lax.dot_general(                           # [H, ps*Hkv]
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)

        # Column c holds (token t = c // Hkv, kv head kh = c % Hkv).
        col = jax.lax.broadcasted_iota(jnp.int32, (h, cols), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (h, cols), 0)
        head_ok = (col % num_kv_heads) == (row // group)
        tok_ok = (i * page_size + col // num_kv_heads) < kv_len
        s = jnp.where(head_ok & tok_ok, s, _NEG_INF)

        m_prev = m_ref[:, :1]                              # [H, 1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                             # [H, cols]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(                          # [H, d]
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:, :] = acc_ref[:, :] * alpha + pv
        m_ref[:, :] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:, :] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == num_pages - 1)
    def _():
        l = l_ref[:, :1]
        o = acc_ref[:, :] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = o.astype(o_ref.dtype)


def _decode_kernel_quant(tables_ref, lens_ref, q_ref, k_ref, ks_ref,
                         v_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref, *,
                         scale: float, page_size: int, num_kv_heads: int,
                         group: int, softcap):
    """Quantized-KV variant: k/v pages are int8/fp8 with per-(token, head)
    f32 scales laid out flat per page in the kernel's column order
    (c = t*Hkv + kh), so dequant is one column-wise multiply after the MXU
    matmul (K) and one before it (V) — no dequantized page is ever
    materialized.  No reference prior art: the reference rejects fp8 KV
    with eviction (torch_cuda_sdpa.py:769-772)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_pages = pl.num_programs(1)
    kv_len = lens_ref[b]
    h = q_ref.shape[1]
    d = q_ref.shape[2]
    cols = page_size * num_kv_heads

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i * page_size < kv_len)
    def _():
        q = q_ref[0].astype(jnp.float32) * scale
        k = k_ref[0].astype(jnp.float32).reshape(cols, d)
        v = v_ref[0].astype(jnp.float32).reshape(cols, d)
        ks = ks_ref[0]                                     # [1, cols]
        vs = vs_ref[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * ks
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)

        col = jax.lax.broadcasted_iota(jnp.int32, (h, cols), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (h, cols), 0)
        head_ok = (col % num_kv_heads) == (row // group)
        tok_ok = (i * page_size + col // num_kv_heads) < kv_len
        s = jnp.where(head_ok & tok_ok, s, _NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p * vs, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:, :] = acc_ref[:, :] * alpha + pv
        m_ref[:, :] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:, :] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == num_pages - 1)
    def _():
        l = l_ref[:, :1]
        o = acc_ref[:, :] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap"))
def paged_decode_attention_pallas(q: jnp.ndarray, k_cache,
                                  v_cache,
                                  block_tables: jnp.ndarray,
                                  kv_lens: jnp.ndarray,
                                  scale: float,
                                  softcap: float | None = None
                                  ) -> jnp.ndarray:
    """Drop-in Pallas version of ops.attention.paged_decode_attention.

    q:            [B, H, d]
    k/v_cache:    [num_pages, page_size, Hkv, d]
    block_tables: [B, max_pages] int32 (invalid entries must be in-bounds;
                  they are masked by kv_lens)
    kv_lens:      [B] int32 physical KV length per sequence
    """
    from ..quant import QuantKV
    quant = isinstance(k_cache, QuantKV)
    kq = k_cache.q if quant else k_cache
    b, h_orig, d = q.shape
    _, page_size, num_kv, _ = kq.shape
    max_pages = block_tables.shape[1]
    group = h_orig // num_kv
    cols = page_size * num_kv
    # Pad the head axis to the fp32 sublane multiple; padded rows satisfy
    # row // group >= Hkv, so the kv-head-match mask kills them.
    h = _round_up(h_orig, 8)
    if h != h_orig:
        q = jnp.pad(q, ((0, 0), (0, h - h_orig), (0, 0)))

    def q_map(b_, i_, tables, lens):
        return (b_, 0, 0)

    def kv_map(b_, i_, tables, lens):
        # Aim the DMA at the page the table names; out-of-range page
        # iterations reuse the sequence's first page (masked off anyway).
        return (tables[b_, i_], 0, 0, 0)

    def scale_map(b_, i_, tables, lens):
        return (tables[b_, i_], 0, 0)

    kv_spec = pl.BlockSpec((1, page_size, num_kv, d), kv_map)
    if quant:
        # Scales laid out flat per page in kernel column order; the
        # middle singleton axis keeps the block's last two dims EQUAL to
        # the array's (Mosaic requires last-two block dims divisible by
        # (8, 128) or equal — a (1, cols) block over [NP, cols] is
        # neither).
        ks2 = k_cache.s.reshape(-1, 1, cols)
        vs2 = v_cache.s.reshape(-1, 1, cols)
        in_specs = [pl.BlockSpec((1, h, d), q_map),
                    kv_spec, pl.BlockSpec((1, 1, cols), scale_map),
                    kv_spec, pl.BlockSpec((1, 1, cols), scale_map)]
        operands = (q, k_cache.q, ks2, v_cache.q, vs2)
        kern = functools.partial(_decode_kernel_quant, scale=scale,
                                 page_size=page_size, num_kv_heads=num_kv,
                                 group=group, softcap=softcap)
    else:
        in_specs = [pl.BlockSpec((1, h, d), q_map), kv_spec, kv_spec]
        operands = (q, k_cache, v_cache)
        kern = functools.partial(_decode_kernel, scale=scale,
                                 page_size=page_size, num_kv_heads=num_kv,
                                 group=group, softcap=softcap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),  # m
            pltpu.VMEM((h, 128), jnp.float32),  # l
            pltpu.VMEM((h, d), jnp.float32),    # acc
        ],
    )
    bytes_per = (2 * page_size * num_kv * d * kq.dtype.itemsize
                 * b * max_pages)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * max_pages * h * page_size * num_kv * d,
            bytes_accessed=bytes_per,
            transcendentals=b * max_pages * h * page_size * num_kv),
        interpret=jax.default_backend() == "cpu",
    )(block_tables, kv_lens, *operands)
    return out[:, :h_orig]
