"""Fused decode-step attention kernel: cache write + paged attention,
in place on the layer-stacked KV pools.

Why this kernel exists (measured on a v5e chip, Llama-3.2-3B shapes):

- The row-granular XLA scatter (``ops.cache.write_kv_slots``) inside the
  scanned layer body is NOT lowered in place — XLA materializes a fresh
  copy of the per-layer pool, ~93 us/layer = 2.6 ms/token of pure HBM
  copy traffic.
- The one-page-per-grid-step decode kernel
  (``paged_attention.paged_decode_attention_pallas``) pays a small
  sequential DMA per page: ~1.2 us x 66 pages x 28 layers = 2.2 ms/token.

This kernel removes both: the new token's K/V row is DMA'd straight into
its slot of the **whole stacked pool** (aliased input/output, zero copy),
and attention reads the block-table pages in chunks of ``ppb`` pages per
double-buffered DMA round.  The reference keeps these as two separate
CUDA kernels (csrc/cache_kernels.cu reshape_and_cache :263 +
csrc/attention/paged_attention_v1/v2); on TPU one fused kernel per layer
is strictly better — the write rides the first DMA round for free.

GQA trick shared with the unfused kernel: scores for all query heads
against a chunk are ONE MXU matmul [H, d] @ [d, ppb*ps*Hkv] with
mismatched (query head, kv head) columns masked to -inf.

Also serves speculative-decode verification batches: rows are (seq,
draft-position) pairs with per-row kv_lens; the grid walks rows in order,
and each row's write completes before any later row reads it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -2.0**30

# VMEM bytes one sequence's pre-gathered scale-strip block may occupy
# (tests shrink this to force the strip-DMA fallback).  4 MB covers a
# 256k-token budget at ps=16/Hkv=8.
_GATHER_LIMIT = 4 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _widen_bf16(x: jnp.ndarray) -> jnp.ndarray:
    """Cast a quantized KV value tile to bf16.

    int8 -> bf16 is a native VPU convert (free).  fp8 e4m3 -> bf16 has
    no v5e hardware path — XLA's convert is software-emulated and was
    measured at 4x the int8 cost (39.2 vs 9.8 us/layer, PROFILE_r03).
    Since bf16's 8-bit exponent / 7-bit mantissa strictly contain
    e4m3's 4/3, the widening is EXACT integer surgery:

        bits16 = sign << 8  |  ((e:m) << 4) + (127-7) << 7

    (the mantissa shift and exponent-bias add never carry: m<<4 <= 112
    < 128).  e==0 inputs (zero and denorms, |v| < 2^-6 of the 448-max
    scale — beneath int8's own step) map to signed zero with one
    select; e4m3fn NaN (0x7F) widens to a finite 480, clamping instead
    of poisoning the softmax.  All ops are VPU int32 (u8 shifts have no
    Mosaic lowering; the int32 hop matches the int4 kernel's unpack)."""
    if x.dtype != jnp.float8_e4m3fn:
        return x.astype(jnp.bfloat16)
    b = pltpu.bitcast(x, jnp.uint8).astype(jnp.int32)
    sign = (b & 0x80) << 8
    em = b & 0x7F
    bits = jnp.where(em < 8, sign, sign | ((em << 4) + (120 << 7)))
    return pltpu.bitcast(bits.astype(jnp.uint16), jnp.bfloat16)


def _fused_kernel(layer_ref, tables_ref, lens_ref, starts_ref, slots_ref,
                  zslots_ref,
                  q_ref, knew_ref, vnew_ref, kc_in, vc_in,
                  o_ref, kc_ref, vc_ref,
                  kbuf, vbuf, zbuf, csem, wsem,
                  m_ref, l_ref, acc_ref, *,
                  scale: float, page_size: int, num_kv_heads: int,
                  group: int, softcap, ppb: int, zero_writes: bool):
    del kc_in, vc_in  # aliased with kc_ref/vc_ref; use the output refs
    b = pl.program_id(0)
    lay = layer_ref[0]
    ps = page_size
    hkv = num_kv_heads
    h = q_ref.shape[1]
    d = q_ref.shape[2]
    cols = ppb * ps * hkv
    chunk_tokens = ppb * ps

    @pl.when(b == 0)
    def _():
        zbuf[:] = jnp.zeros_like(zbuf)

    # ---- write this row's new K/V into its slot (in place, HBM) ----
    slot = slots_ref[b]
    pg_w = slot // ps
    off_w = slot % ps
    kw = pltpu.make_async_copy(knew_ref.at[0], kc_ref.at[lay, pg_w, off_w],
                               wsem.at[0])
    vw = pltpu.make_async_copy(vnew_ref.at[0], vc_ref.at[lay, pg_w, off_w],
                               wsem.at[1])
    kw.start()
    vw.start()
    if zero_writes:
        # streamingLLM-1 / inverse_key_l2 zero-overwrites
        # (torch_cuda_sdpa.py:919-933); -1 is remapped to the trash slot
        # by the host, so the DMA is unconditional.
        zs = zslots_ref[b]
        pz = zs // ps
        oz = zs % ps
        kz = pltpu.make_async_copy(zbuf, kc_ref.at[lay, pz, oz], wsem.at[2])
        vz = pltpu.make_async_copy(zbuf, vc_ref.at[lay, pz, oz], wsem.at[3])
        kz.start()
        vz.start()
        kz.wait()
        vz.wait()
    kw.wait()
    vw.wait()

    # ---- chunked paged attention over this row's block table ----
    kv_len = lens_ref[b]
    # Sliding-window rows start at their first in-window position (page
    # index == logical position holds: eviction is rejected with sliding
    # windows, matching torch_cuda_sdpa.py:567); chunks fully below the
    # window are never even DMA'd.
    start = starts_ref[b]
    c0 = start // chunk_tokens
    n_ch = (kv_len + chunk_tokens - 1) // chunk_tokens
    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def chunk_copies(c, tog):
        out = []
        for j in range(ppb):
            pg = tables_ref[b, c * ppb + j]
            out.append(pltpu.make_async_copy(
                kc_ref.at[lay, pg], kbuf.at[tog, j], csem.at[tog, 0, j]))
            out.append(pltpu.make_async_copy(
                vc_ref.at[lay, pg], vbuf.at[tog, j], csem.at[tog, 1, j]))
        return out

    for dma in chunk_copies(c0, jax.lax.rem(c0, 2)):
        dma.start()

    # Input-dtype matmul operands (bf16 hits the MXU's full rate; fp32
    # test inputs stay exact), fp32 accumulation throughout.
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)         # [H, d]
    col = jax.lax.broadcasted_iota(jnp.int32, (h, cols), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, cols), 0)
    head_ok = (col % hkv) == (row // group)
    tok_in_chunk = col // hkv

    def body(c, _):
        tog = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_ch)
        def _():
            for dma in chunk_copies(c + 1, 1 - tog):
                dma.start()

        for dma in chunk_copies(c, tog):
            dma.wait()

        k = kbuf[tog].reshape(cols, d)
        v = vbuf[tog].reshape(cols, d)
        s = jax.lax.dot_general(                            # [H, cols]
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        pos = c * chunk_tokens + tok_in_chunk
        tok_ok = (pos < kv_len) & (pos >= start)
        s = jnp.where(head_ok & tok_ok, s, _NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(                           # [H, d]
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:, :] = acc_ref[:, :] * alpha + pv
        m_ref[:, :] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:, :] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(c0, n_ch, body, 0)

    lsum = l_ref[:, :1]
    o_ref[0] = (acc_ref[:, :]
                / jnp.where(lsum == 0.0, 1.0, lsum)).astype(o_ref.dtype)


def _fused_kernel_quant(layer_ref, tables_ref, lens_ref, starts_ref,
                        slots_ref, zslots_ref,
                        q_ref, knew_ref, vnew_ref, kc_in, vc_in,
                        ks_ref, vs_ref,
                        o_ref, kc_ref, vc_ref,
                        kbuf, vbuf, ksbuf, vsbuf, zbuf, csem, wsem,
                        m_ref, l_ref, acc_ref, *,
                        scale: float, page_size: int, num_kv_heads: int,
                        group: int, softcap, ppb: int, zero_writes: bool,
                        smode: str):
    """Quantized-KV (int8/fp8) fused write+attend variant.

    Differences from _fused_kernel:
    - knew/vnew arrive already quantized (per-(token, head) scales were
      scattered into the scale pools by the caller BEFORE this kernel, so
      every page's scales — including this step's row — are visible).
    - The scale pools travel as read-only flat [L, NP, ps*Hkv] inputs;
      each chunk DMA also fetches the ppb pages' scale rows.
    - Dequant never materializes a bf16 page: scores absorb the K scales
      as a column-wise multiply on the MXU partial result; probabilities
      absorb the V scales before the PV matmul — the same factoring as
      the unfused quant kernel (paged_attention.py _decode_kernel_quant),
      which the reference cannot do at all (it rejects fp8 KV +
      eviction, torch_cuda_sdpa.py:769-772).

    Three static scale layouts (smode):
    - "gather" (every production shape): the caller PRE-GATHERS each
      sequence's per-chunk scale strips by block table on the XLA side
      ([B, n_ch, 1, cols] f32) and they stream in as a normal BlockSpec
      input — zero in-kernel scale DMAs or gathers.  The two rejected
      designs both showed per-page costs dwarfing the halved KV bytes:
      per-page 512-byte scale DMAs ran 65k tiny DMAs/token at a
      16k-token budget (16 tok/s), and VMEM-resident planes with
      per-chunk dynamic row reads + lane concats cost ~2.4 us/page/layer
      (50 tok/s at a 2k budget vs bf16's 99).
    - "strip" (aligned, pre-gathered block too big for VMEM): per-page
      scale strips DMA'd alongside the value pages into 128-aligned
      offsets of a [1, cols] buffer; chunk processing identical.
    - "page" (ps·Hkv % 128 != 0 test shapes): per-page [1, cpp_pad]
      buffers (Mosaic rejects sub-128 lane-dim ref slices) and per-page
      softmax updates.  Correct but serial — measured 3.2x slower at
      equal page count.
    "gather"/"strip" run the chunk as ONE [H, cols] matmul + ONE
    softmax update + ONE PV matmul — same op count as the bf16 kernel.
    """
    del kc_in, vc_in
    b = pl.program_id(0)
    lay = layer_ref[0]
    ps = page_size
    hkv = num_kv_heads
    h = q_ref.shape[1]
    d = q_ref.shape[2]
    cpp = ps * hkv                 # scale columns per page
    aligned = cpp % 128 == 0
    cols = ppb * cpp
    chunk_tokens = ppb * ps

    @pl.when(b == 0)
    def _():
        zbuf[:] = jnp.zeros_like(zbuf)

    slot = slots_ref[b]
    pg_w = slot // ps
    off_w = slot % ps
    kw = pltpu.make_async_copy(knew_ref.at[0], kc_ref.at[lay, pg_w, off_w],
                               wsem.at[0])
    vw = pltpu.make_async_copy(vnew_ref.at[0], vc_ref.at[lay, pg_w, off_w],
                               wsem.at[1])
    kw.start()
    vw.start()
    if zero_writes:
        zs = zslots_ref[b]
        pz = zs // ps
        oz = zs % ps
        kz = pltpu.make_async_copy(zbuf, kc_ref.at[lay, pz, oz], wsem.at[2])
        vz = pltpu.make_async_copy(zbuf, vc_ref.at[lay, pz, oz], wsem.at[3])
        kz.start()
        vz.start()
        kz.wait()
        vz.wait()
    kw.wait()
    vw.wait()

    kv_len = lens_ref[b]
    start = starts_ref[b]
    c0 = start // chunk_tokens
    n_ch = (kv_len + chunk_tokens - 1) // chunk_tokens
    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def chunk_copies(c, tog):
        out = []
        for j in range(ppb):
            pg = tables_ref[b, c * ppb + j]
            out.append(pltpu.make_async_copy(
                kc_ref.at[lay, pg], kbuf.at[tog, j], csem.at[tog, 0, j]))
            out.append(pltpu.make_async_copy(
                vc_ref.at[lay, pg], vbuf.at[tog, j], csem.at[tog, 1, j]))
            if smode == "gather":
                continue
            if aligned:
                ks_dst = ksbuf.at[tog, 0, pl.ds(j * cpp, cpp)]
                vs_dst = vsbuf.at[tog, 0, pl.ds(j * cpp, cpp)]
            else:
                ks_dst = ksbuf.at[tog, j]
                vs_dst = vsbuf.at[tog, j]
            out.append(pltpu.make_async_copy(
                ks_ref.at[lay, pg], ks_dst, csem.at[tog, 2, j]))
            out.append(pltpu.make_async_copy(
                vs_ref.at[lay, pg], vs_dst, csem.at[tog, 3, j]))
        return out

    for dma in chunk_copies(c0, jax.lax.rem(c0, 2)):
        dma.start()

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)         # [H, d]
    ncol = cols if aligned else cpp
    col = jax.lax.broadcasted_iota(jnp.int32, (h, ncol), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, ncol), 0)
    head_ok = (col % hkv) == (row // group)
    tok_in = col // hkv            # within-chunk (aligned) / within-page

    def softmax_update(s, v, vs):
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(e, axis=1, keepdims=True)
        pv = jax.lax.dot_general(                          # [H, d]
            (e * vs).astype(v.dtype), v,                   # absorb V scales
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:, :] = acc_ref[:, :] * alpha + pv
        m_ref[:, :] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:, :] = jnp.broadcast_to(l_new, l_ref.shape)

    def body(c, _):
        tog = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_ch)
        def _():
            for dma in chunk_copies(c + 1, 1 - tog):
                dma.start()

        for dma in chunk_copies(c, tog):
            dma.wait()

        if aligned:
            # int8/fp8 values are exact in bf16 (<= 8 significand bits).
            k = _widen_bf16(kbuf[tog].reshape(cols, d)).astype(q.dtype)
            v = _widen_bf16(vbuf[tog].reshape(cols, d)).astype(q.dtype)
            if smode == "gather":
                # Pre-gathered strips stream in via the BlockSpec: the
                # chunk's [1, cols] row at a (cheap) major-dim index.
                ks = ks_ref[0, c]
                vs = vs_ref[0, c]
            else:
                ks = ksbuf[tog]                            # [1, cols]
                vs = vsbuf[tog]
            s = jax.lax.dot_general(                       # [H, cols]
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * ks
            if softcap is not None:
                s = softcap * jnp.tanh(s / softcap)
            pos = c * chunk_tokens + tok_in
            tok_ok = (pos < kv_len) & (pos >= start)
            s = jnp.where(head_ok & tok_ok, s, _NEG_INF)
            softmax_update(s, v, vs)
            return 0

        for j in range(ppb):
            k = _widen_bf16(kbuf[tog, j].reshape(cpp, d)).astype(q.dtype)
            v = _widen_bf16(vbuf[tog, j].reshape(cpp, d)).astype(q.dtype)
            # Offset-0 sub-tile value slices lower fine (cf. m_ref[:, :1]);
            # the buffers are lane-padded to 128 because Mosaic rejects
            # sub-128 lane-dim REF slices in the DMA otherwise.
            ks = ksbuf[tog, j][:, :cpp]                    # [1, cpp]
            vs = vsbuf[tog, j][:, :cpp]
            s = jax.lax.dot_general(                       # [H, cpp]
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * ks
            if softcap is not None:
                s = softcap * jnp.tanh(s / softcap)
            pos = c * chunk_tokens + j * ps + tok_in
            tok_ok = (pos < kv_len) & (pos >= start)
            s = jnp.where(head_ok & tok_ok, s, _NEG_INF)
            softmax_update(s, v, vs)
        return 0

    jax.lax.fori_loop(c0, n_ch, body, 0)

    lsum = l_ref[:, :1]
    o_ref[0] = (acc_ref[:, :]
                / jnp.where(lsum == 0.0, 1.0, lsum)).astype(o_ref.dtype)


def _fused_quant(q, k_new, v_new, kc_all, vc_all, layer, tables, kv_lens,
                 slots, zero_slots, window_starts, *, scale, softcap,
                 pages_per_chunk):
    """Quantized-pool driver: online-quantize the step's K/V rows, scatter
    their scales into the (tiny) scale pools via XLA, then run the fused
    Pallas kernel over the int8/fp8 value pools (aliased in place).

    kc_all/vc_all: QuantKV(q=[L, NP, ps, Hkv, d] int8|fp8,
                           s=[L, NP, ps, Hkv] f32).
    The scale pools are ~64x smaller than the value pools (d=128: 4 B per
    row-head vs 256 B), so the XLA scatter's per-layer copy inside the
    scan costs <1 us/layer — the value pools, where the bandwidth is,
    stay zero-copy through the kernel's aliased DMA writes.
    """
    from ..quant import quantize_kv_rows

    b, h_orig, d = q.shape
    num_layers, num_pages, page_size, num_kv, _ = kc_all.q.shape
    group = h_orig // num_kv
    cpp = page_size * num_kv

    kq, ks_rows = quantize_kv_rows(k_new, kc_all.q.dtype)
    vq, vs_rows = quantize_kv_rows(v_new, vc_all.q.dtype)

    lay_s = jnp.asarray(layer, jnp.int32)
    ks_pool = kc_all.s.reshape(num_layers, num_pages * page_size, num_kv)
    vs_pool = vc_all.s.reshape(num_layers, num_pages * page_size, num_kv)
    # Cast at the write site: scale pools may be bf16 (the chip-winning
    # delivery mode) while quantize_kv_rows returns f32 — an implicit
    # f32->bf16 scatter cast is a FutureWarning today, an error in
    # future JAX.
    ks_pool = ks_pool.at[lay_s, slots].set(
        ks_rows.astype(ks_pool.dtype), mode="drop")
    vs_pool = vs_pool.at[lay_s, slots].set(
        vs_rows.astype(vs_pool.dtype), mode="drop")
    if zero_slots is not None:
        ks_pool = ks_pool.at[lay_s, zero_slots].set(0.0, mode="drop")
        vs_pool = vs_pool.at[lay_s, zero_slots].set(0.0, mode="drop")
    h = _round_up(h_orig, 8)
    if h != h_orig:
        q = jnp.pad(q, ((0, 0), (0, h - h_orig), (0, 0)))

    p = tables.shape[1]
    ppb = min(pages_per_chunk, p)
    n_ch = -(-p // ppb)
    pad_w = n_ch * ppb - p
    if pad_w:
        tables = jnp.pad(tables, ((0, 0), (0, pad_w)), mode="edge")

    # Scale delivery mode (kernel docstring): "gather" pre-assembles each
    # sequence's per-chunk scale strips by table on the XLA side and
    # streams them as a BlockSpec input; "strip" DMAs per-page rows into
    # a [1, cols] buffer in-kernel; "page" is the unaligned fallback.
    aligned = cpp % 128 == 0
    cols = ppb * cpp
    sdt = kc_all.s.dtype
    smode = ("gather" if aligned and n_ch * cols * 4 <= _GATHER_LIMIT
             else "strip" if aligned else "page")
    if smode == "gather":
        def strip(pool):   # [L, NP*ps, Hkv] -> [B, n_ch, 1, cols]
            plane = pool[lay_s].reshape(num_pages, cpp)
            return plane[tables].reshape(b, n_ch, 1, cols)
        ks_flat = strip(ks_pool)
        vs_flat = strip(vs_pool)
    elif smode == "strip":
        ks_flat = ks_pool.reshape(num_layers, num_pages, cpp)
        vs_flat = vs_pool.reshape(num_layers, num_pages, cpp)
    else:
        cpp_pad = _round_up(cpp, 128)
        pad = ((0, 0), (0, 0), (0, 0), (0, cpp_pad - cpp))
        ks_flat = jnp.pad(
            ks_pool.reshape(num_layers, num_pages, 1, cpp), pad)
        vs_flat = jnp.pad(
            vs_pool.reshape(num_layers, num_pages, 1, cpp), pad)

    zero_writes = zero_slots is not None
    if zero_slots is None:
        zero_slots = jnp.zeros_like(slots)
    if window_starts is None:
        window_starts = jnp.zeros_like(kv_lens)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def q_map(b_, *refs):
        return (b_, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, d), q_map),            # q
            pl.BlockSpec((1, num_kv, d), q_map),       # kq_new
            pl.BlockSpec((1, num_kv, d), q_map),       # vq_new
            pl.BlockSpec(memory_space=pl.ANY),      # kc.q
            pl.BlockSpec(memory_space=pl.ANY),      # vc.q
            (pl.BlockSpec((1, n_ch, 1, cols),
                          lambda b_, *r: (b_, 0, 0, 0))
             if smode == "gather"
             else pl.BlockSpec(memory_space=pl.ANY)),   # K scales
            (pl.BlockSpec((1, n_ch, 1, cols),
                          lambda b_, *r: (b_, 0, 0, 0))
             if smode == "gather"
             else pl.BlockSpec(memory_space=pl.ANY)),   # V scales
        ],
        out_specs=[
            pl.BlockSpec((1, h, d), q_map),            # out
            pl.BlockSpec(memory_space=pl.ANY),      # kc.q (aliased)
            pl.BlockSpec(memory_space=pl.ANY),      # vc.q (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ppb, page_size, num_kv, d), kc_all.q.dtype),
            pltpu.VMEM((2, ppb, page_size, num_kv, d), vc_all.q.dtype),
            (pltpu.VMEM((8, 128), sdt) if smode == "gather"
             else pltpu.VMEM((2, 1, cols), sdt)
             if smode == "strip"
             else pltpu.VMEM((2, ppb, 1, _round_up(cpp, 128)),
                             sdt)),                         # K scale buf
            (pltpu.VMEM((8, 128), sdt) if smode == "gather"
             else pltpu.VMEM((2, 1, cols), sdt)
             if smode == "strip"
             else pltpu.VMEM((2, ppb, 1, _round_up(cpp, 128)),
                             sdt)),                         # V scale buf
            pltpu.VMEM((num_kv, d), kc_all.q.dtype),   # zeros source
            pltpu.SemaphoreType.DMA((2, 4, ppb)),      # chunk DMAs
            pltpu.SemaphoreType.DMA((4,)),             # write DMAs
            pltpu.VMEM((h, 128), jnp.float32),         # m
            pltpu.VMEM((h, 128), jnp.float32),         # l
            pltpu.VMEM((h, d), jnp.float32),           # acc
        ],
    )
    kern = functools.partial(
        _fused_kernel_quant, scale=scale, page_size=page_size,
        num_kv_heads=num_kv, group=group, softcap=softcap, ppb=ppb,
        zero_writes=zero_writes, smode=smode)
    kv_bytes = ((2 * p * page_size * num_kv * d
                 * jnp.dtype(kc_all.q.dtype).itemsize
                 + 2 * p * cpp * 4) * b)
    # flattened inputs: 6 scalar-prefetch + q(6) kq(7) vq(8) kc.q(9)
    # vc.q(10) ks(11) vs(12); outputs: out(0) kc.q(1) vc.q(2)
    out, kcq, vcq = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, d), q.dtype),
            jax.ShapeDtypeStruct(kc_all.q.shape, kc_all.q.dtype),
            jax.ShapeDtypeStruct(vc_all.q.shape, vc_all.q.dtype),
        ],
        input_output_aliases={9: 1, 10: 2},
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * p * page_size * num_kv * d * h,
            bytes_accessed=kv_bytes,
            transcendentals=b * p * page_size * num_kv * h),
    )(layer, tables, kv_lens, window_starts, slots, zero_slots, q, kq,
      vq, kc_all.q, vc_all.q, ks_flat, vs_flat)
    from ..quant import QuantKV
    new_s = (num_layers, num_pages, page_size, num_kv)
    return (out[:, :h_orig],
            QuantKV(q=kcq, s=ks_pool.reshape(new_s)),
            QuantKV(q=vcq, s=vs_pool.reshape(new_s)))


def _fused_kernel_flat(layer_ref, tables_ref, lens_ref, starts_ref,
                       slots_ref,
                       zslots_ref, q_ref, knew_ref, vnew_ref, kc_in, vc_in,
                       o_ref, kc_ref, vc_ref,
                       kbuf, vbuf, pbuf, zrow, csem, wsem,
                       m_ref, l_ref, acc_ref, *,
                       scale: float, page_size: int, softcap, ppb: int,
                       zero_writes: bool):
    """Flat-page variant for head dims that break lane tiling (d % 128
    != 0, e.g. 64): pools travel as [L, NP, ps, Hkv*d] so every DMA is a
    whole [ps, F] trailing block.  The slot write becomes a page
    read-modify-write through ``pbuf``; attention runs with per-kv-head
    query segments (q_ref rows are zero outside the head's own segment,
    so no (head, kv-head) masking is needed) and accumulates [H, F]
    outputs whose per-head segment the host extracts."""
    del kc_in, vc_in
    b = pl.program_id(0)
    lay = layer_ref[0]
    ps = page_size
    f = q_ref.shape[2]
    h = q_ref.shape[1]
    chunk_tokens = ppb * ps

    @pl.when(b == 0)
    def _():
        zrow[:] = jnp.zeros_like(zrow)

    slot = slots_ref[b]

    def rmw(pool_ref, row, s):
        pg = s // ps
        off = s % ps
        cin = pltpu.make_async_copy(pool_ref.at[lay, pg], pbuf, wsem.at[0])
        cin.start()
        cin.wait()
        sel = (jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0) == off)
        pbuf[:] = jnp.where(sel, row, pbuf[:])
        cout = pltpu.make_async_copy(pbuf, pool_ref.at[lay, pg],
                                     wsem.at[0])
        cout.start()
        cout.wait()

    if zero_writes:
        zs = zslots_ref[b]
        rmw(kc_ref, zrow[:], zs)
        rmw(vc_ref, zrow[:], zs)
    rmw(kc_ref, knew_ref[0], slot)
    rmw(vc_ref, vnew_ref[0], slot)

    kv_len = lens_ref[b]
    start = starts_ref[b]
    c0 = start // chunk_tokens
    n_ch = (kv_len + chunk_tokens - 1) // chunk_tokens
    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def chunk_copies(c, tog):
        out = []
        for j in range(ppb):
            pg = tables_ref[b, c * ppb + j]
            out.append(pltpu.make_async_copy(
                kc_ref.at[lay, pg], kbuf.at[tog, j], csem.at[tog, 0, j]))
            out.append(pltpu.make_async_copy(
                vc_ref.at[lay, pg], vbuf.at[tog, j], csem.at[tog, 1, j]))
        return out

    for dma in chunk_copies(c0, jax.lax.rem(c0, 2)):
        dma.start()

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)          # [H, F]
    tok_col = jax.lax.broadcasted_iota(jnp.int32, (h, chunk_tokens), 1)

    def body(c, _):
        tog = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_ch)
        def _():
            for dma in chunk_copies(c + 1, 1 - tog):
                dma.start()

        for dma in chunk_copies(c, tog):
            dma.wait()

        k = kbuf[tog].reshape(chunk_tokens, f)
        v = vbuf[tog].reshape(chunk_tokens, f)
        # Zero segments of q annihilate other kv heads' contributions.
        s = jax.lax.dot_general(                            # [H, tokens]
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        pos = c * chunk_tokens + tok_col
        tok_ok = (pos < kv_len) & (pos >= start)
        s = jnp.where(tok_ok, s, _NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(                           # [H, F]
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:, :] = acc_ref[:, :] * alpha + pv
        m_ref[:, :] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:, :] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(c0, n_ch, body, 0)

    lsum = l_ref[:, :1]
    o_ref[0] = (acc_ref[:, :]
                / jnp.where(lsum == 0.0, 1.0, lsum)).astype(o_ref.dtype)


def _fused_flat(q, k_new, v_new, kc_all, vc_all, layer, tables, kv_lens,
                slots, zero_slots, window_starts, *, scale, softcap,
                pages_per_chunk):
    b, h_orig, d = q.shape
    num_layers, num_pages, page_size, num_kv, _ = kc_all.shape
    f = num_kv * d
    group = h_orig // num_kv
    h = _round_up(h_orig, 8)

    # Per-kv-head query segments: row h is zero except in segment h//group.
    kh = jnp.clip(jnp.arange(h) // group, 0, num_kv - 1)
    oh = jax.nn.one_hot(kh, num_kv, dtype=q.dtype)          # [h, Hkv]
    q_pad = (jnp.pad(q, ((0, 0), (0, h - h_orig), (0, 0)))
             if h != h_orig else q)
    q_flat = (oh[None, :, :, None] * q_pad[:, :, None, :]).reshape(
        b, h, f)

    kc_flat = kc_all.reshape(num_layers, num_pages, page_size, f)
    vc_flat = vc_all.reshape(num_layers, num_pages, page_size, f)
    kn = k_new.reshape(b, 1, f)
    vn = v_new.reshape(b, 1, f)

    p = tables.shape[1]
    ppb = min(pages_per_chunk, p)
    n_ch = -(-p // ppb)
    pad_w = n_ch * ppb - p
    if pad_w:
        tables = jnp.pad(tables, ((0, 0), (0, pad_w)), mode="edge")

    zero_writes = zero_slots is not None
    if zero_slots is None:
        zero_slots = jnp.zeros_like(slots)
    if window_starts is None:
        window_starts = jnp.zeros_like(kv_lens)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def q_map(b_, *refs):
        return (b_, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, f), q_map),
            pl.BlockSpec((1, 1, f), q_map),
            pl.BlockSpec((1, 1, f), q_map),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, h, f), q_map),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ppb, page_size, f), kc_flat.dtype),
            pltpu.VMEM((2, ppb, page_size, f), vc_flat.dtype),
            pltpu.VMEM((page_size, f), kc_flat.dtype),   # RMW staging
            pltpu.VMEM((1, f), kc_flat.dtype),           # zeros row
            pltpu.SemaphoreType.DMA((2, 2, ppb)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, f), jnp.float32),
        ],
    )
    kern = functools.partial(
        _fused_kernel_flat, scale=scale, page_size=page_size,
        softcap=softcap, ppb=ppb, zero_writes=zero_writes)
    kv_bytes = (2 * p * page_size * f
                * jnp.dtype(kc_flat.dtype).itemsize * b)
    out, kc_flat, vc_flat = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, f), q.dtype),
            jax.ShapeDtypeStruct(kc_flat.shape, kc_flat.dtype),
            jax.ShapeDtypeStruct(vc_flat.shape, vc_flat.dtype),
        ],
        input_output_aliases={9: 1, 10: 2},
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * p * page_size * f * h,
            bytes_accessed=kv_bytes,
            transcendentals=b * p * page_size * h),
    )(layer, tables, kv_lens, window_starts, slots, zero_slots, q_flat,
      kn, vn, kc_flat, vc_flat)
    # Extract each head's own kv segment from the [H, F] accumulators.
    out4 = out[:, :h_orig].reshape(b, h_orig, num_kv, d)
    idx = (jnp.arange(h_orig) // group)[None, :, None, None]
    out_h = jnp.take_along_axis(out4, idx, axis=2)[:, :, 0]
    pool_shape = (num_layers, num_pages, page_size, num_kv, d)
    return (out_h, kc_flat.reshape(pool_shape),
            vc_flat.reshape(pool_shape))


def fused_paged_decode_attention(q, k_new, v_new, kc_all, vc_all, layer,
                                 tables, kv_lens, slots, zero_slots=None,
                                 window_starts=None,
                                 *, scale: float,
                                 softcap: float | None = None,
                                 pages_per_chunk: int = 8):
    """Write new K/V rows into the stacked pools (in place) and run paged
    decode attention, as one kernel.

    q:            [B, H, d]      post-rope queries
    k/v_new:      [B, Hkv, d]    this step's K/V rows
    kc/vc_all:    [L, num_pages, page_size, Hkv, d]  stacked pools
                  (returned aliased — pass donated buffers)
    layer:        scalar int32   which layer's pool slice to touch
    tables:       [B, P] int32   block tables (invalid entries in-bounds)
    kv_lens:      [B] int32      physical kv length incl. the new token
    slots:        [B] int32      flat destination slot of the new token
    zero_slots:   [B] int32 or None — extra slots to zero-overwrite
                  (host maps "none" lanes to the trash slot)
    window_starts:[B] int32 or None — first attended position per row
                  (sliding-window layers: max(kv_len - window, 0);
                  pages wholly below the start are skipped, DMA included)
    Returns (out [B, H, d], kc_all, vc_all).
    """
    from ..quant import QuantKV
    if isinstance(kc_all, QuantKV):
        # int8/fp8 pools: per-(token, head) scales scattered outside the
        # kernel, dequant absorbed into the score/probability matrices.
        b, h_orig, d = q.shape
        if d % 128 != 0:
            raise ValueError(
                f"quantized-KV fused decode kernel needs head_dim % 128 "
                f"== 0, got {d} (route to the jnp oracle instead)")
        return _fused_quant(q, k_new, v_new, kc_all, vc_all, layer,
                            tables, kv_lens, slots, zero_slots,
                            window_starts, scale=scale, softcap=softcap,
                            pages_per_chunk=pages_per_chunk)
    b, h_orig, d = q.shape
    _, _, page_size, num_kv, _ = kc_all.shape
    group = h_orig // num_kv
    if d % 128 != 0:
        # Unaligned head dims (64-dim models) take the flat-page variant.
        if (num_kv * d) % 128 != 0:
            raise ValueError(
                f"fused decode kernel needs head_dim or num_kv_heads*"
                f"head_dim to be a multiple of 128, got {num_kv}x{d}")
        return _fused_flat(q, k_new, v_new, kc_all, vc_all, layer,
                           tables, kv_lens, slots, zero_slots,
                           window_starts,
                           scale=scale, softcap=softcap,
                           pages_per_chunk=pages_per_chunk)
    h = _round_up(h_orig, 8)
    if h != h_orig:
        q = jnp.pad(q, ((0, 0), (0, h - h_orig), (0, 0)))

    p = tables.shape[1]
    ppb = min(pages_per_chunk, p)
    n_ch = -(-p // ppb)
    pad_w = n_ch * ppb - p
    if pad_w:
        tables = jnp.pad(tables, ((0, 0), (0, pad_w)), mode="edge")

    zero_writes = zero_slots is not None
    if zero_slots is None:
        zero_slots = jnp.zeros_like(slots)
    if window_starts is None:
        window_starts = jnp.zeros_like(kv_lens)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    def q_map(b_, *refs):
        return (b_, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, d), q_map),            # q
            pl.BlockSpec((1, num_kv, d), q_map),       # k_new
            pl.BlockSpec((1, num_kv, d), q_map),       # v_new
            pl.BlockSpec(memory_space=pl.ANY),      # kc_all
            pl.BlockSpec(memory_space=pl.ANY),      # vc_all
        ],
        out_specs=[
            pl.BlockSpec((1, h, d), q_map),            # out
            pl.BlockSpec(memory_space=pl.ANY),      # kc_all (aliased)
            pl.BlockSpec(memory_space=pl.ANY),      # vc_all (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ppb, page_size, num_kv, d), kc_all.dtype),
            pltpu.VMEM((2, ppb, page_size, num_kv, d), vc_all.dtype),
            pltpu.VMEM((num_kv, d), kc_all.dtype),     # zeros source
            pltpu.SemaphoreType.DMA((2, 2, ppb)),      # chunk DMAs
            pltpu.SemaphoreType.DMA((4,)),             # write DMAs
            pltpu.VMEM((h, 128), jnp.float32),         # m
            pltpu.VMEM((h, 128), jnp.float32),         # l
            pltpu.VMEM((h, d), jnp.float32),           # acc
        ],
    )
    kern = functools.partial(
        _fused_kernel, scale=scale, page_size=page_size,
        num_kv_heads=num_kv, group=group, softcap=softcap, ppb=ppb,
        zero_writes=zero_writes)
    kv_bytes = (2 * p * page_size * num_kv * d
                * jnp.dtype(kc_all.dtype).itemsize * b)
    out, kc_all, vc_all = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, d), q.dtype),
            jax.ShapeDtypeStruct(kc_all.shape, kc_all.dtype),
            jax.ShapeDtypeStruct(vc_all.shape, vc_all.dtype),
        ],
        # flattened inputs: 6 scalar-prefetch + q(6) knew(7) vnew(8)
        # kc(9) vc(10); outputs: out(0) kc(1) vc(2)
        input_output_aliases={9: 1, 10: 2},
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * p * page_size * num_kv * d * h,
            bytes_accessed=kv_bytes,
            transcendentals=b * p * page_size * num_kv * h),
    )(layer, tables, kv_lens, window_starts, slots, zero_slots, q, k_new,
      v_new, kc_all, vc_all)
    return out[:, :h_orig], kc_all, vc_all


def fused_paged_decode_reference(q, k_new, v_new, kc_all, vc_all, layer,
                                 tables, kv_lens, slots, zero_slots=None,
                                 window_starts=None,
                                 *, scale: float,
                                 softcap: float | None = None):
    """Pure-jnp oracle of the fused op (also the CPU execution path).
    Handles QuantKV pools (the Pallas fused kernel is bf16-pool only for
    now; the runner routes quantized-KV configs here / to the unfused
    quant kernel)."""
    from ..attention import paged_decode_attention
    from ..cache import write_kv_slots, zero_kv_slots

    kc = jax.tree.map(lambda x: x[layer], kc_all)
    vc = jax.tree.map(lambda x: x[layer], vc_all)
    kc, vc = write_kv_slots(kc, vc, k_new, v_new, slots)
    if zero_slots is not None:
        kc, vc = zero_kv_slots(kc, vc, zero_slots)
    extra = {}
    if window_starts is not None:
        b = kv_lens.shape[0]
        page_size = jax.tree.leaves(kc)[0].shape[1]
        s = tables.shape[1] * page_size
        h = q.shape[1]
        allowed = jnp.arange(s)[None] >= window_starts[:, None]  # [B, S]
        extra["extra_mask"] = jnp.broadcast_to(allowed[:, None],
                                               (b, h, s))
    out = paged_decode_attention(q, kc, vc, tables, kv_lens, scale, softcap,
                                 **extra)
    kc_all = jax.tree.map(lambda a, s: a.at[layer].set(s), kc_all, kc)
    vc_all = jax.tree.map(lambda a, s: a.at[layer].set(s), vc_all, vc)
    return out, kc_all, vc_all
