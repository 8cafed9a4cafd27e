"""Pallas TPU int4 weight × bf16 activation fused matmul.

TPU-native replacement for the reference's int4 GEMM kernels
(csrc/quantization/gptq_marlin/ — marlin dequant-in-registers GEMM; also
awq_gemm csrc/quantization/awq/gemm_kernels.cu): GPTQ/AWQ checkpoints
execute at 4-bit weight bandwidth instead of being dequantized to bf16 at
load.  On a 16 GiB chip this is the difference between 8B-int8 and
8B-int4 + headroom; decode is weight-bandwidth-bound, so halving the
bytes read per step is ~2× decode throughput at the margin.

Design (not a translation):
- Packing pairs row k with row k + K/2 in one int8 byte (low nibble = k,
  high nibble = k + K/2).  Unpacking therefore yields two CONTIGUOUS
  half-matrices W_lo (rows [0, K/2)) and W_hi (rows [K/2, K)) — no
  row-interleave shuffle on the VPU, and the contraction splits into
  x_lo @ W_lo + x_hi @ W_hi with both terms reading the SAME packed tile.
- Group-wise (group=128 along in-features) scale + zero-point f32 arrays,
  GPTQ-style asymmetric uint4: w ≈ (q - z) · s.
- Grid = (M tiles, N tiles, K tiles), K innermost; fp32 accumulator in
  VMEM scratch.  Dequant is GROUP-FACTORED: the MXU multiplies the raw
  4-bit values (exact in bf16) and scale/zero apply to the [bm, bn]
  partial sums — x @ ((q-z)·s) = (x@q)·s - (Σx)·(z·s) per group — so the
  per-element VPU path is just the 2-op nibble unpack + cast.  HBM
  traffic per (m, n) tile ≈ K/2 · bn bytes of weight — the 4-bit speed
  of light.

The jnp oracle (int4_matmul_ref) runs everywhere and backs the CPU tests;
the Pallas kernel runs interpret-mode on CPU, compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128


class QuantizedWeight4(NamedTuple):
    """4-bit packed weight.

    qp: uint8 [K//2, N] — low nibble = row j, high nibble = row j + K//2
    s:  f32 [K//group, N] scales
    z:  f32 [K//group, N] zero points (uint4 range, typically ~8)
    """

    qp: jnp.ndarray
    s: jnp.ndarray
    z: jnp.ndarray


def quantize_weight_int4(w, group: Optional[int] = None
                         ) -> QuantizedWeight4:
    """Asymmetric per-group uint4 quantization over the in-features axis.

    w: [K, N] or stacked [L, K, N] (numpy stays on host; the packed tree
    is what hits HBM).  K must be even; group defaults to 128, shrinking
    to a divisor of K for small (test-sized) matrices.
    """
    if w.ndim == 3:
        per = [quantize_weight_int4(w[i], group) for i in range(w.shape[0])]
        return QuantizedWeight4(qp=jnp.stack([p.qp for p in per]),
                                s=jnp.stack([p.s for p in per]),
                                z=jnp.stack([p.z for p in per]))
    on_host = isinstance(w, np.ndarray)
    xp = np if on_host else jnp
    wf = w.astype(np.float32 if on_host else jnp.float32)
    K, N = wf.shape
    if group is None:
        group = GROUP
        while K % group:
            group //= 2
    assert K % 2 == 0 and K % group == 0 and group >= 1, (K, group)
    g = wf.reshape(K // group, group, N)
    w_min = g.min(axis=1)
    w_max = g.max(axis=1)
    scale = xp.maximum((w_max - w_min) / 15.0, 1e-8)
    # The zero point is a free f32 (NOT clipped to the uint4 range): an
    # all-positive group needs a negative zero so q = round(w/s)+z stays
    # affine over [min, max] — clipping z would saturate such groups.
    zero = xp.round(-w_min / scale)
    q = xp.clip(xp.round(g / scale[:, None, :]) + zero[:, None, :],
                0, 15).astype(np.int32 if on_host else jnp.int32)
    q = q.reshape(K, N)
    lo = q[: K // 2]
    hi = q[K // 2:]
    # uint8 storage: astype(int32) zero-extends in the kernel, so the
    # high-nibble unpack is a bare shift (no sign-extension mask).
    packed = (lo | (hi << 4)).astype(np.uint8 if on_host else jnp.uint8)
    if on_host:
        return QuantizedWeight4(qp=jnp.asarray(packed),
                                s=jnp.asarray(scale.astype(np.float32)),
                                z=jnp.asarray(zero.astype(np.float32)))
    return QuantizedWeight4(qp=packed, s=scale.astype(jnp.float32),
                            z=zero.astype(jnp.float32))


class PackedInt4(NamedTuple):
    """Kernel-native int4 weight with a packed bf16 scale/offset stream.

    The f32 s/z pair of QuantizedWeight4 costs 1/8 of the packed-weight
    bytes per decode step (0.44 GB/token on the 8B — ~10% of all decode
    HBM traffic, PROFILE_r03).  This form halves it: scales and the
    pre-combined offsets zs = z*s are stored together as bf16 in
    32-row tiles, one tile per kernel k-step, covering BOTH nibble
    halves —

        sz[..., 32*k +      g, :] = s [..., gs*k + g,            :]
        sz[..., 32*k +  8 + g, :] = zs[..., gs*k + g,            :]
        sz[..., 32*k + 16 + g, :] = s [..., n_half + gs*k + g, :]
        sz[..., 32*k + 24 + g, :] = zs[..., n_half + gs*k + g, :]

    (g < gs; n_half = n_groups/2 is where the high-nibble groups
    start).  The kernel reads ONE (32, bn) tile per k-step with STATIC
    row indices.  This shape dodges two measured failure modes:
    - the round-2 bf16-scale attempt died on Mosaic's 8-aligned
      dynamic-sublane-read constraint for sub-f32 dtypes; this layout
      never issues a dynamic sublane read at all;
    - passing the same scale array as two custom-call operands (lo+hi
      maps) makes XLA materialize a per-call defensive copy of the
      WHOLE stack — 58.7 MB per down-proj call, ~3.7 GB/token of pure
      copy traffic on the 8B (xplane, round 4).  Pair-interleaving
      lo/hi tiles needs only one operand.
    Eligible when group == 128 and gs >= 4 (gs = groups per k-step,
    see _pick_gs); at gs == 8 the stream halves vs f32 s/z.

    qp: uint8 [..., K//2, N] (same packing as QuantizedWeight4)
    sz: bf16 [..., (n_half // gs) * 32, N]
    """

    qp: jnp.ndarray
    sz: jnp.ndarray


def packed_gs(p4: PackedInt4) -> int:
    """Groups per k-step baked into the sz layout."""
    n_half = p4.qp.shape[-2] // GROUP
    return 32 * n_half // p4.sz.shape[-2]


def pack_int4_scales(w4: QuantizedWeight4, gs: Optional[int] = None):
    """QuantizedWeight4 -> PackedInt4 when the kernel-eligible layout
    applies; returns ``w4`` unchanged otherwise (small/odd shapes keep
    the f32 path).  One-time transform at weight build — never inside a
    step function (it would re-stream s/z every token).  ``gs``
    overrides the groups-per-k-step baked into the layout (tuning)."""
    Kh, N = w4.qp.shape[-2:]
    if (w4.s.shape[-2] == 0 or group_of(w4) != GROUP or Kh % GROUP
            or N % 128):
        return w4
    if gs is None:
        gs = _pick_gs(Kh // GROUP)
    assert (Kh // GROUP) % gs == 0, (Kh, gs)
    if gs < 4:
        return w4
    s = jnp.asarray(w4.s, jnp.float32)
    zs = jnp.asarray(w4.z, jnp.float32) * s
    lead = s.shape[:-2]
    n_groups, _ = s.shape[-2:]
    n_half = n_groups // 2
    n_k = n_half // gs

    def blocks(a, base):
        b = a[..., base:base + n_half, :].reshape(*lead, n_k, gs, N)
        if gs < 8:
            b = jnp.pad(b, [(0, 0)] * (len(lead) + 1)
                        + [(0, 8 - gs), (0, 0)])
        return b

    szt = jnp.concatenate([blocks(s, 0), blocks(zs, 0),
                           blocks(s, n_half), blocks(zs, n_half)],
                          axis=-2)                 # [..., n_k, 32, N]
    return PackedInt4(qp=w4.qp,
                      sz=szt.reshape(*lead, n_k * 32, N
                                     ).astype(jnp.bfloat16))


def dequantize_packed(p4: PackedInt4, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[..., K, N] dense dequantization of the packed form — the oracle
    models the kernel's numerics exactly: bf16 s/zs, w = q*s - zs."""
    lo, hi = _unpack(p4.qp)
    q = jnp.concatenate([lo, hi], axis=-2)         # [..., K, N]
    K, N = q.shape[-2:]
    lead = q.shape[:-2]
    n_groups = K // GROUP
    n_half = n_groups // 2
    gs = 32 * n_half // p4.sz.shape[-2]
    n_k = n_half // gs
    szt = p4.sz.reshape(*lead, n_k, 32, N).astype(jnp.float32)

    def rows(base):
        b = szt[..., base:base + gs, :]            # [..., n_k, gs, N]
        return b.reshape(*lead, n_half, 1, N)

    s = jnp.concatenate([rows(0), rows(16)], axis=-3)
    zs = jnp.concatenate([rows(8), rows(24)], axis=-3)
    qg = q.reshape(*lead, n_groups, GROUP, N).astype(jnp.float32)
    return (qg * s - zs).reshape(*lead, K, N).astype(dtype)


def int4_matmul_packed_ref(x: jnp.ndarray, p4: PackedInt4) -> jnp.ndarray:
    w = dequantize_packed(p4, jnp.bfloat16)
    y = jnp.dot(x.astype(jnp.bfloat16), w,
                preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def _unpack(qp: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """packed [K//2, N] -> (lo, hi) int32 in [0, 15].  uint8 storage is
    canonical; `& 0xFF` keeps legacy int8 arrays correct too."""
    p = qp.astype(jnp.int32) & 0xFF
    return p & 0xF, (p >> 4) & 0xF


def group_of(w4: QuantizedWeight4) -> int:
    """Group size is implied by the shapes: K / num_groups."""
    return 2 * w4.qp.shape[-2] // w4.s.shape[-2]


def dequantize_int4(w4: QuantizedWeight4, group: Optional[int] = None,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """[K, N] dense reference dequantization."""
    group = group or group_of(w4)
    lo, hi = _unpack(w4.qp)
    q = jnp.concatenate([lo, hi], axis=0)          # [K, N]
    K, N = q.shape
    qg = q.reshape(K // group, group, N).astype(jnp.float32)
    w = (qg - w4.z[:, None, :]) * w4.s[:, None, :]
    return w.reshape(K, N).astype(dtype)


def int4_matmul_ref(x: jnp.ndarray, w4: QuantizedWeight4,
                    group: Optional[int] = None) -> jnp.ndarray:
    """jnp oracle: dequantize then matmul (materializes the dense weight —
    correctness reference and CPU fallback only).  Matches the kernel's
    numerics: bf16 operands, f32 accumulation."""
    w = dequantize_int4(w4, group, jnp.bfloat16)
    y = jnp.dot(x.astype(jnp.bfloat16), w,
                preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def _int4_body(x_lo, x_hi, p, s_row, z_row, o_ref, acc_ref, *,
               n_k: int, gs: int, dequant_weights: bool = False):
    """Shared kernel body (plain and stacked wrappers strip the leading
    layer axis before calling).

    Two dequant factorings, chosen by M (static):

    - decode (M < 128), ``dequant_weights=False``: within a group the
      scale/zero are constant, so x @ ((q - z) * s) = (x @ q) * s -
      (Σ_k x) * (z * s).  The MXU multiplies the RAW 4-bit values
      (exact in bf16) and the VPU applies scale/zero to the [bm, bn]
      PARTIAL SUMS — O(M·N) work per group instead of O(K·N).  The
      per-element path is only the 2-op unpack + bf16 cast; the naive
      per-element dequant was VPU-bound at ~100 GB/s effective, this
      form measures ~470 GB/s on v5e at the 8B decode shapes.
    - prefill (M >= 128), ``dequant_weights=True``: the partial-sum
      factoring costs O(M·N·G) VPU — ~1 ms/layer at M=1024 on the 8B
      gate_up, pinning prefill at ~60% MFU (xplane, PROFILE_r03).
      Dequantizing the weight TILE once per k-step is O(K·N) and
      amortizes over all M rows (crossover at M ≈ 3·group/4 ≈ 96).

    ``gs`` groups are processed per k-step (bk = gs·group): fewer, larger
    DMAs (the packed tile row chunk is bn bytes; grid-step overhead
    amortizes over gs MXU calls).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # & 0xFF matches _unpack: uint8 zero-extends anyway, but a legacy
    # int8-packed array would sign-extend and corrupt the high nibble.
    # (8-bit unpack was tried: Mosaic lowers neither u8->bf16 casts nor
    # u8 shifts — the int32 hop is required.)
    p = p.astype(jnp.int32) & 0xFF
    lo = (p & 0xF).astype(jnp.bfloat16)            # [bk, bn]
    hi = (p >> 4).astype(jnp.bfloat16)
    acc = acc_ref[:]
    if dequant_weights:
        for g in range(gs):
            r_lo = (k * gs + g) % 8
            r_hi = ((k + n_k) * gs + g) % 8
            s_lo = s_row(0, r_lo).astype(jnp.bfloat16)   # [1, bn]
            z_lo = z_row(0, r_lo).astype(jnp.bfloat16)
            s_hi = s_row(1, r_hi).astype(jnp.bfloat16)
            z_hi = z_row(1, r_hi).astype(jnp.bfloat16)
            w_lo = (lo[g * GROUP:(g + 1) * GROUP, :] - z_lo) * s_lo
            w_hi = (hi[g * GROUP:(g + 1) * GROUP, :] - z_hi) * s_hi
            xl = x_lo[:, g * GROUP:(g + 1) * GROUP].astype(jnp.bfloat16)
            xh = x_hi[:, g * GROUP:(g + 1) * GROUP].astype(jnp.bfloat16)
            acc = (acc
                   + jnp.dot(xl, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(xh, w_hi,
                             preferred_element_type=jnp.float32))
        acc_ref[:] = acc

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)
        return

    for g in range(gs):
        # Scale/zero 8-row tiles (f32 min sublane tile); ``s_row(which,
        # row)`` reads one row ref-side (pl.ds — value-level
        # dynamic_slice has no Mosaic lowering).  Row selects are
        # tile-local because gs | 8 (see _pick_gs).
        r_lo = (k * gs + g) % 8
        r_hi = ((k + n_k) * gs + g) % 8
        s_lo = s_row(0, r_lo)
        zs_lo = z_row(0, r_lo) * s_lo
        s_hi = s_row(1, r_hi)
        zs_hi = z_row(1, r_hi) * s_hi
        xl = x_lo[:, g * GROUP:(g + 1) * GROUP].astype(jnp.bfloat16)
        xh = x_hi[:, g * GROUP:(g + 1) * GROUP].astype(jnp.bfloat16)
        qlo = lo[g * GROUP:(g + 1) * GROUP, :]
        qhi = hi[g * GROUP:(g + 1) * GROUP, :]
        y_lo = jnp.dot(xl, qlo, preferred_element_type=jnp.float32)
        y_hi = jnp.dot(xh, qhi, preferred_element_type=jnp.float32)
        xs_lo = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        xs_hi = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + (y_lo * s_lo - xs_lo * zs_lo
                     + y_hi * s_hi - xs_hi * zs_hi)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _int4_body_packed(x_lo, x_hi, p, sz, o_ref, acc_ref, *,
                      n_k: int, gs: int, dequant_weights: bool = False):
    """Kernel body for the PackedInt4 form.  Identical math to
    _int4_body, but the scale/offset stream arrives as ONE bf16
    (32, bn) tile per k-step: rows [0, gs) = s_lo, [8, 8+gs) = zs_lo,
    [16, 16+gs) = s_hi, [24, 24+gs) = zs_hi — all statically indexed,
    single operand (a duplicated operand costs XLA a defensive
    whole-stack copy per call; see PackedInt4)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:]
    if dequant_weights:
        # Prefill factoring: dequantize the weight TILE once per k-step
        # (O(K·N), amortized over all M rows); w = q*s - zs in bf16.
        # Unpack PER GROUP: live lo/hi intermediates are [GROUP, bn]
        # instead of [bk, bn], an 8x VMEM saving that lets the packed
        # tile grow to (1024, 4096) — fully contiguous 4 MB DMA rows.
        for g in range(gs):
            pg = p[g * GROUP:(g + 1) * GROUP, :].astype(jnp.int32)
            lo = (pg & 0xF).astype(jnp.bfloat16)   # [GROUP, bn]
            hi = (pg >> 4).astype(jnp.bfloat16)
            s_lo = sz[g:g + 1, :]
            zs_lo = sz[8 + g:9 + g, :]
            s_hi = sz[16 + g:17 + g, :]
            zs_hi = sz[24 + g:25 + g, :]
            w_lo = lo * s_lo - zs_lo
            w_hi = hi * s_hi - zs_hi
            xl = x_lo[:, g * GROUP:(g + 1) * GROUP].astype(jnp.bfloat16)
            xh = x_hi[:, g * GROUP:(g + 1) * GROUP].astype(jnp.bfloat16)
            acc = (acc
                   + jnp.dot(xl, w_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(xh, w_hi,
                             preferred_element_type=jnp.float32))
        acc_ref[:] = acc

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)
        return

    # Decode factoring: MXU on raw nibbles, scale/offset on the [bm, bn]
    # partial sums — x @ (q*s - zs) = (x @ q)*s - (Σ_k x)*zs per group.
    # Per-group unpack, same VMEM rationale as above.
    for g in range(gs):
        pg = p[g * GROUP:(g + 1) * GROUP, :].astype(jnp.int32)
        qlo = (pg & 0xF).astype(jnp.bfloat16)      # [GROUP, bn]
        qhi = (pg >> 4).astype(jnp.bfloat16)
        s_lo = sz[g:g + 1, :].astype(jnp.float32)
        zs_lo = sz[8 + g:9 + g, :].astype(jnp.float32)
        s_hi = sz[16 + g:17 + g, :].astype(jnp.float32)
        zs_hi = sz[24 + g:25 + g, :].astype(jnp.float32)
        xl = x_lo[:, g * GROUP:(g + 1) * GROUP].astype(jnp.bfloat16)
        xh = x_hi[:, g * GROUP:(g + 1) * GROUP].astype(jnp.bfloat16)
        y_lo = jnp.dot(xl, qlo, preferred_element_type=jnp.float32)
        y_hi = jnp.dot(xh, qhi, preferred_element_type=jnp.float32)
        xs_lo = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        xs_hi = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + (y_lo * s_lo - xs_lo * zs_lo
                     + y_hi * s_hi - xs_hi * zs_hi)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _int4_kernel(x_lo_ref, x_hi_ref, qp_ref, s_lo_ref, z_lo_ref,
                 s_hi_ref, z_hi_ref, o_ref, acc_ref, *, n_k: int,
                 gs: int, dequant_weights: bool = False):
    def s_row(which, r):
        return (s_hi_ref if which else s_lo_ref)[pl.ds(r, 1), :]

    def z_row(which, r):
        return (z_hi_ref if which else z_lo_ref)[pl.ds(r, 1), :]

    _int4_body(x_lo_ref[:], x_hi_ref[:], qp_ref[:], s_row, z_row,
               o_ref, acc_ref, n_k=n_k, gs=gs,
               dequant_weights=dequant_weights)


def _pick_gs(n_groups_half: int) -> int:
    """Largest gs in {8, 4, 2, 1} with gs | 8 and gs | (K/2)/group —
    both row-tile locality of the scale selects and the k-grid need it."""
    for gs in (8, 4, 2, 1):
        if n_groups_half % gs == 0:
            return gs
    return 1


def _pick_tiles(n_groups_half: int, N: int, bm: int,
                group: int) -> tuple[int, int]:
    """(gs, bn) fitting the ~16 MB scoped-VMEM budget.

    Dominant residents: double-buffered packed tile (bk·bn), the
    unpacked lo/hi bf16 tiles (2·bk·bn·2), x tiles, f32 accumulator and
    double-buffered output.  Decode (bm=16) takes the largest tiles
    (bk=1024, bn=2048, ~13 MB — bigger DMAs are what buy the 4x
    bandwidth); prefill's larger bm shrinks bn/gs to stay under budget."""
    gs = _pick_gs(n_groups_half)
    bn = min(2048, N)
    budget = 13 * 1024 * 1024
    while True:
        bk = group * gs
        vmem = (2 * bk * bn          # packed, double-buffered
                + 4 * bk * bn        # lo + hi bf16
                + 4 * bm * bk * 2    # x lo/hi, double-buffered bf16
                + 4 * bm * bn        # f32 accumulator
                + 4 * bm * bn)       # output, double-buffered bf16
        if vmem <= budget or (gs == 1 and bn <= 256):
            return gs, bn
        if bn >= 1024:
            bn //= 2
        elif gs > 1:
            gs //= 2
        else:
            bn //= 2


@functools.partial(jax.jit, static_argnames=("group", "bn", "bm"))
def int4_matmul_pallas(x: jnp.ndarray, w4: QuantizedWeight4,
                       group: int = GROUP, bn: int = 2048,
                       bm: Optional[int] = None) -> jnp.ndarray:
    """y = x @ dequant(w4) without materializing the dense weight.

    x: [M, K] (bf16/f32), w4 packing as above.  K/2 must be a multiple of
    ``group`` (true for every transformer projection at group 128).
    """
    M, K = x.shape
    Kh, N = w4.qp.shape
    assert Kh * 2 == K, (K, Kh)
    assert Kh % group == 0, (Kh, group)
    assert w4.qp.dtype == jnp.uint8, w4.qp.dtype
    if bm is None:
        # bf16 outputs need >= 16 sublanes per tile.
        bm = min(_round_up(M, 16), 256)
    gs, bn_fit = _pick_tiles(Kh // group, N, bm, group)
    bk = group * gs
    bn = min(bn, bn_fit)
    n_m = pl.cdiv(M, bm)
    n_n = pl.cdiv(N, bn)
    n_k = Kh // bk

    grid = (n_m, n_n, n_k)
    kernel = functools.partial(_int4_kernel, n_k=n_k, gs=gs,
                               dequant_weights=bm >= 128)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # x_lo rows [0, K/2), x_hi rows [K/2, K): same array, two maps.
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda m, n, k, _h=n_k: (m, k + _h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            # scales/zeros as 8-row tiles; the kernel selects tile-local
            # rows (gs | 8 keeps each k-step inside one tile).
            pl.BlockSpec((8, bn), lambda m, n, k, _g=gs: (k * _g // 8, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn), lambda m, n, k, _g=gs: (k * _g // 8, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn),
                         lambda m, n, k, _h=n_k, _g=gs: (
                             (k + _h) * _g // 8, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn),
                         lambda m, n, k, _h=n_k, _g=gs: (
                             (k + _h) * _g // 8, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=Kh * N + M * K * 2 + M * N * 2,
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(x, x, w4.qp, w4.s, w4.z, w4.s, w4.z)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _pick_bn_packed(gs: int, N: int, bm: int, group: int,
                    bn0: int = 2048) -> int:
    """bn for the packed path — gs is baked into the sz layout, so only
    bn shrinks to fit the scoped-VMEM budget (same accounting as
    _pick_tiles plus the sz tiles, which are noise)."""
    bn = min(bn0, N)
    bk = group * gs
    # Decode (small bm): 13 MB keeps the measured-fastest double-
    # buffered tile set (bigger tiles LOSE ~3% decode — chip A/B).
    # Prefill (bm >= 128): 18 MB admits bn=2048, +7% prefill
    # throughput; the kernel raises the Mosaic scoped-vmem cap via
    # CompilerParams(vmem_limit_bytes=24MB) to make room.
    budget = (18 if bm >= 128 else 13) * 1024 * 1024
    while bn > 256:
        # Per-group unpack keeps lo/hi live at [GROUP, bn] (x2 halves,
        # x2 for scheduling slack) instead of [bk, bn].
        vmem = (2 * bk * bn + 8 * GROUP * bn * 2 + 4 * bm * bk * 2
                + 4 * bm * bn + 4 * bm * bn + 2 * 2 * 32 * bn * 2)
        if vmem <= budget:
            break
        bn //= 2
    return bn


def _int4_kernel_packed(x_lo_ref, x_hi_ref, qp_ref, sz_ref,
                        o_ref, acc_ref, *, n_k: int, gs: int,
                        dequant_weights: bool = False):
    _int4_body_packed(x_lo_ref[:], x_hi_ref[:], qp_ref[:], sz_ref[:],
                      o_ref, acc_ref, n_k=n_k, gs=gs,
                      dequant_weights=dequant_weights)


@functools.partial(jax.jit, static_argnames=("bn", "bm"))
def int4_matmul_packed(x: jnp.ndarray, p4: PackedInt4, bn: int = 4096,
                       bm: Optional[int] = None) -> jnp.ndarray:
    """y = x @ dequant(p4) — PackedInt4 form (bf16 sz stream)."""
    M, K = x.shape
    Kh, N = p4.qp.shape
    assert Kh * 2 == K, (K, Kh)
    assert p4.qp.dtype == jnp.uint8, p4.qp.dtype
    gs = packed_gs(p4)
    if bm is None:
        # Decode (M tiny): 8-row tiles halve the MXU padding waste of a
        # 16-row tile; the f32 accumulator tile is legal at 8 sublanes
        # and Mosaic handles the 8-row bf16 output block.
        bm = min(_round_up(M, 8), 256)
    bn = _pick_bn_packed(gs, N, bm, GROUP, bn0=bn)
    bk = GROUP * gs
    n_k = Kh // bk
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), n_k)
    kernel = functools.partial(_int4_kernel_packed, n_k=n_k, gs=gs,
                               dequant_weights=bm >= 128)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda m, n, k, _h=n_k: (m, k + _h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            # One 32-row sz tile per k-step (both halves), statically
            # indexed — single operand by design (see PackedInt4).
            pl.BlockSpec((32, bn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=Kh * N + M * K * 2 + M * N * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, x, p4.qp, p4.sz)


def _int4_kernel_packed_stacked(li_ref, x_lo_ref, x_hi_ref, qp_ref,
                                sz_ref, o_ref, acc_ref, *,
                                n_k: int, gs: int,
                                dequant_weights: bool = False):
    _int4_body_packed(x_lo_ref[:], x_hi_ref[:], qp_ref[0], sz_ref[0],
                      o_ref, acc_ref, n_k=n_k, gs=gs,
                      dequant_weights=dequant_weights)


@functools.partial(jax.jit, static_argnames=("bn", "bm"))
def int4_matmul_stacked_packed(x: jnp.ndarray, p4: PackedInt4, layer,
                               bn: int = 4096,
                               bm: Optional[int] = None) -> jnp.ndarray:
    """Layer-stacked PackedInt4 matmul (scalar-prefetch layer index, same
    zero-copy contract as int4_matmul_stacked)."""
    M, K = x.shape
    L, Kh, N = p4.qp.shape
    assert Kh * 2 == K, (K, Kh)
    assert p4.qp.dtype == jnp.uint8, p4.qp.dtype
    gs = packed_gs(p4)
    if bm is None:
        # Decode (M tiny): 8-row tiles halve the MXU padding waste of a
        # 16-row tile; the f32 accumulator tile is legal at 8 sublanes
        # and Mosaic handles the 8-row bf16 output block.
        bm = min(_round_up(M, 8), 256)
    bn = _pick_bn_packed(gs, N, bm, GROUP, bn0=bn)
    bk = GROUP * gs
    n_k = Kh // bk
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), n_k)
    kernel = functools.partial(_int4_kernel_packed_stacked, n_k=n_k,
                               gs=gs, dequant_weights=bm >= 128)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k, li: (m, k)),
            pl.BlockSpec((bm, bk),
                         lambda m, n, k, li, _h=n_k: (m, k + _h)),
            pl.BlockSpec((1, bk, bn),
                         lambda m, n, k, li: (li[0], k, n)),
            pl.BlockSpec((1, 32, bn),
                         lambda m, n, k, li: (li[0], k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, li: (m, n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=Kh * N + M * K * 2 + M * N * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(li, x, x, p4.qp, p4.sz)


def _int4_kernel_stacked(li_ref, x_lo_ref, x_hi_ref, qp_ref, s_lo_ref,
                         z_lo_ref, s_hi_ref, z_hi_ref, o_ref, acc_ref, *,
                         n_k: int, gs: int, dequant_weights: bool = False):
    # Same bodies as _int4_kernel; the layer index only steers the DMAs
    # (consumed by the BlockSpec index maps).
    def s_row(which, r):
        return (s_hi_ref if which else s_lo_ref)[0, pl.ds(r, 1), :]

    def z_row(which, r):
        return (z_hi_ref if which else z_lo_ref)[0, pl.ds(r, 1), :]

    _int4_body(x_lo_ref[:], x_hi_ref[:], qp_ref[0], s_row, z_row,
               o_ref, acc_ref, n_k=n_k, gs=gs,
               dequant_weights=dequant_weights)


@functools.partial(jax.jit, static_argnames=("group", "bn", "bm"))
def int4_matmul_stacked(x: jnp.ndarray, w4: QuantizedWeight4,
                        layer, group: int = GROUP, bn: int = 2048,
                        bm: Optional[int] = None) -> jnp.ndarray:
    """y = x @ dequant(w4[layer]) with layer-stacked packed weights.

    w4 leaves carry a leading layer axis (qp [L, K/2, N]); ``layer`` is a
    traced scalar consumed via scalar prefetch, so a lax.scan over layers
    passes the WHOLE stack by reference every iteration — XLA never
    materializes a per-layer copy of the weights, which it would for a
    dynamic-slice feeding a custom call (measured 123 GB/s effective for
    the slice-copy; it halves decode throughput).
    """
    M, K = x.shape
    L, Kh, N = w4.qp.shape
    assert Kh * 2 == K and Kh % group == 0, (K, Kh, group)
    assert w4.qp.dtype == jnp.uint8, w4.qp.dtype
    if bm is None:
        bm = min(_round_up(M, 16), 256)
    gs, bn_fit = _pick_tiles(Kh // group, N, bm, group)
    bk = group * gs
    bn = min(bn, bn_fit)
    n_k = Kh // bk
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), n_k)
    kernel = functools.partial(_int4_kernel_stacked, n_k=n_k, gs=gs,
                               dequant_weights=bm >= 128)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # index maps receive (grid indices..., scalar-prefetch refs).
            pl.BlockSpec((bm, bk), lambda m, n, k, li: (m, k)),
            pl.BlockSpec((bm, bk),
                         lambda m, n, k, li, _h=n_k: (m, k + _h)),
            pl.BlockSpec((1, bk, bn),
                         lambda m, n, k, li: (li[0], k, n)),
            pl.BlockSpec((1, 8, bn),
                         lambda m, n, k, li, _g=gs: (li[0], k * _g // 8,
                                                     n)),
            pl.BlockSpec((1, 8, bn),
                         lambda m, n, k, li, _g=gs: (li[0], k * _g // 8,
                                                     n)),
            pl.BlockSpec((1, 8, bn),
                         lambda m, n, k, li, _h=n_k, _g=gs: (
                             li[0], (k + _h) * _g // 8, n)),
            pl.BlockSpec((1, 8, bn),
                         lambda m, n, k, li, _h=n_k, _g=gs: (
                             li[0], (k + _h) * _g // 8, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, li: (m, n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=Kh * N + M * K * 2 + M * N * 2,
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(li, x, x, w4.qp, w4.s, w4.z, w4.s, w4.z)


class StackedInt4View:
    """Lazy per-layer view over layer-stacked QuantizedWeight4 leaves:
    holds the full stack plus a traced layer index so ops.quant.matmul can
    route to int4_matmul_stacked (zero-copy inside lax.scan)."""

    __slots__ = ("w4", "layer")

    def __init__(self, w4: QuantizedWeight4, layer):
        self.w4 = w4
        self.layer = layer


def int4_matmul(x: jnp.ndarray, w4) -> jnp.ndarray:
    """Dispatcher used by ops.quant.matmul: Pallas kernel when shapes are
    tile-friendly, jnp oracle otherwise (tiny test models).  Accepts
    QuantizedWeight4 or PackedInt4 (pack_int4_scales only produces the
    latter for kernel-eligible shapes, so PackedInt4 always hits the
    kernel on TPU)."""
    orig_shape = x.shape
    if x.ndim > 2:
        x = x.reshape(-1, x.shape[-1])
    M, K = x.shape
    N = w4.qp.shape[1]
    if isinstance(w4, PackedInt4):
        y = int4_matmul_packed(x, w4)
    else:
        group = group_of(w4)
        if group != GROUP or K // 2 % GROUP or N % 128:
            y = int4_matmul_ref(x, w4, group)
        else:
            y = int4_matmul_pallas(x, w4, group)
    return y.reshape(*orig_shape[:-1], N)


def int4_matmul_view(x: jnp.ndarray, view: StackedInt4View) -> jnp.ndarray:
    """matmul against one layer of a stacked int4 weight: scalar-prefetch
    kernel when tile-friendly, per-layer slice + oracle otherwise."""
    w4 = view.w4
    L, Kh, N = w4.qp.shape
    orig_shape = x.shape
    if x.ndim > 2:
        x = x.reshape(-1, x.shape[-1])
    if isinstance(w4, PackedInt4):
        y = int4_matmul_stacked_packed(x, w4, view.layer)
    else:
        group = 2 * Kh // w4.s.shape[-2]
        if group == GROUP and Kh % GROUP == 0 and N % 128 == 0:
            y = int4_matmul_stacked(x, w4, view.layer)
        else:
            sliced = QuantizedWeight4(
                qp=jax.lax.dynamic_index_in_dim(w4.qp, view.layer, 0,
                                                False),
                s=jax.lax.dynamic_index_in_dim(w4.s, view.layer, 0, False),
                z=jax.lax.dynamic_index_in_dim(w4.z, view.layer, 0, False))
            y = int4_matmul(x, sliced)
    return y.reshape(*orig_shape[:-1], N)
