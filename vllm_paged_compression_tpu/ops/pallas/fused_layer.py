"""Fused decode-layer megakernel: o_proj + residual + RMSNorm + gated
MLP + residual + RMSNorm + NEXT layer's qkv projection, in ONE Pallas
program per transformer layer.

Why (PROFILE_r04): the decode step is weight-bandwidth-bound, and the
per-matmul Pallas invocations leave ~1.5 ms/token on the table — the
small kernels (qkv 553 GB/s, o_proj 527 GB/s vs gate_up/lm_head at
638-657) pay pipeline fill/drain and inter-op gaps per call, and the
XLA glue fusions between them (norms, residual adds, silu·mul) add
~0.2 ms/token of tiny-op device time.  Tile retuning cannot fix this
(the r4 gs-halving A/B lost 0.8%); op fusion can.  This kernel streams
ALL FOUR weight matrices of a layer through one manually double-buffered
DMA pipeline — fill/drain happens once per LAYER, not once per matmul —
and performs every inter-matmul elementwise op (residual adds, both
rms norms, silu·mul gating) on the VPU between DMA waits.

The layer boundary is shifted by half a layer: kernel(i) consumes the
ATTENTION OUTPUT of layer i and produces the PRE-ROPE qkv of layer
i+1, so the only XLA ops between consecutive kernels are rope and the
fused write+attend kernel (ops/pallas/fused_decode.py).  The last
layer's qkv output is computed against a clamped layer index and
discarded (0.4% wasted stream, accepted).

Dequantization math is bit-identical to the PackedInt4 decode factoring
in int4_matmul._int4_body_packed: the MXU multiplies raw 4-bit values,
scale/offset apply to the [m, bn] partial sums per 128-row group.

Residual adds run in f32 *within* the kernel (the unfused path
round-trips bf16 between XLA ops); the hidden state crosses the kernel
boundary as bf16, exactly like the unfused layer scan.

Reference analog being beaten (not translated): the reference runs
these as separate marlin GEMMs + torch eps ops per layer
(csrc/quantization/gptq_marlin/, vllm/model_executor/layers/layernorm.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int4_matmul import GROUP, PackedInt4, dequantize_packed, packed_gs


class FusedLayerDims(NamedTuple):
    d: int          # hidden size
    f: int          # intermediate size
    nq: int         # qkv output width = (H + 2*Hkv) * head_dim
    gs: int         # groups per k-step (uniform across the 4 weights)
    bn: int         # output tile width (uniform)
    m: int          # padded row count (M rounded up to 8)


BN_MAX = 2048


def _phase_bn(n_out: int) -> int:
    """Per-phase output-tile width: the largest divisor of ``n_out`` that
    is <= BN_MAX and a multiple of 128 (wider tiles = longer DMA rows and
    fewer pipeline roundtrips; the buffers are sized to the max)."""
    for bn in range(min(BN_MAX, n_out), 127, -128):
        if n_out % bn == 0:
            return bn
    return 0


def _pick_bn(d: int, nq: int, f2: int) -> int:
    """Smallest per-phase tile width (used for the eligibility gate /
    dims bookkeeping; individual phases may use wider tiles)."""
    return min(_phase_bn(d), _phase_bn(nq), _phase_bn(f2))


def fused_layer_eligible(wqkv, wo, wgu, wd, d: int, f: int, nq: int,
                         m: int) -> bool:
    """Static shape/type gate for the megakernel fast path."""
    ws = (wqkv, wo, wgu, wd)
    if not all(isinstance(w, PackedInt4) for w in ws):
        return False
    if m > 32:
        # Single M-tile design: the f32 full-row scratches (ygu is
        # m x 2F) outgrow VMEM past 32 rows; larger decode batches take
        # the per-matmul kernels (whose weight streams amortize over
        # the batch anyway).
        return False
    gs = {packed_gs(w) for w in ws}
    if len(gs) != 1:
        return False
    gs = gs.pop()
    bk = GROUP * gs
    if (d // 2) % bk or (f // 2) % bk:
        return False
    bn = _pick_bn(d, nq, 2 * f)
    if bn % 128 or d % bn or nq % bn or (2 * f) % bn:
        return False
    # Leading axis is the layer stack.
    return all(w.qp.ndim == 3 for w in ws)


def _dims(wqkv, wo, wgu, wd, m: int) -> FusedLayerDims:
    d = wo.qp.shape[-1]
    f = wd.qp.shape[-2] * 2
    nq = wqkv.qp.shape[-1]
    gs = packed_gs(wo)
    bn = _pick_bn(d, nq, 2 * f)
    return FusedLayerDims(d=d, f=f, nq=nq, gs=gs, bn=bn, m=m)


def _group_matvec(acc, xl, xh, pg_tile, sz_tile, g: int, gs: int):
    """One 128-row group of the decode dequant factoring (identical math
    to int4_matmul._int4_body_packed): MXU on raw nibbles, scale/offset
    absorbed into the [m, bn] partial sums."""
    pg = pg_tile.astype(jnp.int32)
    qlo = (pg & 0xF).astype(jnp.bfloat16)
    qhi = (pg >> 4).astype(jnp.bfloat16)
    s_lo = sz_tile[g:g + 1, :].astype(jnp.float32)
    zs_lo = sz_tile[8 + g:9 + g, :].astype(jnp.float32)
    s_hi = sz_tile[16 + g:17 + g, :].astype(jnp.float32)
    zs_hi = sz_tile[24 + g:25 + g, :].astype(jnp.float32)
    y_lo = jnp.dot(xl, qlo, preferred_element_type=jnp.float32)
    y_hi = jnp.dot(xh, qhi, preferred_element_type=jnp.float32)
    xs_lo = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
    xs_hi = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
    return acc + (y_lo * s_lo - xs_lo * zs_lo
                  + y_hi * s_hi - xs_hi * zs_hi)


def _fused_layer_kernel(layer_ref,
                        attn2d_ref, h_in_ref, norms_ref,
                        qp_o, sz_o, qp_gu, sz_gu, qp_d, sz_d,
                        qp_q, sz_q,
                        h_out_ref, qkv_ref,
                        wbuf, szbuf, hmid, hout, ygu, act, x2, x3,
                        acc_ref, dsem, *,
                        dims: FusedLayerDims, n_layers: int, eps: float,
                        act_kind: str):
    m = dims.m
    d, f, nq, gs = dims.d, dims.f, dims.nq, dims.gs
    bk = GROUP * gs
    lay = layer_ref[0]
    lay_next = jnp.minimum(lay + 1, n_layers - 1)

    # Static tile schedule across all four phases: (phase, qp, sz, layer
    # index, n, k, n_k, bn).  One flat python list — double-buffered DMA
    # with fill/drain once per LAYER.  Tile width is per-phase (the
    # widest divisor <= BN_MAX): longer DMA rows, fewer roundtrips.
    tiles = []
    for ph, qp, sz, li, kh, n_out in (
            ("o", qp_o, sz_o, lay, d // 2, d),
            ("gu", qp_gu, sz_gu, lay, d // 2, 2 * f),
            ("d", qp_d, sz_d, lay, f // 2, d),
            ("q", qp_q, sz_q, lay_next, d // 2, nq)):
        n_k = kh // bk
        bnp = _phase_bn(n_out)
        for n in range(n_out // bnp):
            for k in range(n_k):
                tiles.append((ph, qp, sz, li, n, k, n_k, bnp))

    def tile_copies(i, slot):
        ph, qp, sz, li, n, k, n_k, bnp = tiles[i]
        return [
            pltpu.make_async_copy(
                qp.at[li, pl.ds(k * bk, bk), pl.ds(n * bnp, bnp)],
                wbuf.at[slot, :, pl.ds(0, bnp)], dsem.at[slot, 0]),
            pltpu.make_async_copy(
                sz.at[li, pl.ds(k * 32, 32), pl.ds(n * bnp, bnp)],
                szbuf.at[slot, :, pl.ds(0, bnp)], dsem.at[slot, 1]),
        ]

    def x_tiles(ph, k):
        """bf16 [m, bk] lo/hi activation tiles for phase ``ph``, k-step
        ``k`` (all offsets static — python-unrolled schedule)."""
        if ph == "o":
            src, kh = attn2d_ref, d // 2
            xl = src[:, k * bk:(k + 1) * bk]
            xh = src[:, kh + k * bk:kh + (k + 1) * bk]
        elif ph == "gu":
            kh = d // 2
            xl = x2[:, k * bk:(k + 1) * bk]
            xh = x2[:, kh + k * bk:kh + (k + 1) * bk]
        elif ph == "d":
            kh = f // 2
            xl = act[:, k * bk:(k + 1) * bk]
            xh = act[:, kh + k * bk:kh + (k + 1) * bk]
        else:
            kh = d // 2
            xl = x3[:, k * bk:(k + 1) * bk]
            xh = x3[:, kh + k * bk:kh + (k + 1) * bk]
        return xl.astype(jnp.bfloat16), xh.astype(jnp.bfloat16)

    def rms_rows(buf):
        """rsqrt(mean(row^2) + eps) over the f32 [m, D] scratch."""
        ssq = jnp.sum(buf[:, :] * buf[:, :], axis=1, keepdims=True)
        return jax.lax.rsqrt(ssq / d + eps)

    def epilogue(ph, n, bnp):
        """Runs after the LAST k-step of (phase, n) with acc_ref holding
        the finished [m, bnp] output tile."""
        sl = slice(n * bnp, (n + 1) * bnp)
        if ph == "o":
            hmid[:, sl] = (acc_ref[:, :bnp]
                           + h_in_ref[:, sl].astype(jnp.float32))
            if (n + 1) * bnp == d:
                rs = rms_rows(hmid)
                wn = norms_ref[0, 0:1, :].astype(jnp.bfloat16)   # [1, D]
                x2[:, :] = (hmid[:, :] * rs).astype(jnp.bfloat16) * wn
        elif ph == "gu":
            ygu[:, sl] = acc_ref[:, :bnp]
            if (n + 1) * bnp == 2 * f:
                gate = ygu[:, :f]
                up = ygu[:, f:]
                if act_kind == "silu":
                    gated = gate * jax.nn.sigmoid(gate) * up
                else:                       # gelu (tanh approximation)
                    gated = jax.nn.gelu(gate) * up
                act[:, :] = gated.astype(jnp.bfloat16)
        elif ph == "d":
            hout[:, sl] = acc_ref[:, :bnp] + hmid[:, sl]
            h_out_ref[:, sl] = hout[:, sl].astype(jnp.bfloat16)
            if (n + 1) * bnp == d:
                rs = rms_rows(hout)
                wn = norms_ref[0, 1:2, :].astype(jnp.bfloat16)   # [1, D]
                x3[:, :] = (hout[:, :] * rs).astype(jnp.bfloat16) * wn
        else:
            qkv_ref[:, sl] = acc_ref[:, :bnp].astype(jnp.bfloat16)

    nslots = wbuf.shape[0]
    for j in range(min(nslots - 1, len(tiles))):
        for c in tile_copies(j, j % nslots):
            c.start()
    for i, (ph, qp, sz, li, n, k, n_k, bnp) in enumerate(tiles):
        slot = i % nslots
        if i + nslots - 1 < len(tiles):
            for c in tile_copies(i + nslots - 1,
                                 (i + nslots - 1) % nslots):
                c.start()
        for c in tile_copies(i, slot):
            c.wait()
        xl_full, xh_full = x_tiles(ph, k)
        acc = (jnp.zeros((m, bnp), jnp.float32) if k == 0
               else acc_ref[:, :bnp])
        for g in range(gs):
            acc = _group_matvec(
                acc,
                xl_full[:, g * GROUP:(g + 1) * GROUP],
                xh_full[:, g * GROUP:(g + 1) * GROUP],
                wbuf[slot, g * GROUP:(g + 1) * GROUP, :bnp],
                szbuf[slot][:, :bnp], g, gs)
        acc_ref[:, :bnp] = acc
        if k == n_k - 1:
            epilogue(ph, n, bnp)


@functools.partial(jax.jit, static_argnames=("eps", "act_kind",))
def fused_decode_layer(attn2d: jnp.ndarray, h_in: jnp.ndarray,
                       wo: PackedInt4, wgu: PackedInt4, wd: PackedInt4,
                       wqkv: PackedInt4, norms: jnp.ndarray, layer,
                       *, eps: float, act_kind: str = "silu"):
    """One fused decode layer tail + next-layer head.

    attn2d: [M, D]  bf16 attention output of layer ``layer`` (flattened)
    h_in:   [M, D]  residual stream entering layer ``layer``
    wo/wgu/wd/wqkv: layer-stacked PackedInt4 ([L, Kh, N])
    norms:  [L, 8, D] bf16 — row 0 = post_attention_norm(l), row 1 =
            input_norm(l+1) (rolled; garbage at l = L-1 is harmless —
            that qkv output is discarded)
    layer:  traced scalar layer index

    Returns (h_out [M, D] bf16, qkv_next [M, Nq] bf16 pre-rope).
    """
    mm, d_in = attn2d.shape
    m = max(8, -(-mm // 8) * 8)
    assert m <= 32, m
    if m != mm:
        attn2d = jnp.pad(attn2d, ((0, m - mm), (0, 0)))
        h_in = jnp.pad(h_in, ((0, m - mm), (0, 0)))
    dims = _dims(wqkv, wo, wgu, wd, m)
    assert d_in == dims.d, (d_in, dims.d)
    n_layers = wo.qp.shape[0]
    bk = GROUP * dims.gs
    bn_buf = max(_phase_bn(dims.d), _phase_bn(dims.nq),
                 _phase_bn(2 * dims.f))
    li = jnp.asarray(layer, jnp.int32).reshape(1)

    def io_map(*refs):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((m, dims.d), io_map),             # attn2d
            pl.BlockSpec((m, dims.d), io_map),             # h_in
            pl.BlockSpec((1, 8, dims.d),
                         lambda _, li_: (li_[0], 0, 0)),   # norms
            pl.BlockSpec(memory_space=pl.ANY),             # wo.qp
            pl.BlockSpec(memory_space=pl.ANY),             # wo.sz
            pl.BlockSpec(memory_space=pl.ANY),             # wgu.qp
            pl.BlockSpec(memory_space=pl.ANY),             # wgu.sz
            pl.BlockSpec(memory_space=pl.ANY),             # wd.qp
            pl.BlockSpec(memory_space=pl.ANY),             # wd.sz
            pl.BlockSpec(memory_space=pl.ANY),             # wqkv.qp
            pl.BlockSpec(memory_space=pl.ANY),             # wqkv.sz
        ],
        out_specs=[
            pl.BlockSpec((m, dims.d), io_map),             # h_out
            pl.BlockSpec((m, dims.nq), io_map),            # qkv_next
        ],
        scratch_shapes=[
            pltpu.VMEM((3, bk, bn_buf), jnp.uint8),        # packed tile
            pltpu.VMEM((3, 32, bn_buf), jnp.bfloat16),     # sz tile
            pltpu.VMEM((m, dims.d), jnp.float32),          # hmid
            pltpu.VMEM((m, dims.d), jnp.float32),          # hout
            pltpu.VMEM((m, 2 * dims.f), jnp.float32),      # ygu
            pltpu.VMEM((m, dims.f), jnp.bfloat16),         # act
            pltpu.VMEM((m, dims.d), jnp.bfloat16),         # x2
            pltpu.VMEM((m, dims.d), jnp.bfloat16),         # x3
            pltpu.VMEM((m, bn_buf), jnp.float32),          # acc
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
    )
    kern = functools.partial(_fused_layer_kernel, dims=dims,
                             n_layers=n_layers, eps=eps, act_kind=act_kind)
    total_k = (wo.qp.shape[1] + wgu.qp.shape[1] + wd.qp.shape[1]
               + wqkv.qp.shape[1])
    bytes_w = (wo.qp.shape[1] * dims.d + wgu.qp.shape[1] * 2 * dims.f
               + wd.qp.shape[1] * dims.d + wqkv.qp.shape[1] * dims.nq)
    h_out, qkv = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, dims.d), jnp.bfloat16),
            jax.ShapeDtypeStruct((m, dims.nq), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * 2 * total_k * bn_buf,   # rough
            bytes_accessed=bytes_w + bytes_w // 8,
            transcendentals=m * (dims.f + 2)),
        interpret=jax.default_backend() == "cpu",
    )(li, attn2d, h_in, norms, wo.qp, wo.sz, wgu.qp, wgu.sz,
      wd.qp, wd.sz, wqkv.qp, wqkv.sz)
    return h_out[:mm], qkv[:mm]


def fused_decode_layer_ref(attn2d, h_in, wo, wgu, wd, wqkv, norms, layer,
                           *, eps: float, act_kind: str = "silu"):
    """jnp oracle mirroring the kernel's numerics exactly: PackedInt4
    dequant via dequantize_packed (bf16 s/zs), bf16 matmul operands with
    f32 accumulation, f32 residuals inside the layer, bf16 hidden at the
    boundary, and the kernel's norm order (normalize in f32, cast to
    bf16, THEN apply the bf16 norm weight)."""
    n_layers = wo.qp.shape[0]
    lay = jnp.asarray(layer, jnp.int32)
    lay_next = jnp.minimum(lay + 1, n_layers - 1)

    def mm(x, p4, li):
        w = dequantize_packed(jax.tree.map(lambda a: a[li], p4),
                              jnp.bfloat16)
        return jnp.dot(x.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32)

    d = h_in.shape[-1]

    def norm_to(buf_f32, wn):
        rs = jax.lax.rsqrt(
            jnp.sum(buf_f32 * buf_f32, axis=-1, keepdims=True) / d + eps)
        return (buf_f32 * rs).astype(jnp.bfloat16) * wn.astype(jnp.bfloat16)

    hmid = mm(attn2d, wo, lay) + h_in.astype(jnp.float32)
    x2 = norm_to(hmid, norms[lay, 0])
    ygu = mm(x2, wgu, lay)
    f = ygu.shape[-1] // 2
    gate, up = ygu[:, :f], ygu[:, f:]
    if act_kind == "silu":
        gated = gate * jax.nn.sigmoid(gate) * up
    else:
        gated = jax.nn.gelu(gate) * up
    act = gated.astype(jnp.bfloat16)
    hout = mm(act, wd, lay) + hmid
    x3 = norm_to(hout, norms[lay, 1])
    qkv = mm(x3, wqkv, lay_next)
    return hout.astype(jnp.bfloat16), qkv.astype(jnp.bfloat16)
