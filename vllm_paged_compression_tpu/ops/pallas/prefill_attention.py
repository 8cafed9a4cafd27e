"""Pallas TPU flash prefill attention.

TPU-native replacement for the reference's prefill path — a host loop of
per-sequence torch.sdpa calls (torch_cuda_sdpa.py:1069-1127) that
materializes full [T, S] score matrices.  Here: classic flash/online-
softmax blocking, so HBM traffic is O(T·d) and an 8k-token prompt needs
no [8k, 8k] intermediate (the jnp oracle would need ~6.4 GB per layer
for one).

One kernel covers both reference prefill semantics:
- plain causal prefill (kept_len == q_len), and
- evict-then-attend "pruned" prefill (queries = all prompt tokens, keys =
  the kept subset) with torch-sdpa ``is_causal`` *top-left aligned*
  masking — query i attends kept key j iff j <= i (and j < kept_len)
  (torch_cuda_sdpa.py:1118-1125).

Layout: heads-major [H, T, d] so each grid step's block is a well-tiled
[block, d] slab (the [T, H, d] model layout would make Mosaic tile a
(1, d) slab per row).  The wrapper transposes in/out; XLA fuses those
into the surrounding projections.

Grid = (H, T/Bq, S/Bk), KV axis innermost and sequential; m/l/acc
persist in VMEM scratch across KV blocks.  Fully-masked causal blocks
(ik·Bk > iq·Bq + Bq - 1) skip their compute.  q_len/kept_len arrive as
scalar prefetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -2.0**30


def _prefill_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref,
                    m_ref, l_ref, acc_ref, *, scale: float, bq: int,
                    bk: int, softcap, ctx_cap: int = 0):
    """``ctx_cap`` > 0 = chunked/context mode: the first ctx_cap KV columns
    are previously-cached context (valid iff col < lens[2] = ctx_len, no
    causal constraint); the rest are the chunk itself, causal vs the
    chunk-local query row."""
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)
    kept_len = lens_ref[1]
    ctx_len = lens_ref[2]
    # lens[3] > 0 = sliding window: query row i attends key j iff
    # i - j < window (plain causal mode only; never combined with pruned
    # or context modes — the runner rejects those pairings).
    win = lens_ref[3]
    winf = jnp.where(win > 0, win, jnp.int32(2**30))

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # A context block contributes while it holds real context rows; a chunk
    # block only if its first column is <= the last query row of this Q
    # block (top-left-aligned causal) AND its last column is inside the
    # first query row's window.
    is_ctx_block = ik * bk < ctx_cap
    contributes = jnp.where(
        is_ctx_block, ik * bk < ctx_len,
        (ik * bk - ctx_cap <= iq * bq + bq - 1)
        & (ik * bk - ctx_cap < kept_len)
        & (ik * bk - ctx_cap + bk - 1 > iq * bq - winf))

    @pl.when(contributes)
    def _():
        # Matmuls run in the INPUT dtype with fp32 accumulation: bf16
        # inputs hit the MXU's full rate (fp32 operands run ~8x slower);
        # fp32 test inputs stay exact vs the jnp oracle.
        q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)              # [Bq, d]
        k = k_ref[0]                                        # [Bk, d]
        v = v_ref[0]
        s = jax.lax.dot_general(                            # [Bq, Bk]
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        row = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        col = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if ctx_cap:
            local = col - ctx_cap
            # Boolean algebra, not jnp.where: Mosaic fails to legalize
            # select_n over i1 vectors on real TPU (caught by the
            # real-device run of the kernel suite).
            is_ctx = col < ctx_cap
            mask = ((is_ctx & (col < ctx_len))
                    | (~is_ctx & (local <= row) & (local < kept_len)))
        else:
            mask = (col <= row) & (col < kept_len) & (col > row - winf)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:, :] = acc_ref[:, :] * alpha + pv
        m_ref[:, :] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:, :] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == n_k - 1)
    def _():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:, :]
                    / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("scale", "softcap"))
def flash_prefill_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            scale: float, q_len, kept_len,
                            softcap: float | None = None,
                            window=None) -> jnp.ndarray:
    """Flash version of ops.attention.pruned_prefill_attention (and, with
    kept_len == q_len, of prefill_attention).

    q: [T, H, d]; k/v: [S, Hkv, d]; returns [T, H, d] (garbage rows at
    positions >= q_len, like the oracles).

    ``window``: optional traced int32 sliding window (row i attends cols
    (i - window, i]); 0/None = full causal.  Only valid in plain mode
    (kept_len == q_len) — the engine never combines sliding windows with
    prompt pruning.
    """
    t, h, d = q.shape
    s, num_kv, _ = k.shape
    group = h // num_kv
    # 512-wide blocks: the per-grid-step overhead (~1 us) dominated the
    # old 128x128 tiling — 24 heads x 8 x 8 = 1536 steps cost ~1.9 ms for
    # a 1024-token prompt vs ~65 us of MXU math.
    bq = min(512, _round_up(t, 128))
    bk = min(512, _round_up(s, 128))
    t_pad = _round_up(t, bq)
    s_pad = _round_up(s, bk)

    qt = jnp.swapaxes(q, 0, 1)                       # [H, T, d]
    kt = jnp.swapaxes(k, 0, 1)
    vt = jnp.swapaxes(v, 0, 1)
    if t_pad != t:
        qt = jnp.pad(qt, ((0, 0), (0, t_pad - t), (0, 0)))
    if s_pad != s:
        kt = jnp.pad(kt, ((0, 0), (0, s_pad - s), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, s_pad - s), (0, 0)))
    lens = jnp.stack([jnp.asarray(q_len, jnp.int32),
                      jnp.asarray(kept_len, jnp.int32),
                      jnp.int32(0),
                      (jnp.int32(0) if window is None
                       else jnp.asarray(window, jnp.int32))])

    def q_map(ih, iq, ik, lens_):
        return (ih, iq, 0)

    def kv_map(ih, iq, ik, lens_):
        return (ih // group, ik, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h, t_pad // bq, s_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), q_map),
            pl.BlockSpec((1, bk, d), kv_map),
            pl.BlockSpec((1, bk, d), kv_map),
        ],
        out_specs=pl.BlockSpec((1, bq, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_prefill_kernel, scale=scale, bq=bq, bk=bk,
                               softcap=softcap)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, t_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * h * t_pad * s_pad * d,
            bytes_accessed=(qt.nbytes + kt.nbytes + vt.nbytes + qt.nbytes),
            transcendentals=h * t_pad * s_pad),
        interpret=jax.default_backend() == "cpu",
    )(lens, qt, kt, vt)
    return jnp.swapaxes(out[:, :t], 0, 1)


@functools.partial(jax.jit, static_argnames=("scale", "softcap"))
def flash_context_prefill_attention(q: jnp.ndarray, k_ctx: jnp.ndarray,
                                    v_ctx: jnp.ndarray,
                                    k_chunk: jnp.ndarray,
                                    v_chunk: jnp.ndarray, scale: float,
                                    q_len, ctx_len,
                                    softcap: float | None = None
                                    ) -> jnp.ndarray:
    """Flash version of ops.attention.context_prefill_attention (chunked
    prefill / prefix-cache skip): chunk queries vs [context | chunk] keys.

    q/k_chunk/v_chunk: [Tc, ·, d]; k/v_ctx: [C, Hkv, d] (rows >= ctx_len
    are padding).  The KV axis is the concatenation, context first; the
    kernel masks context columns by ctx_len and chunk columns causally.
    """
    tc, h, d = q.shape
    c = k_ctx.shape[0]
    num_kv = k_ctx.shape[1]
    group = h // num_kv
    bq = min(512, _round_up(tc, 128))
    bk = min(512, _round_up(c + tc, 128))
    t_pad = _round_up(tc, bq)
    ctx_pad = _round_up(c, bk)
    s_pad = ctx_pad + _round_up(tc, bk)

    qt = jnp.swapaxes(q, 0, 1)
    if t_pad != tc:
        qt = jnp.pad(qt, ((0, 0), (0, t_pad - tc), (0, 0)))

    def pad_to(x, n):
        return x if x.shape[0] == n else jnp.pad(
            x, ((0, n - x.shape[0]), (0, 0), (0, 0)))

    kt = jnp.swapaxes(jnp.concatenate(
        [pad_to(k_ctx, ctx_pad), pad_to(k_chunk, s_pad - ctx_pad)]), 0, 1)
    vt = jnp.swapaxes(jnp.concatenate(
        [pad_to(v_ctx, ctx_pad), pad_to(v_chunk, s_pad - ctx_pad)]), 0, 1)
    lens = jnp.stack([jnp.asarray(q_len, jnp.int32),
                      jnp.asarray(q_len, jnp.int32),
                      jnp.asarray(ctx_len, jnp.int32),
                      jnp.int32(0)])

    def q_map(ih, iq, ik, lens_):
        return (ih, iq, 0)

    def kv_map(ih, iq, ik, lens_):
        return (ih // group, ik, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h, t_pad // bq, s_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), q_map),
            pl.BlockSpec((1, bk, d), kv_map),
            pl.BlockSpec((1, bk, d), kv_map),
        ],
        out_specs=pl.BlockSpec((1, bq, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_prefill_kernel, scale=scale, bq=bq, bk=bk,
                               softcap=softcap, ctx_cap=ctx_pad)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, t_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * h * t_pad * s_pad * d,
            bytes_accessed=(qt.nbytes + kt.nbytes + vt.nbytes + qt.nbytes),
            transcendentals=h * t_pad * s_pad),
        interpret=jax.default_backend() == "cpu",
    )(lens, qt, kt, vt)
    return jnp.swapaxes(out[:, :tc], 0, 1)
