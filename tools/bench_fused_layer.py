"""On-chip A/B of the fused decode-layer megakernel at Llama-3.1-8B
shapes: correctness vs the jnp oracle + per-layer wall clock vs the
separate per-matmul kernels it replaces."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_paged_compression_tpu.ops.pallas.fused_layer import (
    fused_decode_layer, fused_decode_layer_ref)
from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
    int4_matmul_stacked_packed, pack_int4_scales, quantize_weight_int4)

D, F, NQ, L = 4096, 14336, 6144, 8
M = 1
EPS = 1e-5


def dev_pack(key, kh, n):
    w = jax.random.normal(key, (L, 2 * kh, n), jnp.float32) * 0.02
    return pack_int4_scales(quantize_weight_int4(w))


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    wo = dev_pack(keys[0], D // 2, D)
    wgu = dev_pack(keys[1], D // 2, 2 * F)
    wd = dev_pack(keys[2], F // 2, D)
    wqkv = dev_pack(keys[3], D // 2, NQ)
    norms = (jax.random.normal(keys[4], (L, 8, D)) * 0.1 + 1.0
             ).astype(jnp.bfloat16)
    attn2d = (jax.random.normal(keys[5], (M, D)) * 0.3
              ).astype(jnp.bfloat16)
    h0 = (jax.random.normal(keys[5], (M, D)) * 0.5).astype(jnp.bfloat16)

    # correctness, layer 0 and L-1
    for li in (0, L - 1):
        hk, qk = jax.block_until_ready(fused_decode_layer(
            attn2d, h0, wo, wgu, wd, wqkv, norms, li, eps=EPS))
        hr, qr = jax.block_until_ready(fused_decode_layer_ref(
            attn2d, h0, wo, wgu, wd, wqkv, norms, li, eps=EPS))
        dh = np.abs(np.asarray(hk, np.float32) - np.asarray(hr, np.float32))
        dq = np.abs(np.asarray(qk, np.float32) - np.asarray(qr, np.float32))
        print(f"layer {li}: max|dh|={dh.max():.4f} max|dq|={dq.max():.4f} "
              f"(|h|max {np.abs(np.asarray(hr, np.float32)).max():.2f})")
        assert dh.max() < 0.1 and dq.max() < 0.1

    # timing: scan over layers, many reps under one jit
    STEPS = 32

    @jax.jit
    def fused_loop(h):
        def body(carry, li):
            h, qacc = carry
            h2, q2 = fused_decode_layer(attn2d, h, wo, wgu, wd, wqkv,
                                        norms, li % L, eps=EPS)
            return (h2, qacc + q2[:, 0]), None
        (h, qacc), _ = jax.lax.scan(
            body, (h, jnp.zeros((M,), jnp.bfloat16)),
            jnp.arange(L * STEPS, dtype=jnp.int32))
        return h, qacc

    @jax.jit
    def unfused_loop(h):
        def body(carry, li):
            h, qacc = carry
            li = li % L
            y = int4_matmul_stacked_packed(attn2d, wo, li)
            hmid = h.astype(jnp.float32) + y
            x2 = (hmid * jax.lax.rsqrt(
                jnp.mean(hmid * hmid, -1, keepdims=True) + EPS)
                ).astype(jnp.bfloat16) * norms[li, 0]
            gu = int4_matmul_stacked_packed(x2, wgu, li)
            g, u = gu[:, :F], gu[:, F:]
            act = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)
            hout = hmid + int4_matmul_stacked_packed(act, wd, li)
            x3 = (hout * jax.lax.rsqrt(
                jnp.mean(hout * hout, -1, keepdims=True) + EPS)
                ).astype(jnp.bfloat16) * norms[li, 1]
            q = int4_matmul_stacked_packed(x3, wqkv, li)
            return (hout.astype(jnp.bfloat16), qacc + q[:, 0]), None
        (h, qacc), _ = jax.lax.scan(
            body, (h, jnp.zeros((M,), jnp.bfloat16)),
            jnp.arange(L * STEPS, dtype=jnp.int32))
        return h, qacc

    for name, fn in (("fused", fused_loop), ("unfused", unfused_loop)):
        r = jax.block_until_ready(fn(h0))      # compile
        t0 = time.perf_counter()
        for _ in range(3):
            r = jax.block_until_ready(fn(h0))
        dt = (time.perf_counter() - t0) / 3
        per_layer = dt / (L * STEPS) * 1e6
        gb = (D / 2 * D + D / 2 * 2 * F + F / 2 * D + D / 2 * NQ) * 1.125
        print(f"{name}: {per_layer:.1f} us/layer  "
              f"({gb / (dt / (L * STEPS)) / 1e9:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
