"""Fused decode-layer megakernel (ops/pallas/fused_layer.py) vs its jnp
oracle: the kernel streams o_proj + gate_up + down + next-layer qkv
through one DMA pipeline with in-kernel residuals/norms/gating."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

D, F, NQ, L = 1024, 1024, 2048, 3
EPS = 1e-5


def _pack(rng, kh, n, gs):
    from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
        PackedInt4, pack_int4_scales, quantize_weight_int4)
    w = rng.standard_normal((L, 2 * kh, n)).astype(np.float32) * 0.05
    p4 = pack_int4_scales(quantize_weight_int4(w), gs=gs)
    assert isinstance(p4, PackedInt4)
    return p4


@pytest.fixture(scope="module")
def weights():
    rng = np.random.default_rng(0)
    wo = _pack(rng, D // 2, D, 4)
    wgu = _pack(rng, D // 2, 2 * F, 4)
    wd = _pack(rng, F // 2, D, 4)
    wqkv = _pack(rng, D // 2, NQ, 4)
    norms = jnp.asarray(
        rng.standard_normal((L, 8, D)).astype(np.float32) * 0.3 + 1.0,
        jnp.bfloat16)
    return wo, wgu, wd, wqkv, norms


@pytest.mark.parametrize("layer", [0, 1, L - 1])
@pytest.mark.parametrize("m", [1, 4, 8, 16, 32])
def test_kernel_matches_oracle(weights, layer, m):
    from vllm_paged_compression_tpu.ops.pallas.fused_layer import (
        fused_decode_layer, fused_decode_layer_ref)
    wo, wgu, wd, wqkv, norms = weights
    rng = np.random.default_rng(layer * 10 + m)
    attn2d = jnp.asarray(rng.standard_normal((m, D)) * 0.3, jnp.bfloat16)
    h_in = jnp.asarray(rng.standard_normal((m, D)) * 0.5, jnp.bfloat16)
    h_k, qkv_k = fused_decode_layer(attn2d, h_in, wo, wgu, wd, wqkv,
                                    norms, layer, eps=EPS)
    h_r, qkv_r = fused_decode_layer_ref(attn2d, h_in, wo, wgu, wd, wqkv,
                                        norms, layer, eps=EPS)
    assert h_k.shape == (m, D) and qkv_k.shape == (m, NQ)
    np.testing.assert_allclose(np.asarray(h_k, np.float32),
                               np.asarray(h_r, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(qkv_k, np.float32),
                               np.asarray(qkv_r, np.float32),
                               rtol=0.05, atol=0.05)


def test_last_layer_clamps_qkv_index(weights):
    """qkv at layer L-1 is computed against the clamped index (its output
    is discarded by the caller) — it must not crash or corrupt h_out."""
    from vllm_paged_compression_tpu.ops.pallas.fused_layer import (
        fused_decode_layer, fused_decode_layer_ref)
    wo, wgu, wd, wqkv, norms = weights
    rng = np.random.default_rng(7)
    attn2d = jnp.asarray(rng.standard_normal((1, D)) * 0.3, jnp.bfloat16)
    h_in = jnp.asarray(rng.standard_normal((1, D)) * 0.5, jnp.bfloat16)
    h_k, _ = fused_decode_layer(attn2d, h_in, wo, wgu, wd, wqkv,
                                norms, L - 1, eps=EPS)
    h_r, _ = fused_decode_layer_ref(attn2d, h_in, wo, wgu, wd, wqkv,
                                    norms, L - 1, eps=EPS)
    np.testing.assert_allclose(np.asarray(h_k, np.float32),
                               np.asarray(h_r, np.float32),
                               rtol=0.05, atol=0.05)


def test_eligibility_gate(weights):
    from vllm_paged_compression_tpu.ops.pallas.fused_layer import (
        fused_layer_eligible)
    wo, wgu, wd, wqkv, _ = weights
    assert fused_layer_eligible(wqkv, wo, wgu, wd, D, F, NQ, m=8)
    assert fused_layer_eligible(wqkv, wo, wgu, wd, D, F, NQ, m=32)
    assert not fused_layer_eligible(wqkv, wo, wgu, wd, D, F, NQ, m=33)
    assert not fused_layer_eligible(wqkv.qp, wo, wgu, wd, D, F, NQ, m=8)


def test_traced_layer_index(weights):
    """The layer index rides scalar prefetch — a lax.scan over layers
    must reuse ONE compiled kernel."""
    from vllm_paged_compression_tpu.ops.pallas.fused_layer import (
        fused_decode_layer, fused_decode_layer_ref)
    wo, wgu, wd, wqkv, norms = weights
    rng = np.random.default_rng(3)
    attn2d = jnp.asarray(rng.standard_normal((2, D)) * 0.3, jnp.bfloat16)
    h0 = jnp.asarray(rng.standard_normal((2, D)) * 0.5, jnp.bfloat16)

    def body(h, li):
        h2, qkv = fused_decode_layer(attn2d, h, wo, wgu, wd, wqkv,
                                     norms, li, eps=EPS)
        return h2, qkv[:, 0]

    h_end, _ = jax.lax.scan(body, h0, jnp.arange(L, dtype=jnp.int32))
    h_ref = h0
    for li in range(L):
        h_ref, _ = fused_decode_layer_ref(attn2d, h_ref, wo, wgu, wd,
                                          wqkv, norms, li, eps=EPS)
    # bf16 boundary rounding compounds over layers (|h| grows to ~20,
    # ulp 0.125): per-layer agreement is tested tightly above; here the
    # tolerance covers 3 chained bf16 casts.
    np.testing.assert_allclose(np.asarray(h_end, np.float32),
                               np.asarray(h_ref, np.float32),
                               rtol=0.03, atol=0.3)
