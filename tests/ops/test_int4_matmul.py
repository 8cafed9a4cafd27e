"""int4 fused matmul: quantize/pack roundtrip, Pallas kernel vs jnp
oracle vs dense float matmul.  Reference analog: gptq_marlin GEMM tests
(tests/kernels/test_marlin_gemm.py) — dequant-in-kernel int4 matmul must
match the dequantized-dense product exactly and the float product within
quantization error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
    GROUP, QuantizedWeight4, dequantize_int4, int4_matmul,
    int4_matmul_pallas, int4_matmul_ref, quantize_weight_int4)
from vllm_paged_compression_tpu.ops.quant import matmul


class TestQuantizeRoundtrip:
    def test_dequant_error_bounded(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((256, 128), dtype=np.float32) * 0.02
        w4 = quantize_weight_int4(w)
        wd = np.asarray(dequantize_int4(w4, dtype=jnp.float32))
        # max error <= scale/2 per group
        s = np.asarray(w4.s)
        err = np.abs(wd - w)
        per_group = err.reshape(256 // GROUP, GROUP, 128).max(axis=1)
        assert np.all(per_group <= s * 0.5 + 1e-7)

    def test_packing_halves_bytes(self):
        w = np.zeros((256, 128), np.float32)
        w4 = quantize_weight_int4(w)
        assert w4.qp.shape == (128, 128)
        assert w4.s.shape == (2, 128)
        assert w4.z.shape == (2, 128)

    def test_stacked_layers(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((3, 256, 128), dtype=np.float32)
        w4 = quantize_weight_int4(w)
        assert w4.qp.shape == (3, 128, 128)
        one = quantize_weight_int4(w[1])
        np.testing.assert_array_equal(np.asarray(w4.qp[1]),
                                      np.asarray(one.qp))


class TestKernelVsOracle:
    @pytest.mark.parametrize("m,k,n", [(8, 256, 128), (1, 512, 256),
                                       (128, 256, 384), (200, 512, 128)])
    def test_pallas_matches_ref(self, m, k, n):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        w = rng.standard_normal((k, n), dtype=np.float32) * 0.02
        w4 = quantize_weight_int4(w)
        ref = int4_matmul_ref(x, w4)
        got = int4_matmul_pallas(x, w4)
        # The kernel applies group scales to f32 partial sums (group-
        # factored dequant) while the oracle rounds the dequantized
        # weight to bf16 first — the kernel is slightly MORE precise, so
        # the comparison carries a small bf16-rounding allowance.
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=5e-3)

    def test_ref_matches_dense_float(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
        w = rng.standard_normal((256, 128), dtype=np.float32) * 0.02
        w4 = quantize_weight_int4(w)
        got = np.asarray(int4_matmul_ref(x, w4))
        exact = np.asarray(x) @ w
        # quantization error only: per-element bound from group scales
        bound = (np.abs(np.asarray(x)) @ np.repeat(
            np.asarray(w4.s) * 0.5, GROUP, axis=0)) + 1e-5
        assert np.all(np.abs(got - exact) <= bound)

    def test_dispatcher_3d_and_fallback(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 4, 256)), jnp.float32)
        w = rng.standard_normal((256, 128), dtype=np.float32) * 0.02
        w4 = quantize_weight_int4(w)
        y = int4_matmul(x, w4)
        assert y.shape == (2, 4, 128)
        ref = int4_matmul_ref(x.reshape(-1, 256), w4).reshape(2, 4, 128)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-2, atol=5e-3)

    def test_quant_matmul_dispatch(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
        w = rng.standard_normal((256, 128), dtype=np.float32) * 0.02
        w4 = quantize_weight_int4(w)
        y = matmul(x, w4)
        ref = int4_matmul_ref(x, w4)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-2, atol=5e-3)


class TestEngineInt4:
    def test_e2e_generation_int4(self):
        """Tiny engine with quantization="int4": tokens are generated and
        deterministic (reference: int4 checkpoints serve E2E)."""
        from vllm_paged_compression_tpu.entrypoints.llm import LLM
        from vllm_paged_compression_tpu.sampling_params import (
            SamplingParams)
        cfg = {
            "architectures": ["LlamaForCausalLM"],
            "vocab_size": 128, "hidden_size": 256,
            "intermediate_size": 512, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "max_position_embeddings": 512, "rope_theta": 10000.0,
            "rms_norm_eps": 1e-5, "tie_word_embeddings": True,
            "eos_token_id": None,
        }
        llm = LLM(hf_config=cfg, dtype="float32", block_size=4,
                  max_model_len=256, num_device_blocks=128, seed=0,
                  max_num_seqs=4, quantization="int4")
        outs = llm.generate(
            prompt_token_ids=[[1, 17, 33, 5, 99, 2, 8, 61]],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=8))
        toks = outs[0].outputs[0].token_ids
        assert len(toks) == 8
        outs2 = llm.generate(
            prompt_token_ids=[[1, 17, 33, 5, 99, 2, 8, 61]],
            sampling_params=SamplingParams(temperature=0.0, max_tokens=8))
        assert outs2[0].outputs[0].token_ids == toks


class TestStackedKernel:
    def test_stacked_matches_sliced(self):
        from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
            StackedInt4View, int4_matmul_view)
        rng = np.random.default_rng(6)
        L, K, N = 3, 256, 256
        w = rng.standard_normal((L, K, N), dtype=np.float32) * 0.02
        w4 = quantize_weight_int4(w, group=128)
        x = jnp.asarray(rng.standard_normal((8, K)), jnp.float32)
        for li in range(L):
            got = int4_matmul_view(x, StackedInt4View(w4, jnp.int32(li)))
            ref = int4_matmul_ref(x, QuantizedWeight4(
                w4.qp[li], w4.s[li], w4.z[li]))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-2, atol=8e-3)

    def test_scan_over_layers_uses_views(self):
        """A scan over a stacked int4 trunk must produce the same result
        as applying per-layer slices sequentially."""
        from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
            StackedInt4View, int4_matmul_view)
        rng = np.random.default_rng(7)
        L, K = 4, 256
        w = rng.standard_normal((L, K, K), dtype=np.float32) * 0.05
        w4 = quantize_weight_int4(w, group=128)
        x = jnp.asarray(rng.standard_normal((8, K)), jnp.float32)

        @jax.jit
        def scanned(x, w4):
            def body(h, li):
                y = int4_matmul_view(h, StackedInt4View(w4, li))
                return jnp.tanh(y), None
            h, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
            return h

        h = x
        for li in range(L):
            h = jnp.tanh(int4_matmul(h, QuantizedWeight4(
                w4.qp[li], w4.s[li], w4.z[li])))
        np.testing.assert_allclose(np.asarray(scanned(x, w4)),
                                   np.asarray(h), rtol=2e-2, atol=8e-3)


class TestPackedInt4:
    """PackedInt4: the bf16 interleaved scale/offset stream (round 4).

    Layout contract and kernel parity for both gs=8 and gs=4; numerics
    modeled by dequantize_packed (bf16 s/zs, w = q*s - zs)."""

    def _mk(self, K, N, L=None, seed=8, gs=None):
        from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
            pack_int4_scales)
        rng = np.random.default_rng(seed)
        shape = (K, N) if L is None else (L, K, N)
        w = rng.standard_normal(shape, dtype=np.float32) * 0.02
        w4 = quantize_weight_int4(w)
        return w, w4, pack_int4_scales(w4, gs=gs)

    @pytest.mark.parametrize("k,gs", [(2048, 8), (2048, 4), (1024, 4)])
    def test_pack_layout_and_gs(self, k, gs):
        from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
            PackedInt4, packed_gs)
        # N <= 4096 auto-picks gs=4 (full-minor-axis DMA tiles); pin gs
        # explicitly so the layout contract is checked at both values.
        _, w4, p4 = self._mk(k, 256, gs=gs if k == 2048 else None)
        assert isinstance(p4, PackedInt4)
        assert packed_gs(p4) == gs
        n_half = k // 2 // GROUP
        assert p4.sz.shape == ((n_half // gs) * 32, 256)
        assert p4.sz.dtype == jnp.bfloat16
        # row g of tile t is s[gs*t+g]; row 16+g is the hi-half scale
        sz = np.asarray(p4.sz, np.float32)
        s = np.asarray(w4.s, np.float32)
        zs = s * np.asarray(w4.z, np.float32)
        for t in range(n_half // gs):
            for g in range(gs):
                np.testing.assert_allclose(
                    sz[32 * t + g], s[gs * t + g], rtol=1e-2)
                np.testing.assert_allclose(
                    sz[32 * t + 8 + g], zs[gs * t + g], rtol=1e-2,
                    atol=1e-6)
                np.testing.assert_allclose(
                    sz[32 * t + 16 + g], s[n_half + gs * t + g],
                    rtol=1e-2)
                np.testing.assert_allclose(
                    sz[32 * t + 24 + g], zs[n_half + gs * t + g],
                    rtol=1e-2, atol=1e-6)

    def test_small_or_odd_shapes_stay_unpacked(self):
        from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
            pack_int4_scales)
        # K=256 -> group shrinks? no: group 128, n_half=1 -> gs=1 -> skip
        w4 = quantize_weight_int4(np.zeros((256, 128), np.float32))
        assert pack_int4_scales(w4) is w4

    @pytest.mark.parametrize("m,k,n", [(1, 2048, 256), (16, 2048, 384),
                                       (1, 1024, 256), (256, 2048, 256)])
    def test_packed_kernel_matches_packed_oracle(self, m, k, n):
        from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
            int4_matmul_packed, int4_matmul_packed_ref)
        rng = np.random.default_rng(9)
        _, w4, p4 = self._mk(k, n)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        got = int4_matmul_packed(x, p4)
        ref = int4_matmul_packed_ref(x, p4)
        # atol covers the prefill factoring's extra bf16 rounding (the
        # kernel rounds w = q*s - zs to bf16 per term; the oracle rounds
        # once after the f32 subtraction).
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=3e-2, atol=2.5e-2)

    def test_bf16_scales_close_to_f32_scales(self):
        """The packed form's bf16 rounding stays well under int4
        quantization noise."""
        from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
            dequantize_packed)
        w, w4, p4 = self._mk(2048, 256)
        wd_f32 = np.asarray(dequantize_int4(w4, dtype=jnp.float32))
        wd_b = np.asarray(dequantize_packed(p4, dtype=jnp.float32))
        s = np.repeat(np.asarray(w4.s), GROUP, axis=0)
        # bf16 rounding of s/zs shifts each element by < one quant step
        assert np.all(np.abs(wd_b - wd_f32) <= s + 1e-6)

    def test_stacked_packed_view_dispatch(self):
        from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
            PackedInt4, StackedInt4View, int4_matmul_packed_ref,
            int4_matmul_view)
        rng = np.random.default_rng(10)
        _, w4, p4 = self._mk(2048, 256, L=3)
        assert isinstance(p4, PackedInt4)
        x = jnp.asarray(rng.standard_normal((1, 2048)), jnp.bfloat16)
        for li in range(3):
            got = int4_matmul_view(x, StackedInt4View(p4, jnp.int32(li)))
            ref = int4_matmul_packed_ref(
                x, PackedInt4(qp=p4.qp[li], sz=p4.sz[li]))
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(ref, np.float32),
                                       rtol=3e-2, atol=8e-3)

    def test_quant_matmul_dispatches_packed(self):
        _, w4, p4 = self._mk(2048, 256)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((2, 3, 2048)), jnp.bfloat16)
        y = matmul(x, p4)
        assert y.shape == (2, 3, 256)

    def test_quantize_params_tree_packs_eligible(self):
        from vllm_paged_compression_tpu.ops.pallas.int4_matmul import (
            PackedInt4)
        from vllm_paged_compression_tpu.ops.quant import (
            quantize_params_tree)
        params = {"layers": {"w_big": np.zeros((2, 2048, 256), np.float32),
                             "w_tiny": np.zeros((2, 64, 64), np.float32)},
                  "other": np.ones((4,), np.float32)}
        out = quantize_params_tree(params, ("w_big", "w_tiny"), bits=4)
        assert isinstance(out["layers"]["w_big"], PackedInt4)
        assert isinstance(out["layers"]["w_tiny"], QuantizedWeight4)
