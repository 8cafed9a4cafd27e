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
