"""Quantized KV cache: int8/fp8 pages + per-row scales, dequant fused in
attention, eviction scoring on quantized pages.

No reference prior art to port: the reference *rejects* fp8 KV together
with paged eviction (torch_cuda_sdpa.py:769-772); combining them is new
capability, so these tests gate accuracy against the fp oracle instead.
"""

import numpy as np
import pytest

import jax.numpy as jnp

# On the real chip, f32 matmuls run as bf16 multi-pass on the MXU
# (~1e-3 agreement on O(1) outputs); CPU/interpret is exact.  Same
# calibration as tests/ops/test_pallas_kernels.py.
import os
_REAL = os.environ.get("VPC_TEST_REAL_DEVICE") == "1"
RTOL = 1e-2 if _REAL else 2e-5
ATOL = 1e-2 if _REAL else 2e-5

from vllm_paged_compression_tpu.ops.attention import paged_decode_attention
from vllm_paged_compression_tpu.ops.cache import write_kv_slots
from vllm_paged_compression_tpu.ops.eviction import page_scores_from_cache
from vllm_paged_compression_tpu.ops.pallas import (
    paged_decode_attention_pallas)
from vllm_paged_compression_tpu.ops.quant import (QuantKV, dequantize_kv,
                                                  quantize_kv_rows)


def test_quantize_kv_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((10, 4, 64)).astype(np.float32))
    q, s = quantize_kv_rows(x)
    back = dequantize_kv(QuantKV(q=q, s=s))
    err = np.abs(np.asarray(back) - np.asarray(x)).max()
    amax = np.abs(np.asarray(x)).max()
    assert err <= amax / 127.0 + 1e-6


def _quant_pool(rng, num_pages, ps, hkv, d):
    k = rng.standard_normal((num_pages * ps, hkv, d)).astype(np.float32)
    v = rng.standard_normal((num_pages * ps, hkv, d)).astype(np.float32)
    shape = (num_pages, ps, hkv, d)
    kc = QuantKV(q=jnp.zeros(shape, jnp.int8),
                 s=jnp.zeros(shape[:-1], jnp.float32))
    vc = QuantKV(q=jnp.zeros(shape, jnp.int8),
                 s=jnp.zeros(shape[:-1], jnp.float32))
    slots = jnp.arange(num_pages * ps, dtype=jnp.int32)
    kc, vc = write_kv_slots(kc, vc, jnp.asarray(k), jnp.asarray(v), slots)
    return jnp.asarray(k), jnp.asarray(v), kc, vc


def test_quant_decode_close_to_fp_oracle():
    rng = np.random.default_rng(1)
    b, h, hkv, d, ps, num_pages = 2, 8, 4, 64, 16, 8
    k, v, kc, vc = _quant_pool(rng, num_pages, ps, hkv, d)
    kfp = k.reshape(num_pages, ps, hkv, d)
    vfp = v.reshape(num_pages, ps, hkv, d)
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    tables = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    lens = jnp.asarray([50, 64], jnp.int32)
    scale = d ** -0.5
    ref = paged_decode_attention(q, kfp, vfp, tables, lens, scale)
    out = paged_decode_attention(q, kc, vc, tables, lens, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_pallas_quant_kernel_matches_jnp_quant_oracle():
    rng = np.random.default_rng(2)
    b, h, hkv, d, ps, num_pages = 3, 8, 2, 64, 16, 12
    _, _, kc, vc = _quant_pool(rng, num_pages, ps, hkv, d)
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    tables = jnp.asarray(rng.permutation(12).reshape(3, 4), jnp.int32)
    lens = jnp.asarray([5, 33, 64], jnp.int32)
    scale = d ** -0.5
    ref = paged_decode_attention(q, kc, vc, tables, lens, scale)
    out = paged_decode_attention_pallas(q, kc, vc, tables, lens, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)


def test_quant_page_scores_match_dequant():
    rng = np.random.default_rng(3)
    _, v, _, vc = _quant_pool(rng, 4, 16, 2, 64)
    pages = QuantKV(q=vc.q[:4], s=vc.s[:4])
    got = np.asarray(page_scores_from_cache(pages))
    want = np.asarray(page_scores_from_cache(dequantize_kv(pages)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_e2e_int8_kv_with_eviction():
    """Full engine: int8 KV + global eviction must generate and stay close
    to the fp-cache tokens (greedy, tiny model)."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
           "hidden_size": 64, "intermediate_size": 128,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "max_position_embeddings": 512,
           "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
           "tie_word_embeddings": True, "eos_token_id": None}
    kw = dict(hf_config=cfg, dtype="float32", enable_paged_eviction=True,
              evict_method="global", cache_budget=128, block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0,
              num_scheduler_steps=8)
    sp = SamplingParams(temperature=0.0, max_tokens=24)
    prompt = [list(range(1, 100))]
    fp_llm = LLM(**kw)
    fp = fp_llm.generate(prompt_token_ids=prompt, sampling_params=sp)
    q_llm = LLM(params=fp_llm.engine.params, kv_cache_dtype="int8", **kw)
    qq = q_llm.generate(prompt_token_ids=prompt, sampling_params=sp)
    a = fp[0].outputs[0].token_ids
    b = qq[0].outputs[0].token_ids
    assert len(b) == 24
    agree = sum(x == y for x, y in zip(a, b))
    assert agree >= len(a) * 0.7, (a, b)
