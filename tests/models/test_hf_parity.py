"""Logit parity vs HuggingFace transformers (CPU torch, random weights).

Reference analog: tests/basic_correctness/test_basic_correctness.py compares
vLLM outputs against HfRunner on small models; here we build tiny
random-weight HF models in-process (zero-egress image: no downloads) and
check our functional-JAX forward matches HF logits.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.llama import LlamaArch, LlamaModel
from vllm_paged_compression_tpu.models.opt import OPTArch, OPTModel
from vllm_paged_compression_tpu.models.weights import (
    torch_state_dict_to_numpy)
from vllm_paged_compression_tpu.ops.attention import prefill_attention

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def full_attn_fn(scale):
    def fn(q, k, v, state):
        return prefill_attention(q, k, v, scale, q.shape[0]), state
    return fn


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_llama_logits_match_hf(kv_heads):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=kv_heads, max_position_embeddings=128,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg).eval()

    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100, 62, 11]])
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits[0].float().numpy()

    arch = LlamaArch.from_hf_config(cfg.to_dict())
    model = LlamaModel(arch, dtype=jnp.float32)
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    t = ids.shape[1]
    hidden, _ = model.forward_hidden(
        params, jnp.array(ids[0]), jnp.arange(t),
        full_attn_fn(arch.head_dim ** -0.5))
    ours = np.asarray(model.logits(params, hidden))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


def test_llama31_rope_scaling_matches_hf():
    cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=50000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
        tie_word_embeddings=True)
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    ids = np.arange(40)[None] % 96
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits[0].float().numpy()
    arch = LlamaArch.from_hf_config(cfg.to_dict())
    model = LlamaModel(arch, dtype=jnp.float32)
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    hidden, _ = model.forward_hidden(
        params, jnp.array(ids[0]), jnp.arange(ids.shape[1]),
        full_attn_fn(arch.head_dim ** -0.5))
    ours = np.asarray(model.logits(params, hidden))
    np.testing.assert_allclose(ours, hf_logits, rtol=3e-4, atol=3e-4)


def test_opt_logits_match_hf():
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=True, tie_word_embeddings=True,
        word_embed_proj_dim=48)
    torch.manual_seed(2)
    hf = transformers.OPTForCausalLM(cfg).eval()
    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100]])
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits[0].float().numpy()
    arch = OPTArch.from_hf_config(cfg.to_dict())
    model = OPTModel(arch, dtype=jnp.float32)
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    t = ids.shape[1]
    hidden, _ = model.forward_hidden(
        params, jnp.array(ids[0]), jnp.arange(t),
        full_attn_fn(arch.head_dim ** -0.5))
    ours = np.asarray(model.logits(params, hidden))
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


# ---- Llama-family variants (Qwen2 / Gemma / Gemma2 / Phi3 / Mistral) ----

from vllm_paged_compression_tpu.models.registry import build_model  # noqa: E402


def _check_parity(hf, cfg_dict, ids, rtol=3e-4, atol=3e-4, softcap=None):
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits[0].float().numpy()
    model = build_model(cfg_dict, dtype=jnp.float32)
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    t = ids.shape[1]
    scale = model.arch.attn_scale if hasattr(model.arch, "attn_scale") \
        else model.arch.head_dim ** -0.5

    def attn(q, k, v, state):
        return prefill_attention(q, k, v, scale, q.shape[0],
                                 softcap=softcap), state

    hidden, _ = model.forward_hidden(params, jnp.array(ids[0]),
                                     jnp.arange(t), attn)
    ours = np.asarray(model.logits(params, hidden))
    np.testing.assert_allclose(ours, hf_logits, rtol=rtol, atol=atol)


def test_qwen2_logits_match_hf():
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    torch.manual_seed(3)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100, 62, 11]])
    d = cfg.to_dict(); d["architectures"] = ["Qwen2ForCausalLM"]
    _check_parity(hf, d, ids)


def test_gemma_logits_match_hf():
    cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5)
    torch.manual_seed(4)
    hf = transformers.GemmaForCausalLM(cfg).eval()
    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100]])
    d = cfg.to_dict(); d["architectures"] = ["GemmaForCausalLM"]
    _check_parity(hf, d, ids)


def test_gemma2_logits_match_hf():
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, query_pre_attn_scalar=16,
        sliding_window=4096)
    torch.manual_seed(5)
    hf = transformers.Gemma2ForCausalLM(cfg).eval()
    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100]])
    d = cfg.to_dict(); d["architectures"] = ["Gemma2ForCausalLM"]
    _check_parity(hf, d, ids, softcap=50.0)


def test_phi3_logits_match_hf():
    cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2)
    torch.manual_seed(6)
    hf = transformers.Phi3ForCausalLM(cfg).eval()
    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100]])
    d = cfg.to_dict(); d["architectures"] = ["Phi3ForCausalLM"]
    _check_parity(hf, d, ids)


def test_gpt2_logits_match_hf():
    cfg = transformers.GPT2Config(
        vocab_size=128, n_embd=48, n_layer=3, n_head=4, n_positions=128)
    torch.manual_seed(7)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100]])
    d = cfg.to_dict(); d["architectures"] = ["GPT2LMHeadModel"]
    _check_parity(hf, d, ids)


def test_mistral_logits_match_hf():
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        sliding_window=None, tie_word_embeddings=False)
    torch.manual_seed(8)
    hf = transformers.MistralForCausalLM(cfg).eval()
    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100]])
    d = cfg.to_dict(); d["architectures"] = ["MistralForCausalLM"]
    _check_parity(hf, d, ids)


def test_mixtral_logits_match_hf():
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    torch.manual_seed(9)
    hf = transformers.MixtralForCausalLM(cfg).eval()
    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100]])
    d = cfg.to_dict(); d["architectures"] = ["MixtralForCausalLM"]
    _check_parity(hf, d, ids)


def test_mixtral_e2e_generation():
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = {"architectures": ["MixtralForCausalLM"], "vocab_size": 128,
           "hidden_size": 64, "intermediate_size": 128,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "num_local_experts": 4,
           "num_experts_per_tok": 2, "max_position_embeddings": 512,
           "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
           "tie_word_embeddings": True, "eos_token_id": None}
    llm = LLM(hf_config=cfg, dtype="float32", enable_paged_eviction=True,
              evict_method="global", cache_budget=64, block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0)
    outs = llm.generate(prompt_token_ids=[list(range(1, 100))],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=16))
    assert len(outs[0].outputs[0].token_ids) == 16


def test_qwen3_logits_match_hf():
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(6)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    ids = np.array([[1, 5, 9, 33, 77, 2, 4, 100, 62, 11]])
    d = cfg.to_dict(); d["architectures"] = ["Qwen3ForCausalLM"]
    _check_parity(hf, d, ids)
