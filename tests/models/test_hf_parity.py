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
