"""Sliding-window attention: greedy E2E token parity vs HF with windows
SMALLER than the sequence (the window actually bites), covering the
all-layers-sliding case (Mistral), the alternating case (Gemma2: even
layers sliding, odd global), and Cohere2's every-4th-global pattern.

Reference: sliding windows are supported on the non-eviction backends
(vllm/attention/backends/ — _make_sliding_window_bias) and asserted
unsupported with paged eviction (torch_cuda_sdpa.py:567)."""

import numpy as np
import pytest

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

PROMPT = [1, 5, 9, 33, 77, 2, 4, 100, 62, 11, 7, 3]
N = 12   # prompt 12 + 12 generated >> window 5


def _greedy_hf(hf, ids, n):
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n, do_sample=False, eos_token_id=None)
    return out[0].tolist()[len(ids):]


def _greedy_ours(cfg, hf, ids, n, **llm_kw):
    llm = LLM(hf_config=cfg, dtype="float32", block_size=4,
              max_model_len=64, num_device_blocks=32, seed=0,
              max_num_seqs=2, **llm_kw)
    llm.engine.params = llm.engine.model.load_hf_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()})
    outs = llm.generate(prompt_token_ids=[ids],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=n,
                            ignore_eos=True))
    return list(outs[0].outputs[0].token_ids)


def test_mistral_sliding_window_greedy_matches_hf():
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        sliding_window=5, tie_word_embeddings=False)
    cfg._attn_implementation = "eager"
    torch.manual_seed(150)
    hf = transformers.MistralForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["MistralForCausalLM"]
    d["eos_token_id"] = None
    assert _greedy_ours(d, hf, PROMPT, N) == _greedy_hf(hf, PROMPT, N)


def test_gemma2_alternating_sliding_window_matches_hf():
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, query_pre_attn_scalar=16,
        sliding_window=5)
    cfg._attn_implementation = "eager"
    torch.manual_seed(151)
    hf = transformers.Gemma2ForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["Gemma2ForCausalLM"]
    d["eos_token_id"] = None
    assert _greedy_ours(d, hf, PROMPT, N) == _greedy_hf(hf, PROMPT, N)


def test_cohere2_sliding_window_matches_hf():
    cfg = transformers.Cohere2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=8, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        logit_scale=0.0625, layer_norm_eps=1e-5, sliding_window=5,
        sliding_window_pattern=4)
    cfg._attn_implementation = "eager"
    torch.manual_seed(152)
    hf = transformers.Cohere2ForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["Cohere2ForCausalLM"]
    d["eos_token_id"] = None
    assert _greedy_ours(d, hf, PROMPT, N) == _greedy_hf(hf, PROMPT, N)


def test_sliding_window_rejects_eviction():
    d = {"architectures": ["MistralForCausalLM"], "vocab_size": 128,
         "hidden_size": 64, "intermediate_size": 128,
         "num_hidden_layers": 2, "num_attention_heads": 4,
         "num_key_value_heads": 2, "max_position_embeddings": 512,
         "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
         "sliding_window": 64, "eos_token_id": None}
    with pytest.raises(ValueError, match="sliding-window"):
        LLM(hf_config=d, dtype="float32", enable_paged_eviction=True,
            evict_method="global", cache_budget=128, block_size=16,
            max_model_len=512, num_device_blocks=64, seed=0)


def test_window_wider_than_context_is_inert():
    # Phi-3-style configs carry sliding_window >= max_model_len: masking
    # is a no-op and eviction remains allowed.
    d = {"architectures": ["MistralForCausalLM"], "vocab_size": 128,
         "hidden_size": 64, "intermediate_size": 128,
         "num_hidden_layers": 2, "num_attention_heads": 4,
         "num_key_value_heads": 2, "max_position_embeddings": 512,
         "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
         "sliding_window": 4096, "eos_token_id": None}
    llm = LLM(hf_config=d, dtype="float32", enable_paged_eviction=True,
              evict_method="global", cache_budget=128, block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0)
    outs = llm.generate(prompt_token_ids=[list(range(1, 40))],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=8))
    assert len(outs[0].outputs[0].token_ids) == 8


@pytest.mark.parametrize("family", ["mistral", "gemma2"])
def test_sliding_window_pallas_backend_matches_hf(family, monkeypatch):
    """The Pallas path (fused decode kernel with per-row window starts +
    flash prefill with a traced window; interpret mode on CPU) must stay
    token-exact vs HF.  Mistral (hkv*d = 128) exercises the fused flat
    variant; Gemma2 (d=16) exercises the masked jnp fallback riding the
    pallas backend plus softcap-in-window flash prefill."""
    monkeypatch.setenv("VPC_ATTENTION_BACKEND", "pallas")
    if family == "mistral":
        cfg = transformers.MistralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0, rms_norm_eps=1e-5, sliding_window=5,
            tie_word_embeddings=False)
        cfg._attn_implementation = "eager"
        torch.manual_seed(150)
        hf = transformers.MistralForCausalLM(cfg).eval()
        d = cfg.to_dict(); d["architectures"] = ["MistralForCausalLM"]
    else:
        cfg = transformers.Gemma2Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=128, rope_theta=10000.0,
            rms_norm_eps=1e-5, attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0, query_pre_attn_scalar=16,
            sliding_window=5)
        cfg._attn_implementation = "eager"
        torch.manual_seed(151)
        hf = transformers.Gemma2ForCausalLM(cfg).eval()
        d = cfg.to_dict(); d["architectures"] = ["Gemma2ForCausalLM"]
    d["eos_token_id"] = None
    assert _greedy_ours(d, hf, PROMPT, N) == _greedy_hf(hf, PROMPT, N)
