"""Engine integration of the fused decode-layer megakernel fast path:
an eligible int4 llama engine takes the fused path (interpret-mode
Pallas on CPU) and generates the same greedy tokens as the unfused
scan path."""

import numpy as np
import pytest

# Kernel-eligible tiny llama: D=1024 (Kh=512, gs=4), F=1024, heads
# 8 x 128, kv 4 -> Nq = 2048.
CFG = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 256, "hidden_size": 1024, "intermediate_size": 1024,
    "num_hidden_layers": 2, "num_attention_heads": 8,
    "num_key_value_heads": 4, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": True, "eos_token_id": None,
}


def _run(monkeypatch, disable_fused: bool):
    monkeypatch.setenv("VPC_ATTENTION_BACKEND", "pallas")
    if disable_fused:
        monkeypatch.setenv("VPC_DISABLE_FUSED_LAYER", "1")
    else:
        monkeypatch.delenv("VPC_DISABLE_FUSED_LAYER", raising=False)
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    llm = LLM(hf_config=CFG, dtype="bfloat16", quantization="int4",
              block_size=16, max_model_len=256, num_device_blocks=32,
              seed=0, max_num_seqs=4, num_scheduler_steps=4)
    assert llm.engine.runner._fuse_layers_ok(
        llm.engine.params, 1) == (not disable_fused)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    out = llm.generate(prompt_token_ids=[[1, 9, 33, 77, 121, 5, 8]],
                       sampling_params=sp)
    return out[0].outputs[0].token_ids


def test_fused_path_tokens_match_unfused(monkeypatch):
    fused = _run(monkeypatch, disable_fused=False)
    unfused = _run(monkeypatch, disable_fused=True)
    assert len(fused) == 12
    # Numerics differ at bf16 ulp level (f32 in-kernel residuals vs bf16
    # XLA round trips) — greedy argmax on random weights may flip on a
    # near-tie; require agreement on the early tokens.
    assert fused[:6] == unfused[:6], (fused, unfused)


def test_fused_path_with_eviction(monkeypatch):
    """The fast path composes with in-graph eviction (victims plumb
    through attn_fn unchanged)."""
    monkeypatch.setenv("VPC_ATTENTION_BACKEND", "pallas")
    monkeypatch.delenv("VPC_DISABLE_FUSED_LAYER", raising=False)
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    llm = LLM(hf_config=CFG, dtype="bfloat16", quantization="int4",
              enable_paged_eviction=True, evict_method="global",
              cache_budget=128, block_size=16, max_model_len=512,
              num_device_blocks=32, seed=0, num_scheduler_steps=4)
    assert llm.engine.runner._fuse_layers_ok(llm.engine.params, 1)
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    out = llm.generate(prompt_token_ids=[list(range(1, 150))],
                       sampling_params=sp)
    assert len(out[0].outputs[0].token_ids) == 24
