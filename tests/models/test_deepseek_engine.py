"""DeepSeek V2 (MLA) through the full serving engine: the naive-MLA paged
cache (per-head K, zero-padded V) must compose with continuous batching,
paged eviction, and the TP mesh (reference
vllm/model_executor/models/deepseek_v2.py serving path)."""

import numpy as np

import jax

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

DSV2 = {
    "architectures": ["DeepseekV2ForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 4, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
    "kv_lora_rank": 32, "q_lora_rank": None,
    "qk_nope_head_dim": 16, "qk_rope_head_dim": 8, "v_head_dim": 12,
    "n_routed_experts": 4, "moe_intermediate_size": 48,
    "num_experts_per_tok": 2, "n_shared_experts": 2,
    "first_k_dense_replace": 1, "topk_method": "greedy",
    "routed_scaling_factor": 1.0,
    "tie_word_embeddings": True, "eos_token_id": None,
}


def test_deepseek_v2_generate_with_eviction():
    llm = LLM(hf_config=DSV2, dtype="float32", block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0,
              enable_paged_eviction=True, evict_method="global",
              cache_budget=128, num_scheduler_steps=4)
    outs = llm.generate(
        prompt_token_ids=[list(range(1, 100)), list(range(30, 90))],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=60,
                                       ignore_eos=True))
    for out in outs:
        assert len(out.outputs[0].token_ids) == 60


def test_deepseek_v2_matches_unpaged_forward():
    """Greedy engine continuation == stateless full-context argmax rollout
    with the same weights (the basic-correctness pattern)."""
    import jax.numpy as jnp

    from vllm_paged_compression_tpu.models.registry import build_model
    from vllm_paged_compression_tpu.ops.attention import prefill_attention

    llm = LLM(hf_config=DSV2, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=128, seed=7,
              num_scheduler_steps=2)
    prompt = [3, 14, 15, 92, 65, 35, 89, 79]
    out = llm.generate(
        prompt_token_ids=[list(prompt)],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)

    model = llm.engine.model
    params = llm.engine.params
    scale = model.arch.attn_scale

    ids = list(prompt)
    want = []
    for _ in range(8):
        t = len(ids)

        def attn(q, k, v, state):
            return prefill_attention(q, k, v, scale, q.shape[0]), state

        h, _ = model.forward_hidden(params, jnp.asarray(ids, jnp.int32),
                                    jnp.arange(t), attn)
        logits = model.logits(params, h[t - 1][None])
        nxt = int(np.asarray(jnp.argmax(logits, axis=-1))[0])
        want.append(nxt)
        ids.append(nxt)
    assert got == want


def test_deepseek_v2_tp_mesh_shards():
    """Param sharding specs cover the MLA/dense-prefix tree (8-way CPU
    mesh)."""
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    cfg = {**DSV2, "num_attention_heads": 8, "num_key_value_heads": 8}
    llm = LLM(hf_config=cfg, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=32, seed=0,
              tensor_parallel_size=8)
    outs = llm.generate(
        prompt_token_ids=[list(range(1, 40))],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 8
