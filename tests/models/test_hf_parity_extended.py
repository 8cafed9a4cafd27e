"""Logit parity vs HuggingFace for the extended model zoo: StarCoder2,
StableLM, Phi-1/2, GPT-NeoX, GPT-J, Falcon, Cohere (direct transformers
comparison) and Baichuan / InternLM2 (checkpoint-layout conversion checked
against an equivalent Llama).

Reference analog: per-family files under vllm/model_executor/models/
(starcoder2.py, stablelm.py, phi.py, gpt_neox.py, gpt_j.py, falcon.py,
commandr.py, baichuan.py, internlm2.py) with tests/models coverage.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.models.weights import (
    torch_state_dict_to_numpy)
from vllm_paged_compression_tpu.ops.attention import prefill_attention

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IDS = np.array([[1, 5, 9, 33, 77, 2, 4, 100, 62, 11]])


def _check_parity(hf, cfg_dict, ids=IDS, rtol=3e-4, atol=3e-4):
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits[0].float().numpy()
    model = build_model(cfg_dict, dtype=jnp.float32)
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    t = ids.shape[1]
    scale = model.arch.attn_scale

    def attn(q, k, v, state):
        return prefill_attention(q, k, v, scale, q.shape[0]), state

    hidden, _ = model.forward_hidden(params, jnp.array(ids[0]),
                                     jnp.arange(t), attn)
    ours = np.asarray(model.logits(params, hidden))
    np.testing.assert_allclose(ours, hf_logits, rtol=rtol, atol=atol)
    return model


def test_starcoder2_logits_match_hf():
    cfg = transformers.Starcoder2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, norm_epsilon=1e-5,
        use_bias=True, tie_word_embeddings=True)
    torch.manual_seed(10)
    hf = transformers.Starcoder2ForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["Starcoder2ForCausalLM"]
    _check_parity(hf, d)


def test_stablelm_logits_match_hf():
    cfg = transformers.StableLmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        partial_rotary_factor=0.25, use_qkv_bias=True, layer_norm_eps=1e-5,
        tie_word_embeddings=False)
    torch.manual_seed(11)
    hf = transformers.StableLmForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["StableLmForCausalLM"]
    _check_parity(hf, d)


def test_phi_logits_match_hf():
    cfg = transformers.PhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        layer_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(12)
    hf = transformers.PhiForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["PhiForCausalLM"]
    _check_parity(hf, d)


@pytest.mark.parametrize("parallel", [True, False])
def test_gpt_neox_logits_match_hf(parallel):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, rotary_pct=0.25,
        use_parallel_residual=parallel, layer_norm_eps=1e-5,
        tie_word_embeddings=False)
    torch.manual_seed(13)
    hf = transformers.GPTNeoXForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["GPTNeoXForCausalLM"]
    _check_parity(hf, d)


def test_gptj_logits_match_hf():
    cfg = transformers.GPTJConfig(
        vocab_size=128, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        rotary_dim=8, tie_word_embeddings=False)
    torch.manual_seed(14)
    hf = transformers.GPTJForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["GPTJForCausalLM"]
    _check_parity(hf, d)


def test_falcon7b_style_logits_match_hf():
    cfg = transformers.FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
        max_position_embeddings=128, tie_word_embeddings=True)
    torch.manual_seed(15)
    hf = transformers.FalconForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["FalconForCausalLM"]
    model = _check_parity(hf, d)
    assert model.arch.num_kv_heads == 1  # multi-query


def test_falcon40b_style_logits_match_hf():
    cfg = transformers.FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=True,
        num_kv_heads=2, bias=False, alibi=False,
        max_position_embeddings=128, tie_word_embeddings=True)
    torch.manual_seed(16)
    hf = transformers.FalconForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["FalconForCausalLM"]
    _check_parity(hf, d)


def test_cohere_logits_match_hf():
    cfg = transformers.CohereConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        logit_scale=0.0625, layer_norm_eps=1e-5, use_qk_norm=False)
    torch.manual_seed(17)
    hf = transformers.CohereForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["CohereForCausalLM"]
    _check_parity(hf, d)


def test_cohere2_logits_match_hf():
    # Command-R7B: 8 layers -> pattern [S,S,S,F]x2; the full-attention
    # layers skip rope entirely (reference commandr.py:223).  Sequence
    # shorter than the window, so sliding == full attention.
    cfg = transformers.Cohere2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=8, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        logit_scale=0.0625, layer_norm_eps=1e-5, sliding_window=4096,
        sliding_window_pattern=4)
    torch.manual_seed(18)
    hf = transformers.Cohere2ForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["Cohere2ForCausalLM"]
    _check_parity(hf, d)


# ---- remote-code families: checkpoint-layout conversion vs Llama --------


def _llama_ref(seed, kv_heads=2):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=kv_heads, max_position_embeddings=128,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    return cfg, hf, torch_state_dict_to_numpy(hf.state_dict())


def _logits(model, params, ids=IDS):
    scale = model.arch.attn_scale

    def attn(q, k, v, state):
        return prefill_attention(q, k, v, scale, q.shape[0]), state

    hidden, _ = model.forward_hidden(params, jnp.array(ids[0]),
                                     jnp.arange(ids.shape[1]), attn)
    return np.asarray(model.logits(params, hidden))


def test_baichuan_wpack_layout_matches_llama():
    cfg, hf, sd = _llama_ref(18, kv_heads=4)  # Baichuan is MHA
    with torch.no_grad():
        hf_logits = hf(torch.tensor(IDS)).logits[0].float().numpy()
    # Repack q/k/v into Baichuan's fused W_pack.
    bc = {}
    for k, v in sd.items():
        if ".self_attn.q_proj.weight" in k:
            base = k.replace(".q_proj.", ".W_pack.")
            bc[base] = np.concatenate([
                v, sd[k.replace("q_proj", "k_proj")],
                sd[k.replace("q_proj", "v_proj")]], axis=0)
        elif ".k_proj." in k or ".v_proj." in k:
            continue
        else:
            bc[k] = v
    d = cfg.to_dict(); d["architectures"] = ["BaichuanForCausalLM"]
    model = build_model(d, dtype=jnp.float32)
    params = model.load_hf_state_dict(bc)
    np.testing.assert_allclose(_logits(model, params), hf_logits,
                               rtol=3e-4, atol=3e-4)


def test_internlm2_wqkv_layout_matches_llama():
    cfg, hf, sd = _llama_ref(19, kv_heads=2)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(IDS)).logits[0].float().numpy()
    kv, group, dh = 2, 2, 16
    im = {}
    for k, v in sd.items():
        if k == "model.embed_tokens.weight":
            im["model.tok_embeddings.weight"] = v
        elif k == "lm_head.weight":
            im["output.weight"] = v
        elif ".self_attn.q_proj.weight" in k:
            q = v.reshape(kv, group, dh, -1)
            kk = sd[k.replace("q_proj", "k_proj")].reshape(kv, 1, dh, -1)
            vv = sd[k.replace("q_proj", "v_proj")].reshape(kv, 1, dh, -1)
            fused = np.concatenate([q, kk, vv], axis=1)
            im[k.replace(".self_attn.q_proj.", ".attention.wqkv.")] = \
                fused.reshape(kv * (group + 2) * dh, -1)
        elif ".k_proj." in k or ".v_proj." in k:
            continue
        else:
            k2 = (k.replace(".self_attn.o_proj.", ".attention.wo.")
                  .replace(".mlp.gate_proj.", ".feed_forward.w1.")
                  .replace(".mlp.up_proj.", ".feed_forward.w3.")
                  .replace(".mlp.down_proj.", ".feed_forward.w2.")
                  .replace(".input_layernorm.", ".attention_norm.")
                  .replace(".post_attention_layernorm.", ".ffn_norm."))
            im[k2] = v
    d = cfg.to_dict(); d["architectures"] = ["InternLM2ForCausalLM"]
    model = build_model(d, dtype=jnp.float32)
    params = model.load_hf_state_dict(im)
    np.testing.assert_allclose(_logits(model, params), hf_logits,
                               rtol=3e-4, atol=3e-4)


def test_new_families_e2e_generation():
    """One engine-level smoke per new decoder shape (parallel residual,
    layernorm, ungated MLP, partial/interleaved rope) with eviction on."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = {"architectures": ["GPTNeoXForCausalLM"], "vocab_size": 128,
           "hidden_size": 64, "intermediate_size": 128,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "rotary_pct": 0.25, "use_parallel_residual": True,
           "layer_norm_eps": 1e-5, "max_position_embeddings": 512,
           "tie_word_embeddings": True, "eos_token_id": None}
    llm = LLM(hf_config=cfg, dtype="float32", enable_paged_eviction=True,
              evict_method="global", cache_budget=64, block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0)
    outs = llm.generate(prompt_token_ids=[list(range(1, 100))],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=16))
    assert len(outs[0].outputs[0].token_ids) == 16


def test_qwen2_moe_logits_match_hf():
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, shared_expert_intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    torch.manual_seed(20)
    hf = transformers.Qwen2MoeForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["Qwen2MoeForCausalLM"]
    _check_parity(hf, d)


def test_qwen3_moe_logits_match_hf():
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    torch.manual_seed(21)
    hf = transformers.Qwen3MoeForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["Qwen3MoeForCausalLM"]
    _check_parity(hf, d)
