"""Logit parity vs HuggingFace for model-zoo batch 3: OLMo, OLMo2,
Granite, GraniteMoe, Nemotron, GLM, GLM-4 (direct transformers
comparison), plus ExaONE (checkpoint-rename check against an equivalent
Llama) and MiniCPM (μ-param scaling plumbing).

Reference analog: vllm/model_executor/models/{olmo,olmo2,granite,
granitemoe,nemotron,glm,glm4,exaone,minicpm,orion,solar}.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.models.weights import (
    torch_state_dict_to_numpy)
from vllm_paged_compression_tpu.ops.attention import prefill_attention

from test_hf_parity_extended import _check_parity, IDS  # same test dir

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_olmo_logits_match_hf():
    cfg = transformers.OlmoConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        clip_qkv=0.2, tie_word_embeddings=True)
    torch.manual_seed(20)
    hf = transformers.OlmoForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["OlmoForCausalLM"]
    _check_parity(hf, d)


def test_olmo2_logits_match_hf():
    cfg = transformers.Olmo2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(21)
    hf = transformers.Olmo2ForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["Olmo2ForCausalLM"]
    _check_parity(hf, d)


def test_granite_logits_match_hf():
    cfg = transformers.GraniteConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        embedding_multiplier=12.0, attention_multiplier=0.03,
        residual_multiplier=0.22, logits_scaling=8.0,
        tie_word_embeddings=True)
    torch.manual_seed(22)
    hf = transformers.GraniteForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["GraniteForCausalLM"]
    _check_parity(hf, d)


def test_granitemoe_logits_match_hf():
    cfg = transformers.GraniteMoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=12.0, attention_multiplier=0.03,
        residual_multiplier=0.22, logits_scaling=8.0,
        tie_word_embeddings=True)
    torch.manual_seed(23)
    hf = transformers.GraniteMoeForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["GraniteMoeForCausalLM"]
    _check_parity(hf, d, rtol=1e-3, atol=1e-3)


def test_nemotron_logits_match_hf():
    cfg = transformers.NemotronConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, norm_eps=1e-5,
        partial_rotary_factor=0.5, hidden_act="relu2",
        tie_word_embeddings=False)
    torch.manual_seed(24)
    hf = transformers.NemotronForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["NemotronForCausalLM"]
    _check_parity(hf, d)


def test_glm_logits_match_hf():
    cfg = transformers.GlmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        partial_rotary_factor=0.5, attention_bias=True,
        pad_token_id=0, eos_token_id=1, bos_token_id=2,
        tie_word_embeddings=True)
    torch.manual_seed(25)
    hf = transformers.GlmForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["GlmForCausalLM"]
    _check_parity(hf, d)


def test_glm4_logits_match_hf():
    cfg = transformers.Glm4Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        partial_rotary_factor=0.5, attention_bias=True,
        pad_token_id=0, eos_token_id=1, bos_token_id=2,
        tie_word_embeddings=True)
    torch.manual_seed(26)
    hf = transformers.Glm4ForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["Glm4ForCausalLM"]
    _check_parity(hf, d)


def _llama_logits(cfg_dict, tensors, ids=IDS):
    model = build_model(cfg_dict, dtype=jnp.float32)
    params = model.load_hf_state_dict(tensors)
    t = ids.shape[1]
    scale = model.arch.attn_scale

    def attn(q, k, v, state):
        return prefill_attention(q, k, v, scale, q.shape[0]), state

    hidden, _ = model.forward_hidden(params, jnp.array(ids[0]),
                                     jnp.arange(t), attn)
    return np.asarray(model.logits(params, hidden))


def test_exaone_matches_equivalent_llama():
    """ExaONE = Llama under renamed keys: same weights through both paths
    must give identical logits."""
    lcfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(27)
    hf = transformers.LlamaForCausalLM(lcfg).eval()
    llama_sd = torch_state_dict_to_numpy(hf.state_dict())
    d = lcfg.to_dict(); d["architectures"] = ["LlamaForCausalLM"]
    want = _llama_logits(d, llama_sd)

    ren = {}
    for k, v in llama_sd.items():
        k = k.replace("model.embed_tokens.weight",
                      "transformer.wte.weight")
        k = k.replace("model.norm.", "transformer.ln_f.")
        k = k.replace("model.layers.", "transformer.h.")
        k = k.replace(".input_layernorm.", ".ln_1.")
        k = k.replace(".post_attention_layernorm.", ".ln_2.")
        k = k.replace(".self_attn.q_proj.", ".attn.attention.q_proj.")
        k = k.replace(".self_attn.k_proj.", ".attn.attention.k_proj.")
        k = k.replace(".self_attn.v_proj.", ".attn.attention.v_proj.")
        k = k.replace(".self_attn.o_proj.", ".attn.attention.out_proj.")
        k = k.replace(".mlp.gate_proj.", ".mlp.c_fc_0.")
        k = k.replace(".mlp.up_proj.", ".mlp.c_fc_1.")
        k = k.replace(".mlp.down_proj.", ".mlp.c_proj.")
        ren[k] = v
    ecfg = {"architectures": ["ExaoneForCausalLM"],
            "vocab_size": 128, "hidden_size": 64,
            "intermediate_size": 128, "num_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "max_position_embeddings": 128, "rope_theta": 10000.0,
            "layer_norm_epsilon": lcfg.rms_norm_eps,
            "activation_function": "silu", "tie_word_embeddings": False}
    got = _llama_logits(ecfg, ren)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_minicpm_scalings():
    """Neutral μ-param values reduce MiniCPM to plain Llama; non-neutral
    values must change the logits (the plumbing is live)."""
    lcfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=True)
    torch.manual_seed(28)
    hf = transformers.LlamaForCausalLM(lcfg).eval()
    sd = torch_state_dict_to_numpy(hf.state_dict())
    d = lcfg.to_dict(); d["architectures"] = ["LlamaForCausalLM"]
    want = _llama_logits(d, sd)

    base = dict(d)
    base["architectures"] = ["MiniCPMForCausalLM"]
    neutral = {**base, "scale_emb": 1.0, "scale_depth": 2.0 ** 0.5,
               "dim_model_base": 64}
    np.testing.assert_allclose(_llama_logits(neutral, sd), want,
                               rtol=1e-5, atol=1e-5)
    scaled = {**base, "scale_emb": 12.0, "scale_depth": 1.4,
              "dim_model_base": 16}
    got = _llama_logits(scaled, sd)
    assert not np.allclose(got, want, rtol=1e-2, atol=1e-2)


def test_orion_solar_build_and_run():
    """Arch smoke: Orion (LayerNorm+bias Llama) and Solar (plain Llama
    alias) construct, init, and produce finite logits."""
    for arch in ("OrionForCausalLM", "SolarForCausalLM"):
        cfg = {"architectures": [arch], "vocab_size": 64,
               "hidden_size": 32, "intermediate_size": 64,
               "num_hidden_layers": 2, "num_attention_heads": 4,
               "num_key_value_heads": 2, "max_position_embeddings": 64,
               "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
               "tie_word_embeddings": True}
        model = build_model(cfg, dtype=jnp.float32)
        params = model.init_params(0)
        scale = model.arch.attn_scale

        def attn(q, k, v, state):
            return prefill_attention(q, k, v, scale, q.shape[0]), state

        h, _ = model.forward_hidden(params, jnp.arange(8), jnp.arange(8),
                                    attn)
        logits = np.asarray(model.logits(params, h))
        assert np.isfinite(logits).all()


def test_dbrx_logits_match_hf():
    cfg = transformers.DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=128,
        vocab_size=128,
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0,
                     "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4,
                    "moe_top_k": 2, "moe_normalize_expert_weights": 1})
    torch.manual_seed(29)
    hf = transformers.DbrxForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["DbrxForCausalLM"]
    _check_parity(hf, d, rtol=1e-3, atol=1e-3)


class TestDeepseekV2:
    def _cfg(self, **kw):
        base = dict(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=128,
            rope_theta=10000.0, rms_norm_eps=1e-6,
            kv_lora_rank=32, q_lora_rank=None,
            qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=12,
            head_dim=24, n_routed_experts=4, moe_intermediate_size=48,
            num_experts_per_tok=2, n_shared_experts=None,
            first_k_dense_replace=3,    # == num_layers: all-dense stack
            tie_word_embeddings=False)
        base.update(kw)
        return transformers.DeepseekV2Config(**base)

    def test_mla_dense_logits_match_hf(self):
        cfg = self._cfg()
        torch.manual_seed(30)
        hf = transformers.DeepseekV2ForCausalLM(cfg).eval()
        d = cfg.to_dict(); d["architectures"] = ["DeepseekV2ForCausalLM"]
        _check_parity(hf, d)

    def test_mla_q_lora_logits_match_hf(self):
        cfg = self._cfg(q_lora_rank=24)
        torch.manual_seed(31)
        hf = transformers.DeepseekV2ForCausalLM(cfg).eval()
        d = cfg.to_dict(); d["architectures"] = ["DeepseekV2ForCausalLM"]
        _check_parity(hf, d)

    def test_moe_dense_prefix_logits_match_hf(self):
        cfg = self._cfg(n_shared_experts=2, first_k_dense_replace=1,
                        topk_method="greedy", routed_scaling_factor=1.5)
        torch.manual_seed(32)
        hf = transformers.DeepseekV2ForCausalLM(cfg).eval()
        d = cfg.to_dict(); d["architectures"] = ["DeepseekV2ForCausalLM"]
        _check_parity(hf, d, rtol=1e-3, atol=1e-3)

    def test_group_limited_greedy_logits_match_hf(self):
        cfg = self._cfg(n_routed_experts=8, first_k_dense_replace=0,
                        n_shared_experts=2,     # HF MoE requires them
                        topk_method="group_limited_greedy",
                        n_group=4, topk_group=2)
        torch.manual_seed(33)
        hf = transformers.DeepseekV2ForCausalLM(cfg).eval()
        d = cfg.to_dict(); d["architectures"] = ["DeepseekV2ForCausalLM"]
        _check_parity(hf, d, rtol=1e-3, atol=1e-3)

    def test_yarn_rope_logits_match_hf(self):
        cfg = self._cfg(rope_scaling={
            "rope_type": "yarn", "factor": 4.0,
            "original_max_position_embeddings": 32,
            "mscale": 0.707, "mscale_all_dim": 0.707,
            "beta_fast": 32.0, "beta_slow": 1.0})
        torch.manual_seed(34)
        hf = transformers.DeepseekV2ForCausalLM(cfg).eval()
        d = cfg.to_dict(); d["architectures"] = ["DeepseekV2ForCausalLM"]
        _check_parity(hf, d)


class TestDeepseekV3:
    def test_noaux_tc_logits_match_hf(self):
        cfg = transformers.DeepseekV3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=128,
            rope_theta=10000.0, rms_norm_eps=1e-6,
            kv_lora_rank=32, q_lora_rank=24,
            qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=12,
            head_dim=8,    # V3 config head_dim == the ROPE dim
            n_routed_experts=8, moe_intermediate_size=48,
            num_experts_per_tok=2, n_shared_experts=1,
            first_k_dense_replace=1, n_group=4, topk_group=2,
            norm_topk_prob=True, routed_scaling_factor=2.5,
            tie_word_embeddings=False)
        torch.manual_seed(35)
        hf = transformers.DeepseekV3ForCausalLM(cfg).eval()
        # the correction bias ships zero-initialized; perturb it so the
        # test actually exercises the bias-corrected selection
        with torch.no_grad():
            for layer in hf.model.layers[1:]:
                layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
        d = cfg.to_dict(); d["architectures"] = ["DeepseekV3ForCausalLM"]
        _check_parity(hf, d, rtol=1e-3, atol=1e-3)
