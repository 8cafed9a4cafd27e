"""Model-zoo batch 5: OLMoE (HF logit parity), Qwen v1 (checkpoint-layout
conversion checked against the equivalent Qwen2-named load), DeepSeek V1
MoE (generic-trunk dense prefix + ungated plural shared experts vs an
independent jnp reference), and the llama-named registry aliases
(Aquila/Xverse/InternLM/StableLM-Epoch/QuantMixtral — reference
vllm/model_executor/models/registry.py maps them onto the same impls).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.registry import (build_model,
                                                        supported_architectures)
from vllm_paged_compression_tpu.ops.attention import prefill_attention

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vllm_paged_compression_tpu.models.weights import (  # noqa: E402
    torch_state_dict_to_numpy)

IDS = np.array([[1, 5, 9, 33, 77, 2, 4, 100, 62, 11]])


def _forward_logits(model, params, ids):
    t = ids.shape[1]
    scale = model.arch.attn_scale

    def attn(q, k, v, state):
        return prefill_attention(q, k, v, scale, q.shape[0]), state

    hidden, _ = model.forward_hidden(params, jnp.array(ids[0]),
                                     jnp.arange(t), attn)
    return np.asarray(model.logits(params, hidden))


def _check_parity(hf, cfg_dict, ids=IDS, rtol=3e-4, atol=3e-4):
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits[0].float().numpy()
    model = build_model(cfg_dict, dtype=jnp.float32)
    params = model.load_hf_state_dict(
        torch_state_dict_to_numpy(hf.state_dict()))
    ours = _forward_logits(model, params, ids)
    np.testing.assert_allclose(ours, hf_logits, rtol=rtol, atol=atol)
    return model


def test_olmoe_logits_match_hf():
    cfg = transformers.OlmoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        clip_qkv=None, tie_word_embeddings=False)
    torch.manual_seed(30)
    hf = transformers.OlmoeForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["OlmoeForCausalLM"]
    _check_parity(hf, d)


def test_olmoe_clip_qkv():
    cfg = transformers.OlmoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        clip_qkv=0.02, tie_word_embeddings=False)
    torch.manual_seed(31)
    hf = transformers.OlmoeForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["OlmoeForCausalLM"]
    _check_parity(hf, d)


def _qwen_v1_state_dict(rng, L, D, H, FF2, V):
    """Random tensors under HF Qwen v1 naming (modeling_qwen.py layout:
    fused biased c_attn; mlp w1/w2/c_proj with gate = w2)."""
    sd = {"transformer.wte.weight": rng.standard_normal((V, D)) * 0.05,
          "transformer.ln_f.weight": 1 + rng.standard_normal(D) * 0.01,
          "lm_head.weight": rng.standard_normal((V, D)) * 0.05}
    for i in range(L):
        p = f"transformer.h.{i}."
        sd[p + "ln_1.weight"] = 1 + rng.standard_normal(D) * 0.01
        sd[p + "ln_2.weight"] = 1 + rng.standard_normal(D) * 0.01
        sd[p + "attn.c_attn.weight"] = rng.standard_normal((3 * D, D)) * .05
        sd[p + "attn.c_attn.bias"] = rng.standard_normal(3 * D) * 0.05
        sd[p + "attn.c_proj.weight"] = rng.standard_normal((D, D)) * 0.05
        sd[p + "mlp.w1.weight"] = rng.standard_normal((FF2, D)) * 0.05
        sd[p + "mlp.w2.weight"] = rng.standard_normal((FF2, D)) * 0.05
        sd[p + "mlp.c_proj.weight"] = rng.standard_normal((D, FF2)) * 0.05
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_qwen_v1_layout_matches_qwen2():
    """Loading a Qwen-v1-named checkpoint must equal loading the same
    values renamed by hand into Qwen2/Llama naming (gate = w2, up = w1,
    c_attn split into thirds)."""
    L, D, H, FF2, V = 2, 64, 4, 96, 128
    rng = np.random.default_rng(32)
    sd = _qwen_v1_state_dict(rng, L, D, H, FF2, V)

    qwen_cfg = {"architectures": ["QWenLMHeadModel"], "vocab_size": V,
                "hidden_size": D, "intermediate_size": 2 * FF2,
                "num_hidden_layers": L, "num_attention_heads": H,
                "layer_norm_epsilon": 1e-6, "seq_length": 128}
    m1 = build_model(qwen_cfg, dtype=jnp.float32)
    p1 = m1.load_hf_state_dict(dict(sd))

    lsd = {"model.embed_tokens.weight": sd["transformer.wte.weight"],
           "model.norm.weight": sd["transformer.ln_f.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(L):
        src = f"transformer.h.{i}."
        dst = f"model.layers.{i}."
        lsd[dst + "input_layernorm.weight"] = sd[src + "ln_1.weight"]
        lsd[dst + "post_attention_layernorm.weight"] = \
            sd[src + "ln_2.weight"]
        ca = sd[src + "attn.c_attn.weight"]
        cb = sd[src + "attn.c_attn.bias"]
        for j, name in enumerate(("q", "k", "v")):
            lsd[dst + f"self_attn.{name}_proj.weight"] = \
                ca[j * D:(j + 1) * D]
            lsd[dst + f"self_attn.{name}_proj.bias"] = \
                cb[j * D:(j + 1) * D]
        lsd[dst + "self_attn.o_proj.weight"] = sd[src +
                                                  "attn.c_proj.weight"]
        lsd[dst + "mlp.gate_proj.weight"] = sd[src + "mlp.w2.weight"]
        lsd[dst + "mlp.up_proj.weight"] = sd[src + "mlp.w1.weight"]
        lsd[dst + "mlp.down_proj.weight"] = sd[src + "mlp.c_proj.weight"]

    qwen2_cfg = {"architectures": ["Qwen2ForCausalLM"], "vocab_size": V,
                 "hidden_size": D, "intermediate_size": FF2,
                 "num_hidden_layers": L, "num_attention_heads": H,
                 "num_key_value_heads": H, "rms_norm_eps": 1e-6,
                 "max_position_embeddings": 128,
                 "tie_word_embeddings": False}
    m2 = build_model(qwen2_cfg, dtype=jnp.float32)
    p2 = m2.load_hf_state_dict(lsd)

    out1 = _forward_logits(m1, p1, IDS)
    out2 = _forward_logits(m2, p2, IDS)
    np.testing.assert_allclose(out1, out2, rtol=1e-6, atol=1e-6)


DSV1 = {
    "architectures": ["DeepseekForCausalLM"], "vocab_size": 128,
    "hidden_size": 64, "intermediate_size": 96, "num_hidden_layers": 3,
    "num_attention_heads": 4, "num_key_value_heads": 4,
    "max_position_embeddings": 128, "rope_theta": 10000.0,
    "rms_norm_eps": 1e-6, "n_routed_experts": 4, "num_experts_per_tok": 2,
    "moe_intermediate_size": 32, "n_shared_experts": 2,
    "first_k_dense_replace": 1, "norm_topk_prob": False,
    "tie_word_embeddings": False,
}


def _dsv1_state_dict(rng):
    c = DSV1
    D, FF, MI = c["hidden_size"], c["intermediate_size"], \
        c["moe_intermediate_size"]
    E, NS = c["n_routed_experts"], c["n_shared_experts"]
    V = c["vocab_size"]

    def w(*s):
        return np.asarray(rng.standard_normal(s) * 0.05, np.float32)

    sd = {"model.embed_tokens.weight": w(V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": w(V, D)}
    for i in range(c["num_hidden_layers"]):
        p = f"model.layers.{i}."
        for nm in ("q", "k", "v"):
            sd[p + f"self_attn.{nm}_proj.weight"] = w(D, D)
        sd[p + "self_attn.o_proj.weight"] = w(D, D)
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        if i < c["first_k_dense_replace"]:
            sd[p + "mlp.gate_proj.weight"] = w(FF, D)
            sd[p + "mlp.up_proj.weight"] = w(FF, D)
            sd[p + "mlp.down_proj.weight"] = w(D, FF)
        else:
            sd[p + "mlp.gate.weight"] = w(E, D)
            for e in range(E):
                sd[p + f"mlp.experts.{e}.gate_proj.weight"] = w(MI, D)
                sd[p + f"mlp.experts.{e}.up_proj.weight"] = w(MI, D)
                sd[p + f"mlp.experts.{e}.down_proj.weight"] = w(D, MI)
            sd[p + "mlp.shared_experts.gate_proj.weight"] = w(NS * MI, D)
            sd[p + "mlp.shared_experts.up_proj.weight"] = w(NS * MI, D)
            sd[p + "mlp.shared_experts.down_proj.weight"] = w(D, NS * MI)
    return sd


def _dsv1_reference_logits(sd, ids):
    """Independent numpy/jnp re-implementation of the DeepSeek V1 forward
    (HF modeling_deepseek: llama attention; MoE = softmax-then-top2 routed
    experts + ungated shared experts added to the residual path)."""
    from vllm_paged_compression_tpu.ops.rope import apply_rope, rope_cos_sin
    c = DSV1
    D, H = c["hidden_size"], c["num_attention_heads"]
    hd = D // H
    t = len(ids)

    def rms(x, g, eps=1e-6):
        x = np.asarray(x, np.float32)
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

    def silu(x):
        return x / (1 + np.exp(-x))

    h = sd["model.embed_tokens.weight"][ids]
    cos, sin = rope_cos_sin(jnp.arange(t), hd, c["rope_theta"])
    for i in range(c["num_hidden_layers"]):
        p = f"model.layers.{i}."
        x = rms(h, sd[p + "input_layernorm.weight"])
        q = (x @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, H, hd)
        k = (x @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, H, hd)
        v = (x @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, H, hd)
        q, k = apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin)
        q, k = np.asarray(q), np.asarray(k)
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(hd)
        mask = np.tril(np.ones((t, t), bool))
        scores = np.where(mask, scores, -1e30)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        attn = np.einsum("hts,shd->thd", probs, v).reshape(t, D)
        h = h + attn @ sd[p + "self_attn.o_proj.weight"].T
        x = rms(h, sd[p + "post_attention_layernorm.weight"])
        if i < c["first_k_dense_replace"]:
            g = x @ sd[p + "mlp.gate_proj.weight"].T
            u = x @ sd[p + "mlp.up_proj.weight"].T
            h = h + (silu(g) * u) @ sd[p + "mlp.down_proj.weight"].T
        else:
            logits = x @ sd[p + "mlp.gate.weight"].T
            e_probs = np.exp(logits - logits.max(-1, keepdims=True))
            e_probs /= e_probs.sum(-1, keepdims=True)
            order = np.argsort(-e_probs, axis=-1)
            topi = order[:, :c["num_experts_per_tok"]]
            topw = np.take_along_axis(e_probs, topi, axis=-1)
            out = np.zeros_like(x)
            for tok in range(t):
                for j in range(c["num_experts_per_tok"]):
                    e = topi[tok, j]
                    pe = f"mlp.experts.{e}."
                    g = x[tok] @ sd[p + pe + "gate_proj.weight"].T
                    u = x[tok] @ sd[p + pe + "up_proj.weight"].T
                    out[tok] += topw[tok, j] * (
                        (silu(g) * u) @ sd[p + pe + "down_proj.weight"].T)
            g = x @ sd[p + "mlp.shared_experts.gate_proj.weight"].T
            u = x @ sd[p + "mlp.shared_experts.up_proj.weight"].T
            out = out + (silu(g) * u) @ \
                sd[p + "mlp.shared_experts.down_proj.weight"].T
            h = h + out
    h = rms(h, sd["model.norm.weight"])
    return h @ sd["lm_head.weight"].T


def test_deepseek_v1_moe_matches_reference():
    rng = np.random.default_rng(33)
    sd = _dsv1_state_dict(rng)
    model = build_model(DSV1, dtype=jnp.float32)
    params = model.load_hf_state_dict(dict(sd))
    ours = _forward_logits(model, params, IDS)
    want = _dsv1_reference_logits(sd, IDS[0])
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)


def test_deepseek_v1_random_init_runs():
    model = build_model(DSV1, dtype=jnp.float32)
    params = model.init_params(seed=0)
    out = _forward_logits(model, params, IDS)
    assert out.shape == (IDS.shape[1], DSV1["vocab_size"])
    assert np.isfinite(out).all()


def test_llama_alias_archs_build_and_match():
    """Aliases load the identical llama trunk: logits equal."""
    base = {"vocab_size": 128, "hidden_size": 64, "intermediate_size": 96,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "max_position_embeddings": 128,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
            "tie_word_embeddings": True}
    want = None
    for arch in ("LlamaForCausalLM", "LLaMAForCausalLM",
                 "AquilaForCausalLM", "XverseForCausalLM"):
        model = build_model({**base, "architectures": [arch]},
                            dtype=jnp.float32)
        params = model.init_params(seed=5)
        out = _forward_logits(model, params, IDS)
        if want is None:
            want = out
        else:
            np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


def test_internlm_v1_bias_flags():
    cfg = {"architectures": ["InternLMForCausalLM"], "vocab_size": 128,
           "hidden_size": 64, "intermediate_size": 96,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 4, "bias": True,
           "max_position_embeddings": 128, "rms_norm_eps": 1e-5,
           "tie_word_embeddings": True}
    model = build_model(cfg, dtype=jnp.float32)
    assert model.arch.qkv_bias and model.arch.o_bias
    params = model.init_params(seed=1)
    assert "bqkv" in params["layers"] and "bo" in params["layers"]
    out = _forward_logits(model, params, IDS)
    assert np.isfinite(out).all()


def test_stablelm_epoch_config_keys():
    cfg = {"architectures": ["StableLMEpochForCausalLM"],
           "vocab_size": 128, "hidden_size": 64, "intermediate_size": 96,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 4, "rope_pct": 0.25, "norm_eps": 1e-5,
           "max_position_embeddings": 128, "tie_word_embeddings": False}
    model = build_model(cfg, dtype=jnp.float32)
    assert model.arch.partial_rotary_factor == 0.25
    assert model.arch.norm_type == "layernorm"


def test_new_archs_listed_as_supported():
    archs = supported_architectures()
    for name in ("OlmoeForCausalLM", "DeepseekForCausalLM",
                 "QWenLMHeadModel", "AquilaForCausalLM",
                 "XverseForCausalLM", "InternLMForCausalLM",
                 "StableLMEpochForCausalLM", "QuantMixtralForCausalLM"):
        assert name in archs, name


def test_olmoe_e2e_generation():
    """OLMoE through the serving engine with eviction on."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = {"architectures": ["OlmoeForCausalLM"], "vocab_size": 128,
           "hidden_size": 64, "intermediate_size": 32,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "num_experts": 4,
           "num_experts_per_tok": 2, "norm_topk_prob": True,
           "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
           "max_position_embeddings": 512,
           "tie_word_embeddings": False, "eos_token_id": None}
    llm = LLM(hf_config=cfg, dtype="float32", block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0,
              enable_paged_eviction=True, evict_method="streamingLLM",
              cache_budget=128)
    outs = llm.generate(
        prompt_token_ids=[list(range(1, 80))],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=24,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 24


def test_deepseek_v1_e2e_generation():
    """Dense-prefix generic trunk through the engine (carry state mode)."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = {**DSV1, "eos_token_id": None}
    llm = LLM(hf_config=cfg, dtype="float32", block_size=16,
              max_model_len=256, num_device_blocks=32, seed=0)
    outs = llm.generate(
        prompt_token_ids=[list(range(1, 50)), list(range(20, 60))],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=16,
                                       ignore_eos=True))
    for o in outs:
        assert len(o.outputs[0].token_ids) == 16
