"""Model-zoo batch 6: Persimmon + PhiMoE (HF logit parity), ChatGLM /
TeleChat2 (checkpoint-layout conversion), MiniCPM3 (MLA + μ-param scales
vs an independent jnp reference), DeciLM (variable GQA degrouped to
uniform max-KV).  Reference analogs:
vllm/model_executor/models/{persimmon,phimoe,chatglm,telechat2,minicpm3,
decilm}.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.registry import build_model
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


def test_persimmon_logits_match_hf():
    cfg = transformers.PersimmonConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        qk_layernorm=True, layer_norm_eps=1e-5,
        tie_word_embeddings=False)
    torch.manual_seed(50)
    hf = transformers.PersimmonForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["PersimmonForCausalLM"]
    model = _check_parity(hf, d)
    assert model.arch.qk_norm_type == "layernorm"


def test_phimoe_logits_match_hf():
    cfg = transformers.PhimoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, router_jitter_noise=0.01,
        input_jitter_noise=0.0, max_position_embeddings=128,
        sliding_window=None, rope_scaling=None,
        tie_word_embeddings=False)
    torch.manual_seed(51)
    hf = transformers.PhimoeForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["PhimoeForCausalLM"]
    model = _check_parity(hf, d)
    assert model.arch.moe_routing == "sparsemixer"


CHATGLM_CFG = {
    "architectures": ["ChatGLMModel"], "padded_vocab_size": 128,
    "hidden_size": 64, "ffn_hidden_size": 96, "num_layers": 2,
    "num_attention_heads": 4, "multi_query_attention": True,
    "multi_query_group_num": 2, "kv_channels": 16, "rmsnorm": True,
    "add_qkv_bias": True, "add_bias_linear": False,
    "layernorm_epsilon": 1e-5, "rope_ratio": 1.0, "seq_length": 512,
}


def _chatglm_state_dict(rng):
    c = CHATGLM_CFG
    D, H, G, d = c["hidden_size"], c["num_attention_heads"], \
        c["multi_query_group_num"], c["kv_channels"]
    FF, V = c["ffn_hidden_size"], c["padded_vocab_size"]

    def w(*s):
        return np.asarray(rng.standard_normal(s) * 0.05, np.float32)

    sd = {"transformer.embedding.word_embeddings.weight": w(V, D),
          "transformer.encoder.final_layernorm.weight":
              np.ones(D, np.float32),
          "transformer.output_layer.weight": w(V, D)}
    qkv_out = (H + 2 * G) * d
    for i in range(c["num_layers"]):
        p = f"transformer.encoder.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "self_attention.query_key_value.weight"] = w(qkv_out, D)
        sd[p + "self_attention.query_key_value.bias"] = w(qkv_out)
        sd[p + "self_attention.dense.weight"] = w(D, H * d)
        sd[p + "mlp.dense_h_to_4h.weight"] = w(2 * FF, D)
        sd[p + "mlp.dense_4h_to_h.weight"] = w(D, FF)
    return sd


def test_chatglm_layout_matches_canonical():
    rng = np.random.default_rng(52)
    sd = _chatglm_state_dict(rng)
    model = build_model(CHATGLM_CFG, dtype=jnp.float32)
    a = model.arch
    assert a.num_kv_heads == 2 and a.head_dim == 16
    assert a.partial_rotary_factor == 0.5 and a.rope_interleaved
    p1 = model.load_hf_state_dict(dict(sd))

    c = CHATGLM_CFG
    D, H, G, d, FF = 64, 4, 2, 16, 96
    canon = {"model.embed_tokens.weight":
             sd["transformer.embedding.word_embeddings.weight"],
             "model.norm.weight":
             sd["transformer.encoder.final_layernorm.weight"],
             "lm_head.weight": sd["transformer.output_layer.weight"]}
    for i in range(c["num_layers"]):
        src = f"transformer.encoder.layers.{i}."
        dst = f"model.layers.{i}."
        canon[dst + "input_layernorm.weight"] = \
            sd[src + "input_layernorm.weight"]
        canon[dst + "post_attention_layernorm.weight"] = \
            sd[src + "post_attention_layernorm.weight"]
        qkv_w = sd[src + "self_attention.query_key_value.weight"]
        qkv_b = sd[src + "self_attention.query_key_value.bias"]
        canon[dst + "self_attn.q_proj.weight"] = qkv_w[:H * d]
        canon[dst + "self_attn.q_proj.bias"] = qkv_b[:H * d]
        canon[dst + "self_attn.k_proj.weight"] = qkv_w[H * d:(H + G) * d]
        canon[dst + "self_attn.k_proj.bias"] = qkv_b[H * d:(H + G) * d]
        canon[dst + "self_attn.v_proj.weight"] = qkv_w[(H + G) * d:]
        canon[dst + "self_attn.v_proj.bias"] = qkv_b[(H + G) * d:]
        canon[dst + "self_attn.o_proj.weight"] = \
            sd[src + "self_attention.dense.weight"]
        gu = sd[src + "mlp.dense_h_to_4h.weight"]
        canon[dst + "mlp.gate_proj.weight"] = gu[:FF]
        canon[dst + "mlp.up_proj.weight"] = gu[FF:]
        canon[dst + "mlp.down_proj.weight"] = \
            sd[src + "mlp.dense_4h_to_h.weight"]
    p2 = model.load_hf_state_dict(canon)
    np.testing.assert_allclose(_forward_logits(model, p1, IDS),
                               _forward_logits(model, p2, IDS),
                               rtol=1e-6, atol=1e-6)


def test_telechat2_layout():
    """key_value per-head (k, v) interleave de-grouped correctly; biases
    only on o_proj + down_proj."""
    L, D, H, FF, V = 2, 64, 4, 96, 128
    d = D // H
    rng = np.random.default_rng(53)

    def w(*s):
        return np.asarray(rng.standard_normal(s) * 0.05, np.float32)

    sd = {"transformer.word_embeddings.weight": w(V, D),
          "transformer.ln_f.weight": np.ones(D, np.float32),
          "lm_head.weight": w(V, D)}
    for i in range(L):
        p = f"transformer.h.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "self_attention.query.weight"] = w(D, D)
        sd[p + "self_attention.key_value.weight"] = w(2 * D, D)
        sd[p + "self_attention.dense.weight"] = w(D, D)
        sd[p + "self_attention.dense.bias"] = w(D)
        sd[p + "mlp.gate_proj.weight"] = w(FF, D)
        sd[p + "mlp.up_proj.weight"] = w(FF, D)
        sd[p + "mlp.down_proj.weight"] = w(D, FF)
        sd[p + "mlp.down_proj.bias"] = w(D)
    cfg = {"architectures": ["TeleChat2ForCausalLM"], "vocab_size": V,
           "hidden_size": D, "ffn_hidden_size": FF, "n_layer": L,
           "n_head": H, "layer_norm_epsilon": 1e-5, "seq_length": 128,
           "tie_word_embeddings": False}
    model = build_model(cfg, dtype=jnp.float32)
    assert model.arch.o_bias and model.arch.mlp_down_bias \
        and not model.arch.qkv_bias
    p1 = model.load_hf_state_dict(dict(sd))

    canon = {"model.embed_tokens.weight":
             sd["transformer.word_embeddings.weight"],
             "model.norm.weight": sd["transformer.ln_f.weight"],
             "lm_head.weight": sd["lm_head.weight"]}
    for i in range(L):
        src, dst = f"transformer.h.{i}.", f"model.layers.{i}."
        canon[dst + "input_layernorm.weight"] = \
            sd[src + "input_layernorm.weight"]
        canon[dst + "post_attention_layernorm.weight"] = \
            sd[src + "post_attention_layernorm.weight"]
        canon[dst + "self_attn.q_proj.weight"] = \
            sd[src + "self_attention.query.weight"]
        kv = sd[src + "self_attention.key_value.weight"].reshape(
            H, 2, d, D)
        canon[dst + "self_attn.k_proj.weight"] = \
            kv[:, 0].reshape(D, D)
        canon[dst + "self_attn.v_proj.weight"] = \
            kv[:, 1].reshape(D, D)
        canon[dst + "self_attn.o_proj.weight"] = \
            sd[src + "self_attention.dense.weight"]
        canon[dst + "self_attn.o_proj.bias"] = \
            sd[src + "self_attention.dense.bias"]
        for nm in ("gate_proj", "up_proj", "down_proj"):
            canon[dst + f"mlp.{nm}.weight"] = sd[src + f"mlp.{nm}.weight"]
        canon[dst + "mlp.down_proj.bias"] = sd[src + "mlp.down_proj.bias"]
    p2 = model.load_hf_state_dict(canon)
    np.testing.assert_allclose(_forward_logits(model, p1, IDS),
                               _forward_logits(model, p2, IDS),
                               rtol=1e-6, atol=1e-6)


MINICPM3_CFG = {
    "architectures": ["MiniCPM3ForCausalLM"], "vocab_size": 128,
    "hidden_size": 64, "intermediate_size": 96, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 4,
    "qk_nope_head_dim": 16, "qk_rope_head_dim": 8, "v_head_dim": 16,
    "q_lora_rank": 32, "kv_lora_rank": 24, "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0, "max_position_embeddings": 256,
    "scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 32,
    "tie_word_embeddings": False,
}


def _minicpm3_state_dict(rng):
    c = MINICPM3_CFG
    D, H = c["hidden_size"], c["num_attention_heads"]
    nope, rope = c["qk_nope_head_dim"], c["qk_rope_head_dim"]
    vd, qlr, kvlr = c["v_head_dim"], c["q_lora_rank"], c["kv_lora_rank"]
    FF, V = c["intermediate_size"], c["vocab_size"]
    qk = nope + rope

    def w(*s):
        return np.asarray(rng.standard_normal(s) * 0.05, np.float32)

    sd = {"model.embed_tokens.weight": w(V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": w(V, D)}
    for i in range(c["num_hidden_layers"]):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_a_proj.weight"] = w(qlr, D)
        sd[p + "self_attn.q_a_layernorm.weight"] = np.ones(qlr, np.float32)
        sd[p + "self_attn.q_b_proj.weight"] = w(H * qk, qlr)
        sd[p + "self_attn.kv_a_proj_with_mqa.weight"] = w(kvlr + rope, D)
        sd[p + "self_attn.kv_a_layernorm.weight"] = \
            np.ones(kvlr, np.float32)
        sd[p + "self_attn.kv_b_proj.weight"] = w(H * (nope + vd), kvlr)
        sd[p + "self_attn.o_proj.weight"] = w(D, H * vd)
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "mlp.gate_proj.weight"] = w(FF, D)
        sd[p + "mlp.up_proj.weight"] = w(FF, D)
        sd[p + "mlp.down_proj.weight"] = w(D, FF)
    return sd


def _minicpm3_reference_logits(sd, ids):
    """Independent jnp re-implementation (MiniCPM3 modeling: MLA with
    neox-style rope on the decoupled dims + μ-param scalings)."""
    from vllm_paged_compression_tpu.ops.rope import apply_rope, rope_cos_sin
    c = MINICPM3_CFG
    D, H = c["hidden_size"], c["num_attention_heads"]
    nope, rope = c["qk_nope_head_dim"], c["qk_rope_head_dim"]
    vd, L = c["v_head_dim"], c["num_hidden_layers"]
    qk = nope + rope
    t = len(ids)

    def rms(x, g, eps=1e-6):
        x = np.asarray(x, np.float32)
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

    def silu(x):
        return x / (1 + np.exp(-x))

    h = sd["model.embed_tokens.weight"][ids] * c["scale_emb"]
    res_mult = c["scale_depth"] / np.sqrt(L)
    cos, sin = rope_cos_sin(jnp.arange(t), rope, c["rope_theta"])
    for i in range(L):
        p = f"model.layers.{i}."
        x = rms(h, sd[p + "input_layernorm.weight"])
        qa = rms(x @ sd[p + "self_attn.q_a_proj.weight"].T,
                 sd[p + "self_attn.q_a_layernorm.weight"])
        q = (qa @ sd[p + "self_attn.q_b_proj.weight"].T).reshape(t, H, qk)
        ckv = x @ sd[p + "self_attn.kv_a_proj_with_mqa.weight"].T
        latent = rms(ckv[:, :c["kv_lora_rank"]],
                     sd[p + "self_attn.kv_a_layernorm.weight"])
        kvb = (latent @ sd[p + "self_attn.kv_b_proj.weight"].T).reshape(
            t, H, nope + vd)
        q_pe, k_pe = apply_rope(jnp.asarray(q[..., nope:]),
                                jnp.asarray(ckv[:, None,
                                                c["kv_lora_rank"]:]),
                                cos, sin, interleaved=False)
        q = np.concatenate([q[..., :nope], np.asarray(q_pe)], -1)
        k = np.concatenate(
            [kvb[..., :nope],
             np.broadcast_to(np.asarray(k_pe), (t, H, rope))], -1)
        v = kvb[..., nope:]
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(qk)
        mask = np.tril(np.ones((t, t), bool))
        scores = np.where(mask, scores, -1e30)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        attn = np.einsum("hts,shd->thd", probs, v).reshape(t, H * vd)
        h = h + attn @ sd[p + "self_attn.o_proj.weight"].T * res_mult
        x = rms(h, sd[p + "post_attention_layernorm.weight"])
        g = x @ sd[p + "mlp.gate_proj.weight"].T
        u = x @ sd[p + "mlp.up_proj.weight"].T
        h = h + (silu(g) * u) @ sd[p + "mlp.down_proj.weight"].T * res_mult
    h = rms(h, sd["model.norm.weight"])
    return (h * (c["dim_model_base"] / D)) @ sd["lm_head.weight"].T


def test_minicpm3_matches_reference():
    rng = np.random.default_rng(54)
    sd = _minicpm3_state_dict(rng)
    model = build_model(MINICPM3_CFG, dtype=jnp.float32)
    assert model.arch.attn_type == "mla"
    assert not model.arch.rope_interleaved
    params = model.load_hf_state_dict(dict(sd))
    ours = _forward_logits(model, params, IDS)
    want = _minicpm3_reference_logits(sd, IDS[0])
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)


def test_decilm_degroup_matches_uniform():
    """Per-layer KV heads [1, 2] degrouped by replication == the manually
    replicated uniform-KV llama checkpoint."""
    L, D, H, FF, V = 2, 64, 4, 96, 128
    d = D // H
    per_layer = [1, 2]
    rng = np.random.default_rng(55)

    def w(*s):
        return np.asarray(rng.standard_normal(s) * 0.05, np.float32)

    sd = {"model.embed_tokens.weight": w(V, D),
          "model.norm.weight": np.ones(D, np.float32),
          "lm_head.weight": w(V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        kvh = per_layer[i]
        sd[p + "self_attn.q_proj.weight"] = w(D, D)
        sd[p + "self_attn.k_proj.weight"] = w(kvh * d, D)
        sd[p + "self_attn.v_proj.weight"] = w(kvh * d, D)
        sd[p + "self_attn.o_proj.weight"] = w(D, D)
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "mlp.gate_proj.weight"] = w(FF, D)
        sd[p + "mlp.up_proj.weight"] = w(FF, D)
        sd[p + "mlp.down_proj.weight"] = w(D, FF)
    deci_cfg = {"architectures": ["DeciLMForCausalLM"], "vocab_size": V,
                "hidden_size": D, "intermediate_size": FF,
                "num_hidden_layers": L, "num_attention_heads": H,
                "num_key_value_heads_per_layer": per_layer,
                "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
                "tie_word_embeddings": False}
    m1 = build_model(deci_cfg, dtype=jnp.float32)
    assert m1.arch.num_kv_heads == 2
    p1 = m1.load_hf_state_dict(dict(sd))

    sd2 = dict(sd)
    for i in range(L):
        p = f"model.layers.{i}."
        reps = 2 // per_layer[i]
        for nm in ("k_proj", "v_proj"):
            wgt = sd[p + f"self_attn.{nm}.weight"]
            sd2[p + f"self_attn.{nm}.weight"] = np.repeat(
                wgt.reshape(per_layer[i], d, D), reps, axis=0
            ).reshape(2 * d, D)
    llama_cfg = {"architectures": ["LlamaForCausalLM"], "vocab_size": V,
                 "hidden_size": D, "intermediate_size": FF,
                 "num_hidden_layers": L, "num_attention_heads": H,
                 "num_key_value_heads": 2, "rms_norm_eps": 1e-5,
                 "max_position_embeddings": 128,
                 "tie_word_embeddings": False}
    m2 = build_model(llama_cfg, dtype=jnp.float32)
    p2 = m2.load_hf_state_dict(sd2)
    np.testing.assert_allclose(_forward_logits(m1, p1, IDS),
                               _forward_logits(m2, p2, IDS),
                               rtol=1e-6, atol=1e-6)


def test_chatglm_e2e_generation():
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = {**CHATGLM_CFG, "eos_token_id": None}
    llm = LLM(hf_config=cfg, dtype="float32", block_size=16,
              max_model_len=256, num_device_blocks=32, seed=0,
              enable_paged_eviction=True, evict_method="streamingLLM",
              cache_budget=128)
    outs = llm.generate(
        prompt_token_ids=[list(range(1, 70))],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=16,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 16


def test_minicpm3_e2e_generation():
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = {**MINICPM3_CFG, "eos_token_id": None}
    llm = LLM(hf_config=cfg, dtype="float32", block_size=16,
              max_model_len=256, num_device_blocks=32, seed=0)
    outs = llm.generate(
        prompt_token_ids=[list(range(1, 50))],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=12,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 12
