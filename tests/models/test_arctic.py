"""Snowflake Arctic: alternating dense/MoE layers with the use_residual
parallel MLP branch (reference vllm/model_executor/models/arctic.py).

No HF transformers class exists for Arctic (remote code), so parity is
checked against a numpy hand-rolled implementation of the reference layer
math (arctic.py:339-364), the same approach as the MiniCPM3/TeleChat2
tests.
"""

import numpy as np

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.ops.attention import prefill_attention
from vllm_paged_compression_tpu.ops.rope import apply_rope, rope_cos_sin

IDS = np.array([[1, 5, 9, 33, 77, 2, 4, 100, 62, 11]])

V, D, H, KVH, FF, E, TOPK = 128, 64, 4, 2, 96, 4, 2
HD = D // H


def _cfg(num_layers):
    return {"architectures": ["ArcticForCausalLM"], "vocab_size": V,
            "hidden_size": D, "intermediate_size": FF,
            "num_hidden_layers": num_layers, "num_attention_heads": H,
            "num_key_value_heads": KVH, "num_local_experts": E,
            "num_experts_per_tok": TOPK, "moe_layer_frequency": 2,
            "use_residual": True, "rms_norm_eps": 1e-5,
            "rope_theta": 10000.0, "max_position_embeddings": 128,
            "tie_word_embeddings": False}


def _state_dict(rng, num_layers):
    def w(*s):
        return np.asarray(rng.standard_normal(s) * 0.05, np.float32)

    sd = {"model.embed_tokens.weight": w(V, D),
          "model.norm.weight": np.ones(D, np.float32) + w(D) * 0.1,
          "lm_head.weight": w(V, D)}
    for i in range(num_layers):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = w(D, D)
        sd[p + "self_attn.k_proj.weight"] = w(KVH * HD, D)
        sd[p + "self_attn.v_proj.weight"] = w(KVH * HD, D)
        sd[p + "self_attn.o_proj.weight"] = w(D, D)
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32) + w(D) * 0.1
        sd[p + "post_attention_layernorm.weight"] = (
            np.ones(D, np.float32) + w(D) * 0.1)
        if (i + 1) % 2 == 0:   # MoE layer (arctic.py:307)
            sd[p + "block_sparse_moe.gate.weight"] = w(E, D)
            for e in range(E):
                sd[p + f"block_sparse_moe.experts.{e}.w1.weight"] = w(FF, D)
                sd[p + f"block_sparse_moe.experts.{e}.w3.weight"] = w(FF, D)
                sd[p + f"block_sparse_moe.experts.{e}.w2.weight"] = w(D, FF)
            sd[p + "residual_layernorm.weight"] = (
                np.ones(D, np.float32) + w(D) * 0.1)
            sd[p + "residual_mlp.w1.weight"] = w(D, D)
            sd[p + "residual_mlp.w3.weight"] = w(D, D)
            sd[p + "residual_mlp.w2.weight"] = w(D, D)
        else:                  # dense layer
            sd[p + "block_sparse_moe.mlp.w1.weight"] = w(FF, D)
            sd[p + "block_sparse_moe.mlp.w3.weight"] = w(FF, D)
            sd[p + "block_sparse_moe.mlp.w2.weight"] = w(D, FF)
    return sd


def _rms(x, g, eps=1e-5):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _attention(sd, p, x, t):
    cos, sin = rope_cos_sin(jnp.arange(t), HD, 10000.0)
    q = (x @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, H, HD)
    k = (x @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, KVH, HD)
    q, k = apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin)
    q, k = np.asarray(q), np.asarray(k)
    v = (x @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, KVH, HD)
    k = np.repeat(k, H // KVH, axis=1)
    v = np.repeat(v, H // KVH, axis=1)
    scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(HD)
    mask = np.tril(np.ones((t, t), bool))
    probs = _softmax(np.where(mask, scores, -1e30))
    attn = np.einsum("hts,shd->thd", probs, v).reshape(t, D)
    return attn @ sd[p + "self_attn.o_proj.weight"].T


def _moe(sd, p, x):
    # fused_topk (arctic.py:176-179): softmax over ALL experts, topk,
    # renormalize.
    probs = _softmax(x @ sd[p + "block_sparse_moe.gate.weight"].T)
    out = np.zeros_like(x)
    for row in range(x.shape[0]):
        top = np.argsort(-probs[row])[:TOPK]
        wts = probs[row][top]
        wts = wts / wts.sum()
        for e, wt in zip(top, wts):
            pe = p + f"block_sparse_moe.experts.{e}."
            g = x[row] @ sd[pe + "w1.weight"].T
            u = x[row] @ sd[pe + "w3.weight"].T
            out[row] += wt * ((_silu(g) * u) @ sd[pe + "w2.weight"].T)
    return out


def _reference_logits(sd, ids, num_layers):
    t = len(ids)
    h = sd["model.embed_tokens.weight"][ids]
    for i in range(num_layers):
        p = f"model.layers.{i}."
        x_in = h
        h = h + _attention(sd, p, _rms(h, sd[p + "input_layernorm.weight"]),
                           t)
        if (i + 1) % 2 == 0:   # MoE layer with use_residual
            rm = _rms(h, sd[p + "residual_layernorm.weight"])
            g = rm @ sd[p + "residual_mlp.w1.weight"].T
            u = rm @ sd[p + "residual_mlp.w3.weight"].T
            rm_out = (_silu(g) * u) @ sd[p + "residual_mlp.w2.weight"].T
            moe_in = _rms(x_in, sd[p + "post_attention_layernorm.weight"])
            h = h + rm_out + _moe(sd, p, moe_in)
        else:
            x = _rms(h, sd[p + "post_attention_layernorm.weight"])
            g = x @ sd[p + "block_sparse_moe.mlp.w1.weight"].T
            u = x @ sd[p + "block_sparse_moe.mlp.w3.weight"].T
            h = h + (_silu(g) * u) @ sd[p + "block_sparse_moe.mlp.w2"
                                        ".weight"].T
    h = _rms(h, sd["model.norm.weight"])
    return h @ sd["lm_head.weight"].T


def _forward_logits(model, params, ids):
    t = ids.shape[1]
    scale = model.arch.attn_scale

    def attn(q, k, v, state):
        return prefill_attention(q, k, v, scale, q.shape[0]), state

    hidden, _ = model.forward_hidden(params, jnp.array(ids[0]),
                                     jnp.arange(t), attn)
    return np.asarray(model.logits(params, hidden))


def test_arctic_matches_reference_even_layers():
    rng = np.random.default_rng(60)
    sd = _state_dict(rng, 4)
    model = build_model(_cfg(4), dtype=jnp.float32)
    assert model.arch.moe_layer_frequency == 2
    assert model.arch.moe_parallel_residual
    params = model.load_hf_state_dict(dict(sd))
    ours = _forward_logits(model, params, IDS)
    want = _reference_logits(sd, IDS[0], 4)
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_arctic_matches_reference_odd_layers():
    """Odd layer count exercises the unpaired trailing dense layer."""
    rng = np.random.default_rng(61)
    sd = _state_dict(rng, 3)
    model = build_model(_cfg(3), dtype=jnp.float32)
    params = model.load_hf_state_dict(dict(sd))
    ours = _forward_logits(model, params, IDS)
    want = _reference_logits(sd, IDS[0], 3)
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-4)


def test_arctic_e2e_generation():
    """Full engine drive (paged decode in carry mode crosses the
    interleaved stacks with global layer indices)."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = {**_cfg(3), "eos_token_id": None}
    llm = LLM(hf_config=cfg, dtype="float32", block_size=16,
              max_model_len=256, num_device_blocks=32, seed=0)
    outs = llm.generate(
        prompt_token_ids=[list(range(1, 70))],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=16,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 16
