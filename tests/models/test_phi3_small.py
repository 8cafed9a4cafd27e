"""Phi-3-small: gegelu + μP + head-major QKV + BLOCKSPARSE attention vs a
numpy reference implementing the reference mask construction
(vllm/attention/ops/blocksparse_attention/utils.py get_sparse_attn_mask),
and engine decode/prefill mask consistency.

No HF transformers class exists (remote code), so parity follows the
MiniCPM3/Arctic pattern: an independent hand-rolled implementation of
vllm/model_executor/models/phi3_small.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.ops.rope import apply_rope, rope_cos_sin
from vllm_paged_compression_tpu.sampling_params import SamplingParams

V, D, H, KVH, FF, L = 128, 32, 4, 2, 48, 2
HD = D // H
BS_BLOCK, BS_LOCAL, BS_VERT = 2, 2, 2
CFG = {"architectures": ["Phi3SmallForCausalLM"],
       "vocab_size": V, "hidden_size": D, "intermediate_size": FF,
       "num_hidden_layers": L, "num_attention_heads": H,
       "num_key_value_heads": KVH, "max_position_embeddings": 256,
       "layer_norm_epsilon": 1e-5, "hidden_act": "gegelu",
       "gegelu_limit": 10.0, "rope_embedding_base": 10000.0,
       "rope_position_scale": 1.0,
       "mup_use_scaling": True, "mup_attn_multiplier": 2.0,
       "mup_width_multiplier": 2.0, "mup_embedding_multiplier": 1.5,
       "dummy_token_indices": [125, 126, 127],
       "blocksparse_block_size": BS_BLOCK,
       "blocksparse_num_local_blocks": BS_LOCAL,
       "blocksparse_vert_stride": BS_VERT,
       "blocksparse_homo_head_pattern": False,
       "blocksparse_triton_kernel_block_size": BS_BLOCK,
       "dense_attention_every_n_layers": 2,
       "tie_word_embeddings": True, "eos_token_id": None}

IDS = [3, 77, 15, 42, 9, 88, 21, 5, 60, 11]


def _state_dict(rng):
    def w(*s):
        return np.asarray(rng.standard_normal(s) * 0.05, np.float32)

    g = H // KVH
    sd = {"model.embed_tokens.weight": w(V, D),
          "model.final_layernorm.weight": np.ones(D, np.float32) + w(D),
          "model.final_layernorm.bias": w(D)}
    for i in range(L):
        p = f"model.layers.{i}."
        # head-major fused qkv: per kv head [q_0..q_{g-1}, k, v].
        sd[p + "self_attn.query_key_value.weight"] = w(
            KVH * (g + 2) * HD, D)
        sd[p + "self_attn.query_key_value.bias"] = w(KVH * (g + 2) * HD)
        sd[p + "self_attn.dense.weight"] = w(D, D)
        sd[p + "self_attn.dense.bias"] = w(D)
        # gegelu interleaved up_proj: even rows = gelu half, odd = linear.
        sd[p + "mlp.up_proj.weight"] = w(2 * FF, D)
        sd[p + "mlp.up_proj.bias"] = w(2 * FF)
        sd[p + "mlp.down_proj.weight"] = w(D, FF)
        sd[p + "mlp.down_proj.bias"] = w(D)
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32) + w(D)
        sd[p + "input_layernorm.bias"] = w(D)
        sd[p + "post_attention_layernorm.weight"] = (
            np.ones(D, np.float32) + w(D))
        sd[p + "post_attention_layernorm.bias"] = w(D)
    return sd


def _ln(x, wt, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * wt + b


def _bs_allowed(n, layer):
    """Reference mask: causal AND (local blocks OR per-head vertical
    stride); dense layers ((i+1) % 2 == 0) are plain causal."""
    pos = np.arange(n)
    causal = pos[:, None] >= pos[None, :]
    if (layer + 1) % 2 == 0:
        return np.broadcast_to(causal, (H, n, n))
    qb, kb = pos // BS_BLOCK, pos // BS_BLOCK
    local = (qb[:, None] - kb[None, :]) < BS_LOCAL
    step = max(1, BS_VERT // H)
    offs = np.arange(H) * step
    vert = (kb[None, :] + offs[:, None] + 1) % BS_VERT == 0   # [H, n]
    return causal[None] & (local[None] | vert[:, None, :])


def _reference_logits(sd, ids):
    n = len(ids)
    g = H // KVH
    h = sd["model.embed_tokens.weight"][ids] * 1.5    # mup embedding
    cos, sin = rope_cos_sin(jnp.arange(n), HD, 10000.0)
    scale = 2.0 / HD                                  # mup attn scale
    for i in range(L):
        p = f"model.layers.{i}."
        x = _ln(h, sd[p + "input_layernorm.weight"],
                sd[p + "input_layernorm.bias"])
        qkv = x @ sd[p + "self_attn.query_key_value.weight"].T \
            + sd[p + "self_attn.query_key_value.bias"]
        qkv = qkv.reshape(n, KVH, g + 2, HD)
        q = qkv[:, :, :g].reshape(n, H, HD)
        k = qkv[:, :, g]
        v = qkv[:, :, g + 1]
        q, k = apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin)
        q, k = np.asarray(q), np.asarray(k)
        k = np.repeat(k, g, axis=1)
        v = np.repeat(v, g, axis=1)
        scores = np.einsum("thd,shd->hts", q, k) * scale
        allowed = _bs_allowed(n, i)
        scores = np.where(allowed, scores, -1e30)
        e = np.exp(scores - scores.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        attn = np.einsum("hts,shd->thd", probs, v).reshape(n, D)
        h = h + attn @ sd[p + "self_attn.dense.weight"].T \
            + sd[p + "self_attn.dense.bias"]
        x = _ln(h, sd[p + "post_attention_layernorm.weight"],
                sd[p + "post_attention_layernorm.bias"])
        up = x @ sd[p + "mlp.up_proj.weight"].T \
            + sd[p + "mlp.up_proj.bias"]
        gate, lin = up[:, 0::2], up[:, 1::2]
        gate = np.minimum(gate, 10.0)
        lin = np.clip(lin, -10.0, 10.0)
        act = (gate * (1 / (1 + np.exp(-1.702 * gate)))) * (lin + 1)
        h = h + act @ sd[p + "mlp.down_proj.weight"].T \
            + sd[p + "mlp.down_proj.bias"]
    h = _ln(h, sd["model.final_layernorm.weight"],
            sd["model.final_layernorm.bias"])
    logits = h @ sd["model.embed_tokens.weight"].T / 2.0  # mup width
    logits[:, [125, 126, 127]] = -np.inf
    return logits


def test_phi3_small_greedy_matches_reference():
    """Engine prefill + blocksparse decode reproduce the reference math
    step by step (the decode mask must equal the prefill mask at every
    position, including per-head vertical offsets and the dense layer)."""
    rng = np.random.default_rng(140)
    sd = _state_dict(rng)
    model = build_model(CFG, dtype=jnp.float32)
    assert model.arch.bs_block == BS_BLOCK
    assert model.arch.attn_scale == 2.0 / HD
    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=128, num_device_blocks=64, seed=0,
              params=model.load_hf_state_dict(sd))
    n_gen = 8
    outs = llm.generate(prompt_token_ids=[list(IDS)],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=n_gen))
    got = list(outs[0].outputs[0].token_ids)

    seq = list(IDS)
    for _ in range(n_gen):
        logits = _reference_logits(sd, seq)
        nxt = int(np.argmax(logits[-1]))
        seq.append(nxt)
    want = seq[len(IDS):]
    assert got == want


def test_phi3_small_rejects_eviction():
    with pytest.raises(ValueError, match="blocksparse"):
        LLM(hf_config=CFG, dtype="float32", block_size=4,
            max_model_len=128, num_device_blocks=64, seed=0,
            enable_paged_eviction=True, evict_method="streamingLLM",
            cache_budget=128)
