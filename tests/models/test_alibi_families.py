"""ALiBi / learned-position model families: Bloom, MPT, GPT-BigCode
(HF logit parity) and JAIS (checkpoint-layout conversion), plus slope
formulas vs HF and an engine-consistency check that the paged-decode
ALiBi bias (key position = cache index) matches the stateless prefill
rollout.  Reference analogs: vllm/model_executor/models/{bloom,mpt,
gpt_bigcode,jais}.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.registry import build_model
from vllm_paged_compression_tpu.ops.attention import (alibi_slopes,
                                                      prefill_attention)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vllm_paged_compression_tpu.models.weights import (  # noqa: E402
    torch_state_dict_to_numpy)

IDS = np.array([[1, 5, 9, 33, 77, 2, 4, 100, 62, 11]])


def _forward_logits(model, params, ids):
    t = ids.shape[1]
    scale = model.arch.attn_scale
    slopes = None
    if model.arch.alibi:
        slopes = jnp.asarray(alibi_slopes(model.arch.num_heads,
                                          model.arch.alibi_variant,
                                          model.arch.alibi_bias_max),
                             jnp.float32)

    def attn(q, k, v, state):
        return prefill_attention(q, k, v, scale, q.shape[0],
                                 alibi_slopes=slopes), state

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


@pytest.mark.parametrize("num_heads", [4, 6, 12])
def test_bloom_slopes_match_hf(num_heads):
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor
    mask = torch.ones(1, 8)
    alibi = build_alibi_tensor(mask, num_heads, torch.float32)
    hf_slopes = alibi.view(num_heads, 8)[:, 1].numpy()  # bias at key pos 1
    np.testing.assert_allclose(alibi_slopes(num_heads, "bloom"), hf_slopes,
                               rtol=1e-6)


@pytest.mark.parametrize("num_heads", [4, 6, 12])
def test_mpt_slopes_match_hf(num_heads):
    from transformers.models.mpt.modeling_mpt import build_mpt_alibi_tensor
    alibi = build_mpt_alibi_tensor(num_heads, 8)
    # bias = slope * (j - (S-1)); at j = S-2 it's -slope.
    hf_slopes = -alibi.view(num_heads, 8)[:, -2].numpy()
    np.testing.assert_allclose(alibi_slopes(num_heads, "mpt"), hf_slopes,
                               rtol=1e-6)


def test_bloom_logits_match_hf():
    cfg = transformers.BloomConfig(
        vocab_size=128, hidden_size=64, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5)
    torch.manual_seed(40)
    hf = transformers.BloomForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["BloomForCausalLM"]
    _check_parity(hf, d)


def test_mpt_logits_match_hf():
    cfg = transformers.MptConfig(
        vocab_size=128, d_model=96, n_heads=6, n_layers=2,
        expansion_ratio=4, max_seq_len=128,
        attn_config={"alibi": True, "alibi_bias_max": 8,
                     "clip_qkv": None, "softmax_scale": None})
    torch.manual_seed(41)
    hf = transformers.MptForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["MptForCausalLM"]
    _check_parity(hf, d)


def test_mpt_clip_and_scale():
    cfg = transformers.MptConfig(
        vocab_size=128, d_model=64, n_heads=4, n_layers=2,
        expansion_ratio=2, max_seq_len=128,
        attn_config={"alibi": True, "alibi_bias_max": 8,
                     "clip_qkv": 0.03, "softmax_scale": 0.2})
    torch.manual_seed(42)
    hf = transformers.MptForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["MptForCausalLM"]
    model = _check_parity(hf, d)
    assert abs(model.arch.attn_scale - 0.2) < 1e-9


@pytest.mark.parametrize("multi_query", [True, False])
def test_gpt_bigcode_logits_match_hf(multi_query):
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=128, n_positions=128, n_embd=64, n_layer=2, n_head=4,
        activation_function="gelu_pytorch_tanh", multi_query=multi_query)
    torch.manual_seed(43)
    hf = transformers.GPTBigCodeForCausalLM(cfg).eval()
    d = cfg.to_dict(); d["architectures"] = ["GPTBigCodeForCausalLM"]
    model = _check_parity(hf, d)
    assert model.arch.num_kv_heads == (1 if multi_query else 4)


def _jais_named_state_dict(rng, L, D, FF, V):
    """Random tensors under JAIS (gpt2-ish, Conv1D [in, out]) naming."""
    sd = {"transformer.wte.weight": rng.standard_normal((V, D)) * 0.05,
          "transformer.ln_f.weight": 1 + rng.standard_normal(D) * 0.01,
          "transformer.ln_f.bias": rng.standard_normal(D) * 0.01}
    for i in range(L):
        p = f"transformer.h.{i}."
        for ln in ("ln_1", "ln_2"):
            sd[p + ln + ".weight"] = 1 + rng.standard_normal(D) * 0.01
            sd[p + ln + ".bias"] = rng.standard_normal(D) * 0.01
        sd[p + "attn.c_attn.weight"] = rng.standard_normal((D, 3 * D)) * .05
        sd[p + "attn.c_attn.bias"] = rng.standard_normal(3 * D) * 0.05
        sd[p + "attn.c_proj.weight"] = rng.standard_normal((D, D)) * 0.05
        sd[p + "attn.c_proj.bias"] = rng.standard_normal(D) * 0.05
        sd[p + "mlp.c_fc.weight"] = rng.standard_normal((D, FF)) * 0.05
        sd[p + "mlp.c_fc.bias"] = rng.standard_normal(FF) * 0.05
        sd[p + "mlp.c_fc2.weight"] = rng.standard_normal((D, FF)) * 0.05
        sd[p + "mlp.c_fc2.bias"] = rng.standard_normal(FF) * 0.05
        sd[p + "mlp.c_proj.weight"] = rng.standard_normal((FF, D)) * 0.05
        sd[p + "mlp.c_proj.bias"] = rng.standard_normal(D) * 0.05
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_jais_layout_and_scales():
    """JAIS canonicalization: loading the gpt2-named Conv1D checkpoint
    equals loading the hand-converted canonical dict (which canonicalize
    passes through untouched); muP scales land on the arch."""
    L, D, FF, V = 2, 64, 96, 128
    rng = np.random.default_rng(44)
    sd = _jais_named_state_dict(rng, L, D, FF, V)
    cfg = {"architectures": ["JAISLMHeadModel"], "vocab_size": V,
           "n_embd": D, "n_layer": L, "n_head": 4, "n_inner": FF,
           "n_positions": 128, "layer_norm_epsilon": 1e-5,
           "activation_function": "swiglu",
           "position_embedding_type": "alibi",
           "mup_embeddings_scale": 9.17, "mup_output_alpha": 1.1,
           "mup_width_scale": 0.5, "mup_scale_qk_dot_by_d": True}
    model = build_model(cfg, dtype=jnp.float32)
    assert abs(model.arch.embed_scale - 9.17) < 1e-9
    assert abs(model.arch.logit_scale - 0.55) < 1e-9
    assert abs(model.arch.attn_scale - 1.0 / (D // 4)) < 1e-12
    p1 = model.load_hf_state_dict(dict(sd))

    canon = {"model.embed_tokens.weight": sd["transformer.wte.weight"],
             "model.norm.weight": sd["transformer.ln_f.weight"],
             "model.norm.bias": sd["transformer.ln_f.bias"]}
    for i in range(L):
        src, dst = f"transformer.h.{i}.", f"model.layers.{i}."
        canon[dst + "input_layernorm.weight"] = sd[src + "ln_1.weight"]
        canon[dst + "input_layernorm.bias"] = sd[src + "ln_1.bias"]
        canon[dst + "post_attention_layernorm.weight"] = \
            sd[src + "ln_2.weight"]
        canon[dst + "post_attention_layernorm.bias"] = \
            sd[src + "ln_2.bias"]
        ca = sd[src + "attn.c_attn.weight"].T      # -> [out, in]
        cb = sd[src + "attn.c_attn.bias"]
        for j, nm in enumerate(("q", "k", "v")):
            canon[dst + f"self_attn.{nm}_proj.weight"] = \
                ca[j * D:(j + 1) * D]
            canon[dst + f"self_attn.{nm}_proj.bias"] = \
                cb[j * D:(j + 1) * D]
        canon[dst + "self_attn.o_proj.weight"] = \
            sd[src + "attn.c_proj.weight"].T
        canon[dst + "self_attn.o_proj.bias"] = sd[src + "attn.c_proj.bias"]
        canon[dst + "mlp.gate_proj.weight"] = \
            sd[src + "mlp.c_fc2.weight"].T
        canon[dst + "mlp.gate_proj.bias"] = sd[src + "mlp.c_fc2.bias"]
        canon[dst + "mlp.up_proj.weight"] = sd[src + "mlp.c_fc.weight"].T
        canon[dst + "mlp.up_proj.bias"] = sd[src + "mlp.c_fc.bias"]
        canon[dst + "mlp.down_proj.weight"] = \
            sd[src + "mlp.c_proj.weight"].T
        canon[dst + "mlp.down_proj.bias"] = sd[src + "mlp.c_proj.bias"]
    p2 = model.load_hf_state_dict(canon)
    out1 = _forward_logits(model, p1, IDS)
    out2 = _forward_logits(model, p2, IDS)
    np.testing.assert_allclose(out1, out2, rtol=1e-6, atol=1e-6)
    assert np.isfinite(out1).all()


BLOOM_CFG = {"architectures": ["BloomForCausalLM"], "vocab_size": 128,
             "hidden_size": 64, "n_layer": 2, "n_head": 4,
             "layer_norm_epsilon": 1e-5, "eos_token_id": None}


def test_bloom_engine_matches_stateless_rollout():
    """Greedy engine continuation (paged decode, ALiBi bias from cache
    indices) == stateless full-context argmax rollout."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams

    llm = LLM(hf_config=BLOOM_CFG, dtype="float32", block_size=4,
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
    ids = list(prompt)
    want = []
    for _ in range(8):
        logits = _forward_logits(model, params, np.array([ids]))
        nxt = int(np.argmax(logits[len(ids) - 1]))
        want.append(nxt)
        ids.append(nxt)
    assert got == want


def test_gpt_bigcode_engine_generation():
    """Learned-position MQA model through the serving engine."""
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    cfg = {"architectures": ["GPTBigCodeForCausalLM"], "vocab_size": 128,
           "n_positions": 512, "n_embd": 64, "n_layer": 2, "n_head": 4,
           "activation_function": "gelu_pytorch_tanh", "multi_query": True,
           "eos_token_id": None}
    llm = LLM(hf_config=cfg, dtype="float32", block_size=16,
              max_model_len=256, num_device_blocks=32, seed=0)
    outs = llm.generate(
        prompt_token_ids=[list(range(1, 60))],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=16,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 16
