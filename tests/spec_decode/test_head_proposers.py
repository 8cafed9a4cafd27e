"""Medusa / MLP-speculator proposers: head math vs numpy, checkpoint
stacking, and the spec-decode invariant (greedy output token-identical to
plain decoding regardless of proposal quality).

Reference analog: vllm/spec_decode/medusa_worker.py,
vllm/model_executor/models/{medusa,mlp_speculator}.py.
"""

import numpy as np

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.llama import LlamaArch, LlamaModel
from vllm_paged_compression_tpu.spec_decode.heads import (
    MedusaProposer, MLPSpeculatorProposer)

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
       "hidden_size": 64, "intermediate_size": 128,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 1024,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": True, "eos_token_id": None}


def _tiny_model(seed=0):
    arch = LlamaArch.from_hf_config(CFG)
    model = LlamaModel(arch, dtype=jnp.float32)
    return model, model.init_params(seed)


def test_medusa_head_math_matches_numpy():
    model, params = _tiny_model()
    k = 3
    hp = MedusaProposer.init_head_params(model.arch, k, num_res_layers=2,
                                         seed=1)
    prop = MedusaProposer(model, params, hp, k, window=16)
    hist = [1, 5, 9, 33, 77]
    got = prop.propose([hist])[0]

    # Recompute by hand: target hidden then per-head residual stack.
    h = np.asarray(prop._hidden_jit(
        params,
        np.pad(np.array([hist], np.int32), ((0, 0), (0, 16 - len(hist)))),
        np.array([len(hist)], np.int32)))[0]
    silu = lambda x: x / (1 + np.exp(-x))  # noqa: E731
    for i in range(k):
        x = h.copy()
        for r in range(2):
            x = x + silu(x @ hp["W"][i, r] + hp["b"][i, r])
        expect = int(np.argmax(x @ hp["lm"][i]))
        assert int(got[i]) == expect


def test_medusa_hf_checkpoint_stacking():
    rng = np.random.default_rng(2)
    d, v, k = 8, 16, 2
    t = {}
    for i in range(k):
        t[f"medusa_head.{i}.0.linear.weight"] = rng.standard_normal(
            (d, d)).astype(np.float32)
        t[f"medusa_head.{i}.0.linear.bias"] = rng.standard_normal(
            d).astype(np.float32)
        t[f"medusa_head.{i}.1.weight"] = rng.standard_normal(
            (v, d)).astype(np.float32)
    hp = MedusaProposer.load_hf_heads(t, k)
    assert hp["W"].shape == (k, 1, d, d)
    assert hp["b"].shape == (k, 1, d)
    assert hp["lm"].shape == (k, d, v)
    np.testing.assert_array_equal(
        hp["W"][1, 0], t["medusa_head.1.0.linear.weight"].T)


def test_mlp_speculator_hf_checkpoint_stacking():
    rng = np.random.default_rng(3)
    hidden, inner, v, k = 12, 8, 16, 2
    t = {}
    for i in range(k):
        din = hidden if i == 0 else inner
        t[f"emb.{i}.weight"] = rng.standard_normal(
            (v, inner)).astype(np.float32)
        t[f"proj.{i}.weight"] = rng.standard_normal(
            (inner, din)).astype(np.float32)
        t[f"head.{i}.weight"] = rng.standard_normal(
            (v, inner)).astype(np.float32)
        t[f"ln.{i}.weight"] = np.ones(inner, np.float32)
        t[f"ln.{i}.bias"] = np.zeros(inner, np.float32)
    hp = MLPSpeculatorProposer.load_hf_heads(t, k, hidden)
    assert hp["proj"].shape == (k, hidden, inner)   # padded to common Din
    # Cell 1's proj only uses the first `inner` input rows; rest zero.
    assert np.all(hp["proj"][1, inner:] == 0)


def _gen(llm, prompts, n=24):
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=n)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    return [o.outputs[0].token_ids for o in outs]


def _llm(**kw):
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    base = dict(hf_config=CFG, dtype="float32", block_size=16,
                max_model_len=1024, num_device_blocks=128, seed=0,
                max_num_seqs=8)
    base.update(kw)
    return LLM(**base)


def test_medusa_spec_decode_token_identical():
    prompts = [[1, 17, 33, 5, 99, 2, 8, 61, 40, 7], [9, 3, 3, 12, 50]]
    base = _gen(_llm(), prompts)
    spec = _gen(_llm(speculative_config=dict(
        method="medusa", num_speculative_tokens=3, draft_window=32)),
        prompts)
    assert base == spec


def test_mlp_speculator_spec_decode_token_identical():
    prompts = [[1, 17, 33, 5, 99, 2, 8, 61, 40, 7], [9, 3, 3, 12, 50]]
    base = _gen(_llm(), prompts)
    spec = _gen(_llm(speculative_config=dict(
        method="mlp_speculator", num_speculative_tokens=3,
        draft_window=32)), prompts)
    assert base == spec
