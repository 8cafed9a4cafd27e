"""EAGLE proposer: feature-level draft math vs numpy-assisted recompute,
checkpoint splitting, and the spec-decode exactness invariant.

Reference analog: vllm/model_executor/models/eagle.py +
vllm/spec_decode/multi_step_worker.py.
"""

import numpy as np

import jax.numpy as jnp

from vllm_paged_compression_tpu.models.llama import LlamaArch, LlamaModel
from vllm_paged_compression_tpu.spec_decode.eagle import (
    EagleProposer, init_eagle_params, load_hf_eagle)

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
       "hidden_size": 64, "intermediate_size": 128,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 1024,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": True, "eos_token_id": None}

EAGLE_CFG = {**CFG, "num_hidden_layers": 1}


def _models(seed=0):
    target = LlamaModel(LlamaArch.from_hf_config(CFG), dtype=jnp.float32)
    tparams = target.init_params(seed)
    draft = LlamaModel(LlamaArch.from_hf_config(EAGLE_CFG),
                       dtype=jnp.float32)
    dparams, fcp = init_eagle_params(target, draft, seed=seed + 1)
    return target, tparams, draft, dparams, fcp


def test_eagle_first_proposal_matches_manual():
    """Recompute proposal 1 by hand: target hiddens H, draft inputs
    fc([emb(t_{j+1}) | H_j]), causal draft forward, argmax lm head."""
    from vllm_paged_compression_tpu.ops.attention import prefill_attention

    target, tparams, draft, dparams, fcp = _models()
    k, window = 3, 16
    prop = EagleProposer(target, tparams, draft, dparams, fcp, k, window)
    hist = [1, 5, 9, 33, 77, 2]
    got = prop.propose([hist])

    n = len(hist)
    wk = window + k
    toks = np.zeros(wk, np.int32)
    toks[:n] = hist

    def full_hidden(model, params, tokens, length, embeds=None):
        scale = model.arch.attn_scale
        h, _ = model.forward_hidden(
            params, jnp.asarray(tokens), jnp.arange(len(tokens)),
            lambda q, k_, v, s: (prefill_attention(q, k_, v, scale,
                                                   length), s),
            input_embeds=embeds)
        return np.asarray(h, np.float32)

    H = full_hidden(target, tparams, toks, n)                # [WK, D]
    emb = np.asarray(draft.embed(dparams, jnp.asarray(toks[1:])),
                     np.float32)
    x = np.concatenate([emb, H[:-1]], axis=-1) @ np.asarray(fcp["fc_w"])
    hd = full_hidden(draft, dparams, np.zeros(wk - 1, np.int32), n - 1,
                     embeds=jnp.asarray(x, jnp.float32))
    logits = np.asarray(draft.logits(dparams,
                                     jnp.asarray(hd[n - 2][None])))[0]
    assert int(got[0, 0]) == int(np.argmax(logits))
    assert got.shape == (1, k)


def test_eagle_checkpoint_split():
    rng = np.random.default_rng(7)
    d = 64
    draft = LlamaModel(LlamaArch.from_hf_config(EAGLE_CFG),
                       dtype=jnp.float32)
    ref = draft.init_params(0)

    def w(*s):
        return rng.standard_normal(s).astype(np.float32) * 0.02

    sd = {"fc.weight": w(d, 2 * d), "fc.bias": w(d),
          "embed_tokens.weight": w(128, d),
          "lm_head.weight": w(128, d)}
    p = "layers.0."
    sd[p + "self_attn.q_proj.weight"] = w(d, d)
    sd[p + "self_attn.k_proj.weight"] = w(32, d)
    sd[p + "self_attn.v_proj.weight"] = w(32, d)
    sd[p + "self_attn.o_proj.weight"] = w(d, d)
    sd[p + "mlp.gate_proj.weight"] = w(128, d)
    sd[p + "mlp.up_proj.weight"] = w(128, d)
    sd[p + "mlp.down_proj.weight"] = w(d, 128)
    sd[p + "input_layernorm.weight"] = np.ones(d, np.float32)
    sd[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
    # EAGLE checkpoints: bare prefix, NO final norm; arch must not tie.
    draft.arch.tie_word_embeddings = False
    params, fcp = load_hf_eagle(sd, draft)
    assert fcp["fc_w"].shape == (2 * d, d)
    assert "fc_b" in fcp
    assert params["final_norm"].shape == (d,)    # injected identity slot
    np.testing.assert_array_equal(np.asarray(params["lm_head"]),
                                  sd["lm_head.weight"].T)


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


def test_eagle_spec_decode_token_identical():
    prompts = [[1, 17, 33, 5, 99, 2, 8, 61, 40, 7], [9, 3, 3, 12, 50]]
    base = _gen(_llm(), prompts)
    spec = _gen(_llm(speculative_config=dict(
        method="eagle", num_speculative_tokens=3, draft_window=32,
        eagle_hf_config={"model": EAGLE_CFG})), prompts)
    assert base == spec
