"""LLM.beam_search (reference vllm/entrypoints/llm.py beam_search):
width-1 equals greedy; wider beams return descending, oracle-correct
cumulative scores."""

import numpy as np

import jax
import jax.numpy as jnp

from vllm_paged_compression_tpu.entrypoints.llm import (BeamSearchParams,
                                                        LLM)
from vllm_paged_compression_tpu.ops.attention import prefill_attention
from vllm_paged_compression_tpu.sampling_params import SamplingParams

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 64,
       "hidden_size": 48, "intermediate_size": 96,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 256,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": True, "eos_token_id": None}

PROMPT = [1, 17, 33, 5, 9]


def _llm():
    return LLM(hf_config=CFG, dtype="float32", block_size=4,
               max_model_len=128, num_device_blocks=64, seed=0,
               max_num_seqs=8)


def _cum_logprob(llm, tokens, prompt_len):
    model, params = llm.engine.model, llm.engine.params
    scale = model.arch.head_dim ** -0.5
    cum = 0.0
    for i in range(prompt_len, len(tokens)):
        ids = jnp.asarray(tokens[:i])
        h, _ = model.forward_hidden(
            params, ids, jnp.arange(i),
            lambda q, k, v, s: (prefill_attention(q, k, v, scale, i), s))
        lp = jax.nn.log_softmax(
            model.logits(params, h)[-1].astype(jnp.float32))
        cum += float(lp[tokens[i]])
    return cum


def test_width1_equals_greedy():
    llm = _llm()
    greedy = list(llm.generate(
        prompt_token_ids=[PROMPT],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6))[0]
        .outputs[0].token_ids)
    out = llm.beam_search([PROMPT], BeamSearchParams(beam_width=1,
                                                     max_tokens=6))[0]
    assert out.sequences[0].tokens == PROMPT + greedy


def test_beam_scores_descend_and_match_oracle():
    llm = _llm()
    out = llm.beam_search([PROMPT], BeamSearchParams(beam_width=3,
                                                     max_tokens=4))[0]
    assert len(out.sequences) == 3
    scores = [s.cum_logprob for s in out.sequences]
    # length-penalty 1 with equal lengths => plain descending cumulative
    assert scores == sorted(scores, reverse=True)
    for s in out.sequences:
        np.testing.assert_allclose(
            s.cum_logprob, _cum_logprob(llm, s.tokens, len(PROMPT)),
            atol=2e-2)
    # the best beam must score at least as high as the greedy rollout
    greedy = list(llm.generate(
        prompt_token_ids=[PROMPT],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4))[0]
        .outputs[0].token_ids)
    g_score = _cum_logprob(llm, PROMPT + greedy, len(PROMPT))
    assert scores[0] >= g_score - 1e-3
