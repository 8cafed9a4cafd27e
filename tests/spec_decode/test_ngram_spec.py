"""ngram speculative decoding: proposer unit tests + token-exactness vs
plain decoding (greedy spec decode must never change the output).
"""

import numpy as np
import pytest

from vllm_paged_compression_tpu.spec_decode.ngram import propose_ngram

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
       "hidden_size": 64, "intermediate_size": 128,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 1024,
       "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
       "tie_word_embeddings": True, "eos_token_id": None}


def test_propose_ngram_finds_repeat():
    toks = [1, 2, 3, 9, 9, 1, 2, 3]
    # tail 3-gram [1,2,3] occurred at position 0, followed by [9, 9, 1].
    assert propose_ngram(toks, 3, 3, 1) == [9, 9, 1]


def test_propose_ngram_fallback():
    assert propose_ngram([5, 6, 7], 2, 3, 2) == [7, 7]


def test_propose_ngram_prefers_longest_match():
    toks = [4, 1, 2, 8, 1, 2, 3, 7, 1, 2, 3]
    # 3-gram [1,2,3] matches at 4..6 (-> 7); the 2-gram would match at 1.
    assert propose_ngram(toks, 1, 3, 1) == [7]


def _gen(llm, prompts, n=40):
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


def test_spec_decode_token_identical():
    # Repetitive prompts make ngram proposals frequently correct; random
    # prompts make them frequently wrong — both must yield exactly the
    # plain greedy continuation.
    prompts = [
        ([7, 8, 9, 10] * 12)[:47],
        list(np.random.default_rng(0).integers(1, 128, 50)),
        [3, 3, 3, 3, 3, 3, 3, 3],
    ]
    want = _gen(_llm(), prompts)
    got = _gen(_llm(speculative_config={"num_speculative_tokens": 4}),
               prompts)
    assert got == want


def test_spec_decode_respects_max_tokens():
    llm = _llm(speculative_config={"num_speculative_tokens": 8})
    outs = _gen(llm, [[7, 8, 9] * 10], n=5)
    assert len(outs[0]) == 5


def test_spec_rejects_eviction_combo():
    with pytest.raises(ValueError):
        _llm(speculative_config={"num_speculative_tokens": 4},
             enable_paged_eviction=True, evict_method="global",
             cache_budget=128)
