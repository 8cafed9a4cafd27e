"""Per-request logit controls: logit_bias, allowed_token_ids, bad_words,
min-tokens stop ban (reference logits processors:
vllm/model_executor/layers/logits_process.py + sampler min-tokens path).
All compile into in-graph bitmask/bias — these tests pin the semantics."""

import pytest

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.sampling_params import SamplingParams

CFG = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": True, "eos_token_id": 1,
}


@pytest.fixture(scope="module")
def llm():
    return LLM(hf_config=CFG, dtype="float32", block_size=4,
               max_model_len=256, num_device_blocks=128, seed=0,
               num_scheduler_steps=4)


def _gen(llm, **kw):
    sp = SamplingParams(temperature=0.0, **kw)
    return llm.generate(prompt_token_ids=[list(range(40, 50))],
                        sampling_params=sp)[0].outputs[0]


def test_logit_bias_forces_token(llm):
    out = _gen(llm, max_tokens=6, logit_bias={77: 1e9}, ignore_eos=True)
    assert list(out.token_ids) == [77] * 6


def test_logit_bias_negative_bans(llm):
    base = _gen(llm, max_tokens=8, ignore_eos=True)
    banned = set(base.token_ids)
    bias = {t: -1e9 for t in list(banned)[:8]}
    out = _gen(llm, max_tokens=8, logit_bias=bias, ignore_eos=True)
    assert not (set(out.token_ids) & set(bias))


def test_allowed_token_ids_multi_step_window(llm):
    allowed = [60, 61, 62]
    out = _gen(llm, max_tokens=12, allowed_token_ids=allowed,
               ignore_eos=True)
    assert len(out.token_ids) == 12
    assert set(out.token_ids) <= set(allowed)


def test_bad_words_single_token(llm):
    base = _gen(llm, max_tokens=8, ignore_eos=True)
    first = base.token_ids[0]
    out = _gen(llm, max_tokens=8, bad_words=[[first]], ignore_eos=True)
    assert first not in out.token_ids


def test_bad_words_multi_token_phrase(llm):
    # Bias token 88 to dominate, then forbid the phrase (88, 88): the
    # sampled stream must never contain two consecutive 88s, while 88
    # itself stays frequent.
    out = _gen(llm, max_tokens=10, logit_bias={88: 1e9},
               bad_words=[[88, 88]], ignore_eos=True)
    toks = list(out.token_ids)
    assert 88 in toks
    assert all(not (a == 88 and b == 88) for a, b in zip(toks, toks[1:]))


def test_min_tokens_bans_eos_in_graph(llm):
    # EOS massively biased: it must still not fire before min_tokens.
    out = _gen(llm, max_tokens=16, min_tokens=5, logit_bias={1: 1e9})
    assert len(out.token_ids) == 6          # 5 forced non-EOS + EOS
    assert out.token_ids[-1] == 1
    assert out.finish_reason == "stop"
    assert 1 not in out.token_ids[:-1]


def test_controls_with_sampling_params_validation():
    with pytest.raises(ValueError):
        SamplingParams(logit_bias={i: 1.0 for i in range(65)})
    with pytest.raises(ValueError):
        SamplingParams(allowed_token_ids=[])
    with pytest.raises(ValueError):
        SamplingParams(bad_words=[[]])
