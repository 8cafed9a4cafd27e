"""Guided (structured-output) decoding through the full engine.

Reference analog: tests/entrypoints/llm/test_guided_generate.py — the
generated text must satisfy the constraint by construction, independent of
the model weights (tiny synthetic models here)."""

import json

import numpy as np
import pytest

from vllm_paged_compression_tpu.entrypoints.llm import LLM
from vllm_paged_compression_tpu.guided import compile_regex
from vllm_paged_compression_tpu.sampling_params import (GuidedDecodingParams,
                                                        SamplingParams)

CFG = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 512,
    "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": True, "eos_token_id": 1,
}

# Token id -> bytes: ids 32..126 are their ASCII char; 0/1 = pad/EOS.
VOCAB = [b""] * 128
for _c in range(32, 127):
    VOCAB[_c] = bytes([_c])


def text_of(token_ids) -> str:
    return b"".join(VOCAB[t] for t in token_ids if t != 1).decode()


@pytest.fixture(scope="module")
def llm():
    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=128, seed=0,
              num_scheduler_steps=4)
    llm.engine.set_guided_vocab(VOCAB)
    return llm


def _gen(llm, gd, max_tokens=32, temperature=1.0, seed=7, n_prompts=1):
    sp = SamplingParams(temperature=temperature, max_tokens=max_tokens,
                        seed=seed, guided_decoding=gd)
    outs = llm.generate(
        prompt_token_ids=[list(range(40, 50))] * n_prompts,
        sampling_params=sp)
    return outs


def test_guided_regex_exact_shape(llm):
    gd = GuidedDecodingParams(regex=r"[0-9]{3}-[0-9]{2}")
    out = _gen(llm, gd)[0].outputs[0]
    assert compile_regex(r"[0-9]{3}-[0-9]{2}").fullmatch(
        text_of(out.token_ids).encode())
    assert out.finish_reason == "stop"          # FSM forced EOS


def test_guided_choice(llm):
    gd = GuidedDecodingParams(choice=["apple", "banana", "fig"])
    for out in _gen(llm, gd, n_prompts=3, seed=11):
        assert text_of(out.outputs[0].token_ids) in ("apple", "banana",
                                                     "fig")


def test_guided_json_schema(llm):
    schema = {"type": "object",
              "properties": {"a": {"enum": [1, 2]},
                             "ok": {"type": "boolean"}}}
    gd = GuidedDecodingParams(json=schema)
    out = _gen(llm, gd, max_tokens=48)[0].outputs[0]
    obj = json.loads(text_of(out.token_ids))
    assert obj["a"] in (1, 2) and isinstance(obj["ok"], bool)


def test_guided_batch_mixed(llm):
    """Guided + unguided requests in one continuous batch."""
    gd = GuidedDecodingParams(regex=r"(ab|cd){2}")
    sp_g = SamplingParams(temperature=1.0, max_tokens=16, seed=3,
                          guided_decoding=gd)
    sp_free = SamplingParams(temperature=0.0, max_tokens=8)
    eng = llm.engine
    eng.add_request(request_id="g1", prompt_token_ids=list(range(40, 44)),
                    sampling_params=sp_g)
    eng.add_request(request_id="f1", prompt_token_ids=list(range(44, 48)),
                    sampling_params=sp_free)
    done = {}
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                done[out.request_id] = out
    assert text_of(done["g1"].outputs[0].token_ids) in (
        "abab", "abcd", "cdab", "cdcd")
    assert len(done["f1"].outputs[0].token_ids) == 8


def test_guided_greedy_path(llm):
    """temperature=0 exercises the greedy-specialized jit with the mask."""
    gd = GuidedDecodingParams(choice=["yes", "no"])
    out = _gen(llm, gd, temperature=0.0)[0].outputs[0]
    assert text_of(out.token_ids) in ("yes", "no")


def test_guided_with_eviction():
    """Constraints hold while paged eviction reshapes the KV cache."""
    llm = LLM(hf_config=CFG, dtype="float32", block_size=16,
              max_model_len=512, num_device_blocks=64, seed=0,
              enable_paged_eviction=True, evict_method="global",
              cache_budget=128, num_scheduler_steps=4)
    llm.engine.set_guided_vocab(VOCAB)
    gd = GuidedDecodingParams(regex=r"[xy]{150,180}")
    out = _gen(llm, gd, max_tokens=200, seed=5)[0].outputs[0]
    txt = text_of(out.token_ids)
    assert 150 <= len(txt) <= 180 and set(txt) <= {"x", "y"}


def test_guided_rejects_speculative():
    llm = LLM(hf_config=CFG, dtype="float32", block_size=4,
              max_model_len=256, num_device_blocks=128, seed=0,
              speculative_config={"num_speculative_tokens": 2})
    llm.engine.set_guided_vocab(VOCAB)
    with pytest.raises(ValueError, match="speculative"):
        llm.engine.add_request(
            prompt_token_ids=list(range(40, 50)),
            sampling_params=SamplingParams(
                guided_decoding=GuidedDecodingParams(regex="a+")))


def test_guided_params_validation():
    with pytest.raises(ValueError):
        GuidedDecodingParams()
    with pytest.raises(ValueError):
        GuidedDecodingParams(regex="a", choice=["b"])
    with pytest.raises(ValueError, match="grammar"):
        from vllm_paged_compression_tpu.guided import guided_regex_of
        guided_regex_of(GuidedDecodingParams(grammar="start: 'a'"))
