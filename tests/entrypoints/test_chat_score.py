"""LLM.chat and LLM.score entrypoints (reference LLM.chat
vllm/entrypoints/llm.py:708 and LLM.score / the /score route)."""

import os

import numpy as np
import pytest

CFG = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
       "hidden_size": 64, "intermediate_size": 128,
       "num_hidden_layers": 2, "num_attention_heads": 4,
       "num_key_value_heads": 2, "max_position_embeddings": 512,
       "tie_word_embeddings": True, "eos_token_id": None}


@pytest.fixture(scope="module")
def llm_with_tokenizer(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    from tokenizers import Tokenizer, models
    vocab = {chr(i): i for i in range(32, 127)}
    vocab["<unk>"] = 127
    Tokenizer(models.BPE(vocab=vocab, merges=[],
                         unk_token="<unk>")).save(str(d / "tokenizer.json"))
    from vllm_paged_compression_tpu.config import (CacheConfig, EngineConfig,
                                                   ModelConfig,
                                                   SchedulerConfig)
    from vllm_paged_compression_tpu.engine.llm_engine import LLMEngine
    from vllm_paged_compression_tpu.entrypoints.llm import LLM
    llm = LLM.__new__(LLM)
    cfg = EngineConfig(
        model=ModelConfig(hf_config=CFG, dtype="float32", max_model_len=512,
                          tokenizer=str(d)),
        cache=CacheConfig(block_size=16, num_device_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=512))
    llm.engine = LLMEngine(cfg)
    return llm


def test_chat_generates(llm_with_tokenizer):
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    outs = llm_with_tokenizer.chat(
        [{"role": "user", "content": "hello"}],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=8))
    assert len(outs) == 1
    assert len(outs[0].outputs[0].token_ids) == 8


def test_chat_multiple_conversations(llm_with_tokenizer):
    from vllm_paged_compression_tpu.sampling_params import SamplingParams
    convs = [[{"role": "user", "content": "a"}],
             [{"role": "user", "content": "bb"}]]
    outs = llm_with_tokenizer.chat(
        convs, sampling_params=SamplingParams(temperature=0.0, max_tokens=4))
    assert len(outs) == 2


def test_score_identical_texts_highest(llm_with_tokenizer):
    outs = llm_with_tokenizer.score(
        "the cat sat", ["the cat sat", "completely different words here"])
    assert len(outs) == 2
    # Normalized embeddings: self-similarity == 1 and is the max.
    assert outs[0].outputs.score == pytest.approx(1.0, abs=1e-4)
    assert outs[0].outputs.score >= outs[1].outputs.score
