"""Guided decoding over the OpenAI server surface (guided_* fields and
response_format; reference tests/entrypoints/openai/test_completion.py
guided cases)."""

import asyncio
import json

import pytest

from vllm_paged_compression_tpu.config import (CacheConfig, EngineConfig,
                                               ModelConfig, SchedulerConfig)
from vllm_paged_compression_tpu.engine.async_engine import AsyncLLMEngine
from vllm_paged_compression_tpu.entrypoints.openai.api_server import (
    OpenAIServer)

from test_openai_server import http_request  # noqa: E402 (same test dir)

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 256,
    "tie_word_embeddings": True, "eos_token_id": 1,
}

VOCAB = [b""] * 128
for _c in range(32, 127):
    VOCAB[_c] = bytes([_c])


def text_of(token_ids) -> str:
    return b"".join(VOCAB[t] for t in token_ids if t != 1).decode()


@pytest.fixture()
def guided_port():
    cfg = EngineConfig(
        model=ModelConfig(hf_config=TINY, dtype="float32",
                          max_model_len=128),
        cache=CacheConfig(block_size=4, num_device_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128))

    async def boot():
        engine = AsyncLLMEngine(cfg)
        engine.engine.set_guided_vocab(VOCAB)
        srv_obj = OpenAIServer(engine, "tiny")
        srv = await asyncio.start_server(srv_obj.handle_conn,
                                         "127.0.0.1", 0)
        return srv, srv.sockets[0].getsockname()[1]

    loop = asyncio.new_event_loop()
    srv, port = loop.run_until_complete(boot())
    import threading
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    yield port
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=5)


def test_guided_regex_field(guided_port):
    status, raw = http_request(
        guided_port, "POST", "/v1/completions",
        {"prompt": [40, 41, 42], "max_tokens": 16, "temperature": 1.0,
         "seed": 3, "guided_regex": "[0-9]{4}"})
    assert status == 200
    data = json.loads(raw)
    # No tokenizer on this engine, so assert via the token accounting:
    # exactly 4 digit tokens + the FSM-forced EOS stop token.
    assert data["choices"][0]["finish_reason"] == "stop"
    assert data["usage"]["completion_tokens"] in (4, 5)


def test_guided_choice_field(guided_port):
    status, raw = http_request(
        guided_port, "POST", "/v1/completions",
        {"prompt": [40, 41], "max_tokens": 16, "temperature": 1.0,
         "seed": 9, "guided_choice": ["ab", "xyz"]})
    assert status == 200
    data = json.loads(raw)
    assert data["choices"][0]["finish_reason"] == "stop"
    assert data["usage"]["completion_tokens"] in (3, 4)


def test_response_format_json_schema(guided_port):
    rf = {"type": "json_schema",
          "json_schema": {"name": "t", "schema": {
              "type": "object", "properties": {"a": {"enum": [1, 2]}}}}}
    status, raw = http_request(
        guided_port, "POST", "/v1/completions",
        {"prompt": [40], "max_tokens": 32, "temperature": 1.0, "seed": 4,
         "response_format": rf})
    assert status == 200
    data = json.loads(raw)
    assert data["choices"][0]["finish_reason"] == "stop"


def test_guided_conflicting_fields_rejected(guided_port):
    status, raw = http_request(
        guided_port, "POST", "/v1/completions",
        {"prompt": [40], "max_tokens": 4,
         "guided_regex": "a+", "guided_choice": ["b"]})
    assert status == 400


def test_guided_grammar_rejected(guided_port):
    status, raw = http_request(
        guided_port, "POST", "/v1/completions",
        {"prompt": [40], "max_tokens": 4,
         "guided_grammar": "start: 'a'"})
    assert status == 400


class CharTokenizer:
    """Char-level fake tokenizer (id = codepoint) so the chat route works
    against the synthetic-vocab engine."""

    class _Enc:
        def __init__(self, ids):
            self.ids = ids

    def encode(self, text):
        return self._Enc([ord(c) for c in text if 32 <= ord(c) < 127])

    def decode(self, ids):
        return "".join(chr(t) for t in ids if 32 <= t < 127)


@pytest.fixture()
def tool_port():
    cfg = EngineConfig(
        model=ModelConfig(hf_config=TINY, dtype="float32",
                          max_model_len=1024),
        cache=CacheConfig(block_size=16, num_device_blocks=128),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=1024))

    async def boot():
        engine = AsyncLLMEngine(cfg)
        engine.engine.set_guided_vocab(VOCAB)
        engine.engine.tokenizer = CharTokenizer()
        srv_obj = OpenAIServer(engine, "tiny")
        srv = await asyncio.start_server(srv_obj.handle_conn,
                                         "127.0.0.1", 0)
        return srv, srv.sockets[0].getsockname()[1]

    loop = asyncio.new_event_loop()
    srv, port = loop.run_until_complete(boot())
    import threading
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    yield port
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=5)


WEATHER_TOOL = {
    "type": "function",
    "function": {"name": "gw",
                 "parameters": {"type": "object",
                                "properties": {"c": {"enum": ["NY", "SF"]}
                                               }}}}


def test_tool_choice_forced_function(tool_port):
    status, raw = http_request(
        tool_port, "POST", "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "weather?"}],
         "tools": [WEATHER_TOOL],
         "tool_choice": {"type": "function", "function": {"name": "gw"}},
         "max_tokens": 64, "temperature": 1.0, "seed": 6})
    assert status == 200
    data = json.loads(raw)
    choice = data["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    call = choice["message"]["tool_calls"][0]
    assert call["function"]["name"] == "gw"
    args = json.loads(call["function"]["arguments"])
    assert args.get("c") in ("NY", "SF")


def test_tool_choice_required(tool_port):
    status, raw = http_request(
        tool_port, "POST", "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "weather?"}],
         "tools": [WEATHER_TOOL], "tool_choice": "required",
         "max_tokens": 64, "temperature": 1.0, "seed": 8})
    assert status == 200
    data = json.loads(raw)
    assert data["choices"][0]["finish_reason"] == "tool_calls"


def test_tool_choice_unknown_function_rejected(tool_port):
    status, _ = http_request(
        tool_port, "POST", "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "x"}],
         "tools": [WEATHER_TOOL],
         "tool_choice": {"type": "function", "function": {"name": "zz"}},
         "max_tokens": 8})
    assert status == 400
