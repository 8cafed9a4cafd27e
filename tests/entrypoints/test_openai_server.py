"""OpenAI-compatible server tests over a real socket (reference analog:
tests/entrypoints/ with RemoteOpenAIServer; here in-process asyncio)."""

import asyncio
import json

import pytest

from vllm_paged_compression_tpu.config import (CacheConfig, EngineConfig,
                                               ModelConfig, SchedulerConfig)
from vllm_paged_compression_tpu.engine.async_engine import AsyncLLMEngine
from vllm_paged_compression_tpu.entrypoints.openai.api_server import (
    OpenAIServer)

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "max_position_embeddings": 256,
    "tie_word_embeddings": True,
}


@pytest.fixture()
def server_port():
    cfg = EngineConfig(
        model=ModelConfig(hf_config=TINY, dtype="float32", max_model_len=128),
        cache=CacheConfig(block_size=4, num_device_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128))

    result = {}

    async def boot():
        engine = AsyncLLMEngine(cfg)
        srv_obj = OpenAIServer(engine, "tiny")
        srv = await asyncio.start_server(srv_obj.handle_conn, "127.0.0.1", 0)
        return srv, srv.sockets[0].getsockname()[1]

    loop = asyncio.new_event_loop()
    srv, port = loop.run_until_complete(boot())
    result["loop"] = loop
    import threading
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    yield port
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=5)


def http_request(port, method, path, body=None):
    import socket
    s = socket.create_connection(("127.0.0.1", port), timeout=120)
    data = json.dumps(body).encode() if body is not None else b""
    req = (f"{method} {path} HTTP/1.1\r\nhost: x\r\n"
           f"content-length: {len(data)}\r\n\r\n").encode() + data
    s.sendall(req)
    s.settimeout(120)
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += s.recv(65536)
    head, _, rest = buf.partition(b"\r\n\r\n")
    status = int(head.split()[1])
    headers = dict(
        line.decode().partition(":")[::2]
        for line in head.split(b"\r\n")[1:])
    headers = {k.strip().lower(): v.strip() for k, v in
               {k: v for k, v in headers.items()}.items()}
    if "content-length" in headers:
        n = int(headers["content-length"])
        while len(rest) < n:
            rest += s.recv(65536)
        s.close()
        return status, rest[:n]
    # chunked (SSE): read until connection closes
    while True:
        try:
            chunk = s.recv(65536)
        except TimeoutError:
            break
        if not chunk:
            break
        rest += chunk
    s.close()
    return status, rest


class TestOpenAIServer:
    def test_health_and_models(self, server_port):
        status, body = http_request(server_port, "GET", "/health")
        assert status == 200
        status, body = http_request(server_port, "GET", "/v1/models")
        assert status == 200
        assert json.loads(body)["data"][0]["id"] == "tiny"

    def test_completion_token_ids(self, server_port):
        status, body = http_request(
            server_port, "POST", "/v1/completions",
            {"prompt": [1, 5, 9, 2], "max_tokens": 6, "temperature": 0})
        assert status == 200
        resp = json.loads(body)
        assert resp["object"] == "text_completion"
        assert resp["usage"]["completion_tokens"] == 6
        assert resp["choices"][0]["finish_reason"] == "length"

    def test_streaming_completion(self, server_port):
        status, raw = http_request(
            server_port, "POST", "/v1/completions",
            {"prompt": [3, 7, 11], "max_tokens": 5, "temperature": 0,
             "stream": True})
        assert status == 200
        text = raw.decode(errors="replace")
        assert "data: [DONE]" in text
        events = [line for line in text.splitlines()
                  if line.startswith("data: {")]
        assert len(events) >= 1
        first = json.loads(events[0][6:])
        assert first["object"] == "text_completion"

    def test_bad_request(self, server_port):
        status, body = http_request(
            server_port, "POST", "/v1/completions",
            {"prompt": 42, "max_tokens": 3})
        assert status == 400
        status, body = http_request(
            server_port, "POST", "/v1/chat/completions",
            {"messages": []})
        assert status == 400

    def test_string_prompt_without_tokenizer_rejected(self, server_port):
        status, body = http_request(
            server_port, "POST", "/v1/completions",
            {"prompt": "hello", "max_tokens": 3})
        assert status == 400
        assert "tokenizer" in json.loads(body)["error"]["message"]

    def test_metrics_endpoint(self, server_port):
        status, body = http_request(server_port, "GET", "/metrics")
        assert status == 200
        assert b"vpc:num_finished" in body


def test_run_batch_offline(tmp_path):
    """Offline batch runner: OpenAI batch JSONL in -> responses out."""
    import json
    from vllm_paged_compression_tpu.config import (CacheConfig, EngineConfig,
                                                   ModelConfig,
                                                   SchedulerConfig)
    from vllm_paged_compression_tpu.engine.llm_engine import LLMEngine
    from vllm_paged_compression_tpu.entrypoints.run_batch import run_batch
    cfg = EngineConfig(
        model=ModelConfig(hf_config=TINY, dtype="float32",
                          max_model_len=256),
        cache=CacheConfig(block_size=16, num_device_blocks=32),
        scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=256))
    engine = LLMEngine(cfg)
    lines = [json.dumps({
        "custom_id": f"req-{i}", "method": "POST",
        "url": "/v1/completions",
        "body": {"prompt": list(range(1, 20 + i)), "max_tokens": 6,
                 "temperature": 0.0}}) for i in range(3)]
    results = run_batch(engine, lines, "tiny")
    assert len(results) == 3
    ids = {r["custom_id"] for r in results}
    assert ids == {"req-0", "req-1", "req-2"}
    for r in results:
        usage = r["response"]["body"]["usage"]
        assert usage["completion_tokens"] == 6


class TestEmbeddingsRoute:
    def test_embeddings_token_ids(self, server_port):
        status, body = http_request(
            server_port, "POST", "/v1/embeddings",
            {"input": [[1, 2, 3, 4], [5, 6]]})
        assert status == 200
        data = json.loads(body)
        assert data["object"] == "list" and len(data["data"]) == 2
        v = data["data"][0]["embedding"]
        assert len(v) > 0
        n = sum(x * x for x in v) ** 0.5
        assert abs(n - 1.0) < 1e-3          # normalized by default
        assert data["usage"]["prompt_tokens"] == 6

    def test_completion_logprobs(self, server_port):
        status, body = http_request(
            server_port, "POST", "/v1/completions",
            {"prompt": [1, 2, 3, 4], "max_tokens": 3,
             "temperature": 0.0, "logprobs": 3})
        assert status == 200
